package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Optimal-string-alignment (restricted Damerau-Levenshtein) distance as a
 * native Catalyst expression — the metric behind the reference's DEFAULT
 * fuzzy matching (FuzzyQuery transpositions=true, reference
 * lucene/core/src/java/org/apache/lucene/search/FuzzyQuery.java:69
 * defaultTranspositions; LevenshteinAutomata with transposition=true):
 * adjacent-character swaps count as ONE edit, so "sprak"~1 matches
 * "spark" where plain levenshtein needs 2.
 *
 * Codegen emits a static call into [[DamerauLevenshtein.osa]] (the same
 * shape as Spark's own levenshtein, which calls
 * UTF8String.levenshteinDistance) — no boxing, stays inside whole-stage
 * codegen. Used only on gram-pruned candidate sets, never on a full
 * vocabulary scan.
 */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_damerau"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_damerau expects (STRING, STRING), got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.osa(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DamerauLevenshtein.osa($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {

  /** OSA distance: levenshtein + adjacent transposition as one edit (each
    * substring may be transposed at most once — the automaton the
    * reference builds). Two-row DP plus one lookback row. */
  def osa(a: String, b: String): Int = {
    val (la, lb) = (a.length, b.length)
    if (la == 0) return lb
    if (lb == 0) return la
    var prev2 = new Array[Int](lb + 1) // row i-2
    var prev = new Array[Int](lb + 1)  // row i-1
    var cur = new Array[Int](lb + 1)   // row i
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      cur(0) = i
      j = 1
      while (j <= lb) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && a.charAt(i - 1) == b.charAt(j - 2) &&
            a.charAt(i - 2) == b.charAt(j - 1))
          d = math.min(d, prev2(j - 2) + 1)
        cur(j) = d
        j += 1
      }
      val t = prev2; prev2 = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb)
  }

  /** Column API. */
  def apply(l: Column, r: Column): Column = {
    import org.apache.spark.sql.graftbridge.{columnOf, exprOf}
    columnOf(DamerauLevenshtein(exprOf(l), exprOf(r)))
  }
}
