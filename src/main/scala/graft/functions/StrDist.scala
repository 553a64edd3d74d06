package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * String-distance kernels behind Solr's `strdist()` function query
 * (reference solr/core/src/java/org/apache/solr/search/ValueSourceParser.java
 * strdist parser → lucene/suggest/src/java/org/apache/lucene/search/spell/
 * {JaroWinklerDistance,NGramDistance,LevenshteinDistance}.java).
 *
 * `edit` needs no kernel here — it compiles to Spark's codegen'd
 * `levenshtein` built-in normalized by max length (LevenshteinDistance
 * .java:106 `1 - dist/max(len)`), see [[graft.query.FuncParser]]. The two
 * metrics Spark lacks are native Catalyst expressions in the
 * [[DamerauLevenshtein]] shape: codegen emits a static call, no boxing,
 * stays inside whole-stage codegen.
 */
abstract class StrDistExpr extends BinaryExpression with Serializable {
  override def dataType: DataType = FloatType
  override def nullable: Boolean = left.nullable || right.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got (${left.dataType.sql}, ${right.dataType.sql})")
}

/** Jaro-Winkler similarity with the reference's 0.7 boost threshold:
  * the Winkler common-prefix bonus applies only when the Jaro score
  * clears the threshold (JaroWinklerDistance.java:87-95). */
case class JaroWinkler(left: Expression, right: Expression) extends StrDistExpr {
  override def prettyName: String = "graft_jaro_winkler"
  override def nullSafeEval(l: Any, r: Any): Any =
    StrDist.jaroWinkler(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StrDist.jaroWinkler($a.toString(), $b.toString())")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** N-gram similarity (NGramDistance.java:54-152): an edit distance over
  * n-gram windows with positional half-credit, normalized by the longer
  * length; strings shorter than n fall back to positional char overlap. */
case class NGramSim(left: Expression, right: Expression, n: Int) extends StrDistExpr {
  override def prettyName: String = "graft_ngram_sim"
  override def nullSafeEval(l: Any, r: Any): Any =
    StrDist.ngram(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StrDist.ngram($a.toString(), $b.toString(), $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object StrDist {

  /** Jaro-Winkler similarity, reference arithmetic (JaroWinklerDistance
    * .java matches()/getDistance()): match window = max(len)/2 - 1,
    * transpositions counted over the matched sequences, prefix bonus
    * min(0.1, 1/maxLen) * prefixLen * (1 - j) gated on j >= 0.7. */
  def jaroWinkler(s1: String, s2: String): Float = {
    // matches(): [matches, transpositions, prefixLen, maxLen]
    val (max, min) = if (s1.length > s2.length) (s1, s2) else (s2, s1)
    val range = math.max(max.length / 2 - 1, 0)
    val matchIndexes = Array.fill(min.length)(-1)
    val matchFlags = new Array[Boolean](max.length)
    var matches = 0
    var mi = 0
    while (mi < min.length) {
      val c1 = min.charAt(mi)
      var xi = math.max(mi - range, 0)
      val xn = math.min(mi + range + 1, max.length)
      var found = false
      while (!found && xi < xn) {
        if (!matchFlags(xi) && c1 == max.charAt(xi)) {
          matchIndexes(mi) = xi
          matchFlags(xi) = true
          matches += 1
          found = true
        }
        xi += 1
      }
      mi += 1
    }
    if (matches == 0) return 0f
    val ms1 = new Array[Char](matches)
    val ms2 = new Array[Char](matches)
    var i = 0; var si = 0
    while (i < min.length) {
      if (matchIndexes(i) != -1) { ms1(si) = min.charAt(i); si += 1 }
      i += 1
    }
    i = 0; si = 0
    while (i < max.length) {
      if (matchFlags(i)) { ms2(si) = max.charAt(i); si += 1 }
      i += 1
    }
    var transpositions = 0
    i = 0
    while (i < ms1.length) {
      if (ms1(i) != ms2(i)) transpositions += 1
      i += 1
    }
    var prefix = 0
    var stop = false
    i = 0
    while (!stop && i < min.length) {
      if (s1.charAt(i) == s2.charAt(i)) prefix += 1 else stop = true
      i += 1
    }
    val m = matches.toFloat
    val t = transpositions / 2
    val j = (m / s1.length + m / s2.length + (m - t) / m) / 3
    if (j < 0.7f) j
    else j + math.min(0.1f, 1f / max.length) * prefix * (1 - j)
  }

  /** N-gram similarity, reference arithmetic (NGramDistance.getDistance):
    * the DP runs over `source` padded with n-1 NUL-prefix chars, each cell
    * comparing the jth n-gram of target against the sliding source window
    * with cost = mismatch-count/n; short strings use positional overlap. */
  def ngram(source: String, target: String, n: Int): Float = {
    val sl = source.length
    val tl = target.length
    if (sl == 0 || tl == 0) return if (sl == tl) 1f else 0f
    if (sl < n || tl < n) {
      var cost = 0
      var i = 0
      val ni = math.min(sl, tl)
      while (i < ni) {
        if (source.charAt(i) == target.charAt(i)) cost += 1
        i += 1
      }
      return cost.toFloat / math.max(sl, tl)
    }
    val sa = new Array[Char](sl + n - 1)
    var i = 0
    while (i < sa.length) {
      sa(i) = if (i < n - 1) '\u0000' else source.charAt(i - n + 1)
      i += 1
    }
    var p = new Array[Float](sl + 1)
    var d = new Array[Float](sl + 1)
    val tj = new Array[Char](n)
    i = 0
    while (i <= sl) { p(i) = i.toFloat; i += 1 }
    var j = 1
    while (j <= tl) {
      if (j < n) {
        var ti = 0
        while (ti < n - j) { tj(ti) = '\u0000'; ti += 1 }
        while (ti < n) { tj(ti) = target.charAt(ti - (n - j)); ti += 1 }
      } else {
        var ti = 0
        while (ti < n) { tj(ti) = target.charAt(j - n + ti); ti += 1 }
      }
      d(0) = j.toFloat
      i = 1
      while (i <= sl) {
        var cost = 0
        var tn = n
        var ni2 = 0
        while (ni2 < n) {
          if (sa(i - 1 + ni2) != tj(ni2)) cost += 1
          else if (sa(i - 1 + ni2) == '\u0000') tn -= 1 // discount matches on the NUL prefix
          ni2 += 1
        }
        val ec = cost.toFloat / tn
        d(i) = math.min(math.min(d(i - 1) + 1, p(i) + 1), p(i - 1) + ec)
        i += 1
      }
      val t = p; p = d; d = t
      j += 1
    }
    1.0f - p(sl) / math.max(tl, sl)
  }

  def jw(l: Column, r: Column): Column = {
    import org.apache.spark.sql.graftbridge.{columnOf, exprOf}
    columnOf(JaroWinkler(exprOf(l), exprOf(r)))
  }

  def ngramSim(l: Column, r: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.{columnOf, exprOf}
    columnOf(NGramSim(exprOf(l), exprOf(r), n))
  }
}
