package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, FloatType, IntegerType}

/**
 * Codegen-friendly Catalyst expression for the BM25 per-posting score with
 * Lucene's exact float/double arithmetic (BM25Similarity.java:223-227):
 *
 *   score = weight * (float)(freq / (freq + (double) cache[normByte & 0xFF]))
 *
 * `weight` (boost × idf, float) and the 256-entry norm cache are bound at
 * plan time (driver-side, from broadcast collection stats) — the expression
 * is the Weight of the reference, compiled into whole-stage codegen instead
 * of a closure. Used for scoring un-packed posting rows (HOT tier) where
 * the data is already columnar; the packed-block path scores inside its
 * mapPartitions kernel.
 *
 * SURVEY.md §4.3 called this the optional native-Expression upgrade over a
 * Scala UDF; interpretation and codegen paths are both float-exact and
 * tested equal to BM25.TermScorer.score.
 */
case class Bm25Score(left: Expression, right: Expression,
                     weight: Float, cache: Array[Float])
    extends BinaryExpression with Serializable {

  override def dataType: DataType = FloatType
  override def nullable: Boolean = left.nullable || right.nullable

  // analysis-time typing: wrong-typed args fail cleanly at analysis instead
  // of diverging between interpreted (ClassCastException) and codegen paths
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == ByteType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bm25_score expects (INT tf, TINYINT normByte), got (${left.dataType.sql}, ${right.dataType.sql})")

  // left = tf (int), right = normByte (byte/tinyint)
  override def nullSafeEval(tf: Any, norm: Any): Any = {
    val freq = tf.asInstanceOf[Int].toFloat
    val n: Double = cache(norm.asInstanceOf[Byte] & 0xFF).toDouble
    weight * (freq / (freq + n)).toFloat
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheRef = ctx.addReferenceObj("bm25cache", cache, "float[]")
    val w = s"${weight}f"
    // freshName: two Bm25Score instances can codegen into ONE generated
    // method (non-nullable children inline unbraced) — fixed local names
    // would collide and kill whole-stage codegen
    val freq = ctx.freshName("bm25freq")
    val nrm = ctx.freshName("bm25norm")
    nullSafeCodeGen(ctx, ev, (tf, norm) => {
      s"""
         |float $freq = (float) $tf;
         |double $nrm = (double) $cacheRef[$norm & 0xFF];
         |${ev.value} = $w * (float) ($freq / ($freq + $nrm));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Bm25Score {
  /** Column API: bm25Score(tf, normByte) bound to a term's weight + cache. */
  def apply(tf: Column, normByte: Column, weight: Float, cache: Array[Float]): Column = {
    import org.apache.spark.sql.graftbridge.{columnOf, exprOf}
    columnOf(Bm25Score(exprOf(tf), exprOf(normByte), weight, cache))
  }
}
