package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.query.BM25

/**
 * SparkSessionExtensions entry point: registers the engine's scoring
 * function into the SQL function registry so plain `spark.sql` can score
 * postings:
 *
 *   SELECT graft_bm25_score(tf, normByte, df, docCount, sumTotalTermFreq)
 *
 * The last three arguments must be literals (collection stats are plan-time
 * constants — the reference computes the Weight once up front,
 * BM25Similarity.java:184-193); weight and the 256-entry norm cache are
 * precomputed at resolution time, so the planned expression is the same
 * codegen [[Bm25Score]] the Column API uses.
 *
 * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
 * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.bm25ScoreFunction)
    ext.injectFunction(GraftExtensions.damerauFunction)
  }
}

object GraftExtensions {

  private def longLit(e: Expression, name: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"graft_bm25_score: $name must be a literal (collection stats are plan-time constants), got $other")
  }

  val bm25ScoreFunction: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("graft_bm25_score"),
    new ExpressionInfo(classOf[Bm25Score].getName, "graft_bm25_score"),
    (args: Seq[Expression]) => {
      require(args.length == 5,
        "graft_bm25_score(tf INT, normByte TINYINT, df BIGINT, docCount BIGINT, sumTotalTermFreq BIGINT)")
      val df = longLit(args(2), "df")
      val docCount = longLit(args(3), "docCount")
      val sumTtf = longLit(args(4), "sumTotalTermFreq")
      val scorer = BM25.termScorer(1f, BM25.DefaultK1, BM25.DefaultB, df, docCount, sumTtf)
      Bm25Score(args(0), args(1), scorer.weight, scorer.cache)
    })

  /** SQL surface for the OSA distance: graft_damerau(a, b). */
  val damerauFunction: (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) = (
    FunctionIdentifier("graft_damerau"),
    new ExpressionInfo(classOf[DamerauLevenshtein].getName, "graft_damerau"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_damerau(a STRING, b STRING)")
      DamerauLevenshtein(args(0), args(1))
    })
}
