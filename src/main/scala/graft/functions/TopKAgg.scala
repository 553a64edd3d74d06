package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k-by-score typed Aggregator — the custom-UDAF extension point
 * of the reference (Solr AggValueSource, SURVEY §2.8) and the per-executor
 * bounded-heap alternative to orderBy().limit(k) named in SURVEY §4.3.
 * Eviction order matches HitQueue (score ASC, docId DESC), so survivors are
 * the top k by (score DESC, docId ASC); merge is heap-union-rebound, so the
 * aggregation is associative and works as partial+final over any grouping.
 *
 * Usage: `df.groupBy(g).agg(TopKAgg.topHits(k)(col("docId"), col("score")))`
 * yields ARRAY<STRUCT<docId,score>> sorted best-first per group.
 */
object TopKAgg {

  final case class Hit(docId: Long, score: Float)

  private val ord: Ordering[Hit] = (a: Hit, b: Hit) => {
    val c = java.lang.Float.compare(a.score, b.score)
    if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
  }

  final case class TopK(k: Int) extends Aggregator[Hit, Seq[Hit], Seq[Hit]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: Seq[Hit] = Nil

    private def bound(hits: Seq[Hit]): Seq[Hit] =
      hits.sorted(ord.reverse).take(k) // best-first, bounded

    // amortized heap discipline: append unsorted, prune to k only when the
    // buffer hits 2k — O(log k) per element instead of a full O(k log k)
    // re-sort per row; the buffer is bounded at 2k either way
    override def reduce(buf: Seq[Hit], h: Hit): Seq[Hit] = {
      val appended = buf :+ h
      if (appended.size >= 2 * k) bound(appended) else appended
    }

    override def merge(a: Seq[Hit], b: Seq[Hit]): Seq[Hit] = bound(a ++ b)
    override def finish(r: Seq[Hit]): Seq[Hit] = bound(r)
    override def bufferEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
    override def outputEncoder: Encoder[Seq[Hit]] = bufferEncoder
  }

  /** Column form for DataFrame groupBy.agg (case-class input binds to the
    * flattened (docId, score) argument list). */
  def topHits(k: Int)(docId: org.apache.spark.sql.Column, score: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.udaf
    val f = udaf(TopK(k))
    f(docId, score).as("top_hits")
  }
}
