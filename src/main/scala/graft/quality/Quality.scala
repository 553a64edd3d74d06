package graft.quality

import graft.index.IndexStore
import org.apache.spark.sql.DataFrame

/**
 * IR-quality harness — the reference's quality benchmark shape
 * (lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
 * QualityBenchmark.java + trec/ judge: run topics against the engine,
 * judge each ranked list with qrels, report precision@k / average
 * precision / MAP). Nothing else in the repo measures ranking QUALITY —
 * rank-identity tests only prove the engine equals BM25 arithmetic.
 *
 * A topic = (id, query terms, relevant docIds). Metrics use binary
 * relevance, the TREC conventions:
 *  - P@k  = |relevant in top k| / k
 *  - AP   = mean over relevant ranks i of precision@i, divided by
 *           |relevant| (unretrieved relevant docs count as 0)
 *  - MAP  = mean AP over topics
 *  - NDCG@k = DCG@k / ideal DCG@k with binary gains and the standard
 *           1/log2(rank+1) discount.
 */
object Quality {

  final case class Topic(id: String, terms: Seq[String], relevant: Set[Long])

  final case class TopicResult(id: String, p10: Double, ap: Double,
                               ndcg10: Double, retrieved: Int)

  final case class Report(topics: Seq[TopicResult]) {
    def map: Double = if (topics.isEmpty) 0.0 else topics.map(_.ap).sum / topics.size
    def meanP10: Double = if (topics.isEmpty) 0.0 else topics.map(_.p10).sum / topics.size
    def meanNdcg10: Double = if (topics.isEmpty) 0.0 else topics.map(_.ndcg10).sum / topics.size
  }

  def precisionAt(ranked: Seq[Long], relevant: Set[Long], k: Int): Double =
    if (k <= 0) 0.0 else ranked.take(k).count(relevant) / k.toDouble

  /** NDCG@k, binary relevance: DCG = Σ over relevant hits at rank i
    * (1-based) of 1/log2(i+1); ideal = the first min(|relevant|, k)
    * ranks all relevant. */
  def ndcgAt(ranked: Seq[Long], relevant: Set[Long], k: Int): Double = {
    if (relevant.isEmpty || k <= 0) return 0.0
    val log2 = math.log(2)
    val dcg = ranked.take(k).zipWithIndex.collect {
      case (d, i) if relevant(d) => log2 / math.log(i + 2)
    }.sum
    val idcg = (0 until math.min(relevant.size, k))
      .map(i => log2 / math.log(i + 2)).sum
    dcg / idcg
  }

  def averagePrecision(ranked: Seq[Long], relevant: Set[Long]): Double = {
    if (relevant.isEmpty) return 0.0
    var hits = 0
    var sum = 0.0
    ranked.zipWithIndex.foreach { case (d, i) =>
      if (relevant(d)) { hits += 1; sum += hits.toDouble / (i + 1) }
    }
    sum / relevant.size
  }

  /** Judge one ranked list against a topic's qrels. */
  def judge(topic: Topic, ranked: Seq[Long]): TopicResult =
    TopicResult(topic.id, precisionAt(ranked, topic.relevant, 10),
      averagePrecision(ranked, topic.relevant),
      ndcgAt(ranked, topic.relevant, 10), ranked.size)

  /** Run every topic through the engine's top-k and judge it. `sim` picks
    * the ranking model (default BM25) — the harness then compares ranking
    * QUALITY across similarities on identical topics/qrels, the
    * QualityBenchmark use-case the similarity zoo exists for. */
  def run(idx: IndexStore.OpenIndex, topics: Seq[Topic], k: Int = 100,
          sim: graft.query.Similarity = null): Report =
    Report(topics.map { t =>
      judge(t, rankedDocs(idx.topK(t.terms, k, sim = sim)))
    })

  def rankedDocs(hits: DataFrame): Seq[Long] =
    hits.select("docId").collect().map(_.getLong(0)).toSeq
}
