package graft.operators

import graft.SparkSpec

/** STC search-result clustering: base clusters from frequent phrases,
  * bidirectional-overlap merge, best-phrase labels — on a hand-computable
  * window. */
class ResultClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two topical groups + a bridge doc + noise; "common" is in every doc
  // (stop-phrase), noise words are unique (below minDf)
  private lazy val window = Seq(
    (1L, "common apache spark engine alpha"),
    (2L, "common apache spark engine beta"),
    (3L, "common apache spark engine gamma"),
    (4L, "common apache spark engine delta"),
    (5L, "common query parser rules epsilon"),
    (6L, "common query parser rules zeta"),
    (7L, "common query parser rules eta"),
    (8L, "common query parser rules theta"),
    (9L, "common iota kappa lambda"),
    (10L, "common mu nu xi"),
    (11L, "common apache spark engine query parser rules")
  ).toDF("doc_id", "text")

  test("base clusters: frequent phrases, stop-ratio filter, STC scores") {
    val base = ResultClustering.baseClusters(window, "doc_id", "text",
      maxPhraseLen = 2, minDf = 3, stopRatio = 0.8, maxBaseClusters = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byPhrase = base.groupBy(_._1)
    // "common" covers 11/11 docs => stop-filtered
    assert(!byPhrase.contains("common"))
    assert(!byPhrase.keys.exists(_.contains("common")))
    // noise words below minDf are gone
    assert(!byPhrase.contains("alpha") && !byPhrase.contains("mu"))
    // bigram coverage: both topical bigrams cover their 4 docs + the bridge
    assert(byPhrase("apache spark").map(_._4).toSet == Set(1L, 2L, 3L, 4L, 11L))
    assert(byPhrase("parser rules").map(_._4).toSet == Set(5L, 6L, 7L, 8L, 11L))
    // scores: bigram df * 1.0, unigram df * 0.5
    assert(byPhrase("apache spark").head._3 == 5.0)
    assert(byPhrase("spark").head._3 == 2.5)
  }

  test("STC merge: full-overlap phrases coalesce, bridge doc does not merge topics") {
    val got = ResultClustering.clusterResults(window, "doc_id", "text",
      maxPhraseLen = 2, minDf = 3, stopRatio = 0.8, maxBaseClusters = 20,
      mergeOverlap = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val clusters = got.groupBy(_._1)
    assert(clusters.size == 2, s"want 2 clusters, got ${clusters.size}: " +
      clusters.map { case (c, rs) => c -> rs.map(_._3).distinct.toList }.toString)
    val byLabel = got.groupBy(_._2)
    // labels: best phrase per component (score DESC, phrase ASC tie)
    assert(byLabel.keySet == Set("apache spark", "parser rules"), byLabel.keySet)
    // every phrase of a topic landed in its component; the bridge doc is in both
    assert(byLabel("apache spark").map(_._3).toSet ==
      Set("apache spark", "spark engine", "apache", "spark", "engine"))
    assert(byLabel("parser rules").map(_._3).toSet ==
      Set("query parser", "parser rules", "query", "parser", "rules"))
    assert(byLabel("apache spark").map(_._4).toSet == Set(1L, 2L, 3L, 4L, 11L))
    assert(byLabel("parser rules").map(_._4).toSet == Set(5L, 6L, 7L, 8L, 11L))
  }
}
