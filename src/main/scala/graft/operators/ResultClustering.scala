package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Search-result clustering (reference solr/contrib/clustering —
  * CarrotClusteringEngine.java: the clustering component runs a Carrot2
  * algorithm over the TOP-N SEARCH RESULTS and returns labeled groups).
  * This is the classic STC shape (suffix-tree clustering: Zamir & Etzioni
  * '98, Carrot2's STCClusteringAlgorithm): frequent phrases over the result
  * window become BASE CLUSTERS, base clusters sharing most of their
  * documents MERGE, and the best phrase labels each merged cluster.
  *
  * Scale shape: the window is k rows (a search result page), so it
  * broadcasts into the doc store — the corpus is never shuffled. Phrase
  * extraction is one narrow pass over k docs; base-cluster stats are one
  * aggregation over the window's phrases; the merge graph has at most
  * `maxBaseClusters` nodes and reuses [[Dedup.connectedComponents]].
  */
object ResultClustering {

  /** Base clusters: frequent phrases (1..maxPhraseLen word n-grams) over
    * the result window with their coverage and STC score
    * (score = df · weight(len), single words half-weighted; phrases
    * covering ≥ stopRatio of the window are boilerplate and dropped).
    * Deterministic top `maxBaseClusters` by (score DESC, phrase ASC).
    * Returns (phrase, df, score, doc_id) — one row per covered doc.
    */
  def baseClusters(window: DataFrame, idCol: String, textCol: String,
                   maxPhraseLen: Int = 2, minDf: Int = 3,
                   stopRatio: Double = 0.8,
                   maxBaseClusters: Int = 20): DataFrame = {
    val toks = TextOps.tokensOf(textCol)
    // n-grams n=1..maxPhraseLen, distinct per doc (coverage, not tf)
    val gramCols: Seq[Column] = (1 to maxPhraseLen).map { n =>
      if (n == 1) toks
      else when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array())
    }
    val grams = window
      .select(col(idCol), explode(flatten(array(gramCols: _*))).as("phrase"))
      .filter(length(col("phrase")) > 0)
      .distinct()
    val winSize = window.select(countDistinct(col(idCol)).as("__n"))
    // window-derived stop words (Carrot2 strips stop words from cluster
    // phrases; here a token covering >= stopRatio of the window is
    // boilerplate and disqualifies every phrase containing it)
    val stopArr = grams.filter(!col("phrase").contains(" "))
      .groupBy("phrase").agg(count("*").as("__cov"))
      .crossJoin(broadcast(winSize))
      .filter(col("__cov") >= col("__n") * stopRatio)
      .agg(collect_set(col("phrase")).as("__stop"))
    val scored = grams
      .crossJoin(broadcast(stopArr))
      .filter(!arrays_overlap(split(col("phrase"), " "), col("__stop")))
      .groupBy("phrase")
      .agg(count("*").as("df"), collect_set(col(idCol)).as("__docs"))
      .crossJoin(broadcast(winSize))
      .filter(col("df") >= minDf && col("df") < col("__n") * stopRatio)
      .withColumn("score",
        col("df").cast("double") *
          when(size(split(col("phrase"), " ")) === 1, 0.5d).otherwise(1.0d))
      .orderBy(col("score").desc, col("phrase").asc)
      .limit(maxBaseClusters)
    scored.select(col("phrase"), col("df"), col("score"),
      explode(col("__docs")).as(idCol))
  }

  /** Full STC: base clusters whose doc sets overlap by more than
    * `mergeOverlap` IN BOTH DIRECTIONS (the STC binary similarity) merge
    * via connected components; each merged cluster is labeled by its
    * highest-scoring phrase. Returns (cluster, label, phrase, doc_id).
    */
  def clusterResults(window: DataFrame, idCol: String, textCol: String,
                     maxPhraseLen: Int = 2, minDf: Int = 3,
                     stopRatio: Double = 0.8, maxBaseClusters: Int = 20,
                     mergeOverlap: Double = 0.5): DataFrame = {
    val base = baseClusters(window, idCol, textCol, maxPhraseLen, minDf,
      stopRatio, maxBaseClusters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // stable numeric node ids for the CC kernel: rank by (score, phrase)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score").desc, col("phrase").asc)
      // single-partition window is fine: <= maxBaseClusters rows
      val nodes = base.select("phrase", "df", "score").distinct()
        .withColumn("__node", row_number().over(w).cast("long"))
      val nodeIds = broadcast(nodes.select("phrase", "__node"))
      val member = base.join(nodeIds, "phrase")
        .select(col("__node"), col(idCol), col("df"), col("score"), col("phrase"))

      // overlap edges: |A∩B| > overlap·|A| AND > overlap·|B|
      val a = member.select(col("__node").as("na"), col(idCol), col("df").as("dfa"))
      val b = member.select(col("__node").as("nb"), col(idCol), col("df").as("dfb"))
      val edges = a.join(b, idCol).filter(col("na") < col("nb"))
        .groupBy("na", "nb").agg(count("*").as("__both"),
          first("dfa").as("dfa"), first("dfb").as("dfb"))
        .filter(col("__both") > col("dfa") * mergeOverlap &&
          col("__both") > col("dfb") * mergeOverlap)
        .select("na", "nb")

      val selfEdges = nodeIds.select(col("__node").as("na"), col("__node").as("nb"))
      val cc = Dedup.connectedComponents(edges.union(selfEdges), "na", "nb")
        .withColumnRenamed("id", "__node").withColumnRenamed("component", "cluster")

      // label = the component's best phrase (score DESC, phrase ASC)
      val labeled = member.join(broadcast(cc), "__node")
      val labels = labeled.select("cluster", "phrase", "score").distinct()
        .groupBy("cluster")
        .agg(min_by(col("phrase"), struct(-col("score"), col("phrase"))).as("label"))
      labeled.join(broadcast(labels), "cluster")
        .select(col("cluster"), col("label"), col("phrase"), col(idCol))
        .distinct()
    } finally base.unpersist()
  }
}
