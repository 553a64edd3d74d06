package graft.index

import java.nio.file.Files

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.query.QueryEngine
import org.apache.spark.sql.functions._

/** Federated search = one logical index: scores over N sub-indexes with
  * merged exact stats are BIT-IDENTICAL to a single index built over the
  * union corpus (MultiReader docBase + ExactStatsCache semantics). */
class MultiIndexSpec extends SparkSpec {
  import spark.implicits._

  val N = 400
  lazy val (idxAll, idxA, idxB) = {
    val withIds = DocIds.assign(CorpusGen.corpus(spark, N, 4).toDF(),
      Seq("repo", "path", "commit"), 4).cache()
    val dAll = Files.createTempDirectory("graft-multi-all").toString
    IndexStore.build(spark, withIds, dAll, numSegments = 2, shufflePartitions = 4)
    // shard split in GLOBAL docId order: shard A = ids [0, 200) keeps its
    // ids; shard B = ids [200, 400) renumbered locally to [0, 200) — the
    // same documents, so federation must reproduce the single index exactly
    val a = withIds.filter(col("docId") < N / 2)
    val b = withIds.filter(col("docId") >= N / 2)
      .withColumn("docId", col("docId") - (N / 2).toLong)
    val dA = Files.createTempDirectory("graft-multi-a").toString
    val dB = Files.createTempDirectory("graft-multi-b").toString
    IndexStore.build(spark, a, dA, numSegments = 1, shufflePartitions = 4)
    IndexStore.build(spark, b, dB, numSegments = 1, shufflePartitions = 4)
    (IndexStore.OpenIndex(spark, dAll),
      IndexStore.OpenIndex(spark, dA), IndexStore.OpenIndex(spark, dB))
  }
  lazy val fed = Seq(idxA, idxB)

  test("merged stats equal the union index's stats exactly") {
    assert(MultiIndex.mergedStats(fed) === idxAll.stats)
    val m = MultiIndex.mergedTermstats(fed)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val all = idxAll.termstats
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m === all)
  }

  test("federated top-k is bit-identical to the single union index, all query classes") {
    val queries = Seq(
      (Seq("public"), QueryEngine.Or, Nil),
      (Seq("import", "handler3"), QueryEngine.And, Nil),
      (Seq("class"), QueryEngine.Or, Seq("uniq_1_0")),
      (Seq("parseconfig", "handler7", "uniq_10_1"), QueryEngine.Or, Nil))
    for ((terms, mode, neg) <- queries; k <- Seq(5, 50)) {
      val want = idxAll.topK(terms, k, mode, mustNot = neg)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      val got = MultiIndex.topK(fed, terms, k, mode, mustNot = neg)
        .select("docId", "score")
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      assert(got === want, s"terms=$terms mode=$mode k=$k")
    }
  }

  test("shard and localDocId round-trip the docBase mapping") {
    val rows = MultiIndex.topK(fed, Seq("public"), 20)
      .select("docId", "shard", "localDocId").collect()
    rows.foreach { r =>
      val (g, s, l) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(s == (if (g < N / 2) 0 else 1), s"docId=$g shard=$s")
      assert(l == (if (g < N / 2) g else g - N / 2), s"docId=$g local=$l")
    }
  }

  test("three uneven shards, random queries: still bit-identical") {
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 300, 3).toDF(),
      Seq("repo", "path", "commit"), 3).cache()
    val cuts = Seq(0L, 47L, 211L, 300L) // uneven on purpose
    val dirs = (0 until 3).map { i =>
      val d = Files.createTempDirectory(s"graft-multi3-$i").toString
      val slice = withIds.filter(col("docId") >= cuts(i) && col("docId") < cuts(i + 1))
        .withColumn("docId", col("docId") - cuts(i))
      IndexStore.build(spark, slice, d, numSegments = 1, shufflePartitions = 3)
      d
    }
    val dAll = Files.createTempDirectory("graft-multi3-all").toString
    IndexStore.build(spark, withIds, dAll, numSegments = 1, shufflePartitions = 3)
    val all = IndexStore.OpenIndex(spark, dAll)
    val shards = dirs.map(IndexStore.OpenIndex(spark, _))
    val vocab = Seq("public", "import", "class", "val", "def", "handler3",
      "parseconfig", "uniq_5_0", "uniq_42_1", "return")
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 10) {
      val terms = Seq.fill(rnd.nextInt(3) + 1)(vocab(rnd.nextInt(vocab.size))).distinct
      val mode = if (rnd.nextBoolean()) QueryEngine.Or else QueryEngine.And
      val k = rnd.nextInt(40) + 1
      val want = all.topK(terms, k, mode)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      val got = MultiIndex.topK(shards, terms, k, mode).select("docId", "score")
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      assert(got === want, s"terms=$terms mode=$mode k=$k")
    }
  }

  test("per-shard deletes are rebased and honored") {
    // delete the top hit's shard-B local id; it must vanish from federation
    val top = MultiIndex.topK(fed, Seq("public"), 1)
      .select("docId", "shard", "localDocId").head()
    val (gid, shard, lid) = (top.getLong(0), top.getInt(1), top.getLong(2))
    val victim = if (shard == 1) idxB else idxA
    IndexStore.delete(spark, victim.dir, Seq(lid))
    try {
      val fresh = Seq(IndexStore.OpenIndex(spark, idxA.dir),
        IndexStore.OpenIndex(spark, idxB.dir))
      val after = MultiIndex.topK(fresh, Seq("public"), 10)
        .select("docId").collect().map(_.getLong(0)).toSet
      assert(!after.contains(gid))
    } finally graft.util.Fs.rmTree(s"${victim.dir}/deletes")
  }

}
