package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import java.nio.file.Files

/** Time-budgeted search (TimeLimitingCollector semantics): unlimited
  * budget equals plain topK; an expired budget returns the partial
  * searched-prefix merge flagged partial; deletes stay excluded. */
class BudgetSpec extends SparkSpec {
  import spark.implicits._

  lazy val (dir, idx) = {
    val d = Files.createTempDirectory("graft-budget").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 240, 4).toDF(),
      Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, d, numSegments = 4, shufflePartitions = 4)
    (d, IndexStore.OpenIndex(spark, d))
  }

  test("unlimited budget equals plain topK bit-exactly") {
    val terms = Seq("public", "import")
    val (hits, partial) = idx.topKBudgeted(terms, 15, budgetMs = 600000)
    val want = idx.topK(terms, 15).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(!partial)
    assert(hits === want)
  }

  test("zero budget returns the newest segment's results, flagged partial") {
    val terms = Seq("public")
    val (hits, partial) = idx.topKBudgeted(terms, 10, budgetMs = 0)
    assert(partial)
    assert(hits.nonEmpty)
    // the newest segment covers the highest docId slice [180, 240)
    assert(hits.forall(_._1 >= 180L), s"expected newest-segment docs only: $hits")
    // scores use GLOBAL stats: each returned doc's score equals its score
    // in the full (unbudgeted) search
    val full = idx.topK(terms, 1000000).collect()
      .map(r => (r.getLong(0), r.getFloat(1))).toMap
    hits.foreach { case (id, s) => assert(s === full(id), s"doc $id") }
  }

  test("budgeted search excludes tombstones") {
    val terms = Seq("public")
    val (before, _) = idx.topKBudgeted(terms, 5, budgetMs = 600000)
    IndexStore.delete(spark, dir, before.take(2).map(_._1))
    val idx2 = IndexStore.OpenIndex(spark, dir)
    val (after, partial) = idx2.topKBudgeted(terms, 5, budgetMs = 600000)
    assert(!partial)
    assert(after.size === 5)
    assert(after.map(_._1).toSet.intersect(before.take(2).map(_._1).toSet).isEmpty)
  }
}
