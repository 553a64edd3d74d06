package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** IndexWriter.updateDocument lifecycle: tombstone old version + sealed
  * replacement segment; queries flip atomically; compact reclaims. */
class UpdateLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("updateDocuments: old version unsearchable, new version found, compact reclaims") {
    val dir = Files.createTempDirectory("graft-upd").toString
    val n = 150
    val all = DocIds.assign(CorpusGen.corpus(spark, n, 4).toDF(),
      Seq("repo", "path", "commit"), 4).cache()
    IndexStore.build(spark, all, dir, numSegments = 2, shufflePartitions = 4)

    // pick a token unique to docId 5's old content
    val oldContent = all.filter($"docId" === 5L).select("content").as[String].head()
    val uniqOld = "uniq_\\d+_\\d+".r.findFirstIn(oldContent).get
    assert(IndexStore.OpenIndex(spark, dir).topK(Seq(uniqOld), 10)
      .collect().map(_.getLong(0)).contains(5L))

    // replace docId 5 with new content under NEW docId n (Lucene: update
    // re-adds under a fresh internal id)
    val newDocs = Seq((n.toLong, "zzzupdated sentinel replacement content body"))
      .toDF("docId", "content")
    IndexStore.updateDocuments(spark, dir, replacedIds = Seq(5L),
      newDocs, "docId", "content", shufflePartitions = 4)

    val idx = IndexStore.OpenIndex(spark, dir)
    // old version: tombstoned out of every query path
    assert(!idx.topK(Seq(uniqOld), 10).collect().map(_.getLong(0)).contains(5L))
    // new version searchable
    assert(idx.topK(Seq("zzzupdated"), 10).collect().map(_.getLong(0)).toSeq === Seq(n.toLong))
    // Lucene stats semantics: deleted doc still counted until merge
    assert(idx.stats.docCount === n + 1L)

    // compact purges the tombstone; docCount drops to n (149 live + 1 new)
    val out = Files.createTempDirectory("graft-upd-out").toString
    IndexStore.compact(spark, dir, out, shufflePartitions = 4)
    val merged = IndexStore.OpenIndex(spark, out)
    assert(merged.stats.docCount === n.toLong)
    assert(!merged.topK(Seq(uniqOld), 10).collect().map(_.getLong(0)).contains(5L))
    assert(merged.topK(Seq("zzzupdated"), 10).collect().map(_.getLong(0)).toSeq === Seq(n.toLong))
  }

  test("updateDocuments analyzes replacements through the index's persisted chain") {
    val dir = Files.createTempDirectory("graft-upd-en").toString
    val n = 60
    val all = DocIds.assign(CorpusGen.corpus(spark, n, 2).toDF(),
      Seq("repo", "path", "commit"), 2).cache()
    IndexStore.build(spark, all, dir, numSegments = 1, shufflePartitions = 2,
      analyzer = graft.analysis.AnalyzerChain.english(Set("the", "a")))

    IndexStore.updateDocuments(spark, dir, replacedIds = Seq(0L),
      Seq((n.toLong, "the zzrunning handlers")).toDF("docId", "content"),
      "docId", "content", shufflePartitions = 2)

    val idx = IndexStore.OpenIndex(spark, dir)
    // replacement was Porter-stemmed at seal time: query "zzrunning"
    // analyzes through the same chain -> stem "zzrun" matches
    assert(idx.analyzeQuery("zzrunning") === Seq("zzrun"))
    val hits = idx.topK(idx.analyzeQuery("zzrunning"), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(hits === Seq(n.toLong))
    // the stopword was dropped at index time (chain applied, not raw)
    assert(idx.termstats.filter($"term" === "the").count() === 0L)
  }
}
