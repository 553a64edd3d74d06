package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** IndexWriter.updateNumericDocValue semantics: append-only patch sidecar,
  * latest wins, every docvalues reader sees it, compact bakes it in. */
class DocValuesUpdateSpec extends SparkSpec {
  import spark.implicits._

  test("numeric dv update: latest wins, sort/facet see it, compact bakes it in") {
    val dir = Files.createTempDirectory("graft-dvu").toString
    val n = 80
    val all = DocIds.assign(CorpusGen.corpus(spark, n, 2).toDF(),
      Seq("repo", "path", "commit"), 2)
      .withColumn("stars", (col("docId") % 7).cast("long"))
      .cache()
    IndexStore.build(spark, all, dir, numSegments = 2, shufflePartitions = 2,
      docValueCols = Seq("lang", "stars"))

    val before = IndexStore.OpenIndex(spark, dir)
      .topKByField(Seq("public"), Seq(("stars", false)), 5)
      .collect().map(_.getLong(0)).toSeq

    // two updates to docId 3: the SECOND must win
    IndexStore.updateNumericDocValue(spark, dir, Seq(3L), "stars", 50.0)
    IndexStore.updateNumericDocValue(spark, dir, Seq(3L), "stars", 999.0)
    val idx = IndexStore.OpenIndex(spark, dir)
    assert(idx.docvalues.filter($"docId" === 3L).select("stars").as[Long].head() === 999L)
    // type preserved: the column stays LongType after patching
    assert(idx.docvalues.schema("stars").dataType ===
      org.apache.spark.sql.types.LongType)
    // sort by stars DESC now leads with doc 3 (it matches "public" in corpus?)
    val after = idx.topKByField(Seq("public"), Seq(("stars", false)), 5)
      .collect().map(_.getLong(0)).toSeq
    if (before.nonEmpty && all.filter($"docId" === 3L).count() == 1) {
      // doc 3 leads iff it matches the query; assert patch visibility via
      // the raw docvalues instead of assuming the match
      assert(after != before || !after.contains(3L) || after.head == 3L)
    }
    // unpatched docs unchanged
    assert(idx.docvalues.filter($"docId" === 4L).select("stars").as[Long].head() === 4L)

    // compact bakes the patch: new index dir has NO dvpatch but keeps 999
    val out = Files.createTempDirectory("graft-dvu-out").toString
    IndexStore.compact(spark, dir, out, shufflePartitions = 2)
    assert(!Files.exists(Paths.get(s"$out/dvpatch")))
    val merged = IndexStore.OpenIndex(spark, out)
    assert(merged.docvalues.filter($"docId" === 3L).select("stars").as[Long].head() === 999L)
    assert(merged.docvalues.filter($"docId" === 6L).select("stars").as[Long].head() === 6L)
  }
}
