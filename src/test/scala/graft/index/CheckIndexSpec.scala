package graft.index

import java.nio.file.Files

import graft.SparkSpec
import graft.corpus.CorpusGen

/** Integrity verifier (reference CheckIndex.java capability): a freshly
  * built index passes every invariant; targeted corruptions are detected
  * with the RIGHT issue class (not just "something failed"). */
class CheckIndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-checkidx").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 300, 5).toDF(),
      Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, d, numSegments = 3, shufflePartitions = 4,
      withPositions = true, withOffsets = true)
    d
  }

  private def copyIndex(): String = {
    val dst = Files.createTempDirectory("graft-checkidx-c").toString
    graft.util.Fs.rmTree(dst)
    graft.util.Fs.copyTree(java.nio.file.Paths.get(dir), java.nio.file.Paths.get(dst))
    dst
  }

  test("freshly built index is clean (all tiers)") {
    val report = CheckIndex.check(spark, dir)
    assert(report.clean, report.toJson)
    assert(report.segments == 3)
    assert(report.docCount == 300)
    assert(report.blockCount > 0 && report.termCount > 0)
    assert(report.toJson.contains("\"clean\":true"))
  }

  test("forged postings block is detected as decode + lineage violations") {
    val d = copyIndex()
    // a block whose stored aggregates lie: docs not ascending (gap of 0),
    // sumTf off by one, maxDoc wrong — appended as a new parquet file
    val bad = Seq(BlockRow("zzz_forged", 5L, 4L, 2, 99L, 1, 1,
      Array[Byte](0), Array[Byte](3), Array[Byte](0, 0), Array(1), Array[Byte](0)))
      .toDS()
    bad.write.mode("append").parquet(s"$d/segments/seg=0/postings")
    val report = CheckIndex.check(spark, d)
    assert(!report.clean)
    val checks = report.issues.map(_.check).toSet
    assert(checks.contains("block_docs_not_ascending"), report.toJson)
    assert(checks.contains("manifest_block_count"), report.toJson)
    assert(checks.contains("termstats_mismatch"), report.toJson)
    // the forged freqs decode to 0 => freq floor fires; and the forged
    // (term, doc) pairs have no positions/offsets rows => tier cross-checks
    assert(checks.contains("block_freq_below_one"), report.toJson)
    assert(checks.contains("positions_tf_mismatch"), report.toJson)
    assert(checks.contains("offsets_tf_mismatch"), report.toJson)
  }

  test("duplicate docstats row is detected as uniqueness + manifest violations") {
    val d = copyIndex()
    val dup = spark.read.parquet(s"$d/segments/seg=1/docstats").limit(1)
    dup.write.mode("append").parquet(s"$d/segments/seg=1/docstats")
    val report = CheckIndex.check(spark, d)
    assert(!report.clean)
    val checks = report.issues.map(_.check).toSet
    assert(checks.contains("duplicate_doc_ids"), report.toJson)
    assert(checks.contains("manifest_doc_count"), report.toJson)
    // duplicated docstat doubles that doc's dl contribution vs manifest
    assert(checks.contains("manifest_sum_dl"), report.toJson)
    val dupIssue = report.issues.find(_.check == "duplicate_doc_ids").get
    assert(dupIssue.count == 1 && dupIssue.examples.nonEmpty)
  }

  test("TimeIndex: clean build passes; duplicated event and forged manifest caught") {
    import java.sql.Timestamp
    def ts(day: Int, h: Int = 0) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:30:00")
    val events = Seq(
      (0L, ts(1), "spark error in executor"),
      (1L, ts(1, 5), "job finished ok"),
      (2L, ts(2), "spark warning memory"),
      (3L, ts(2, 9), "disk error on node")).toDF("event_id", "ts", "raw")
    val d = Files.createTempDirectory("graft-checktime").toString
    TimeIndex.build(spark, events, d, shufflePartitions = 2)
    val clean = CheckIndex.checkTime(spark, d)
    assert(clean.clean, clean.toJson)
    assert(clean.segments == 2 && clean.docCount == 4)

    // duplicate one docstats row in bucket 1 -> manifest count + global id
    // uniqueness both fire
    val b = TimeIndex.buckets(d).head
    val dsDir = s"$d/buckets/b=$b/docstats"
    spark.read.parquet(dsDir).limit(1).write.mode("append").parquet(dsDir)
    val bad = CheckIndex.checkTime(spark, d)
    val checks = bad.issues.map(_.check).toSet
    assert(checks.contains("bucket_doc_count"), bad.toJson)
    assert(checks.contains("duplicate_event_ids"), bad.toJson)
    // the duplicated doc's dl double-counts vs the manifest sum too
    assert(checks.contains("bucket_sum_dl"), bad.toJson)
  }

  test("sorted doc-values tier: ascending files pass, an unsorted file is caught") {
    val d = copyIndex()
    import org.apache.spark.sql.functions._
    val dv = spark.read.parquet(s"$d/segments/seg=0/docstats")
      .select(col("docId"), col("dl").as("size"))
    IndexStore.buildSortedDocValues(spark,
      spark.read.parquet(s"$d/segments/seg=0/docstats")
        .unionByName(spark.read.parquet(s"$d/segments/seg=1/docstats"))
        .unionByName(spark.read.parquet(s"$d/segments/seg=2/docstats"))
        .select(col("docId"), col("dl").as("size")),
      d, "size", Nil, partitions = 3)
    val clean = CheckIndex.check(spark, d)
    assert(clean.clean, clean.toJson)
    // append a DESCENDING file into the tier
    val tmp = Files.createTempDirectory("graft-checkidx-dv").toString
    dv.orderBy(desc("size")).coalesce(1).write.mode("overwrite").parquet(tmp)
    val src = Files.list(java.nio.file.Paths.get(tmp)).iterator()
    while (src.hasNext) {
      val p = src.next()
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.copy(p, java.nio.file.Paths.get(s"$d/dvsorted/size/zzz-unsorted.parquet"))
    }
    val bad = CheckIndex.check(spark, d)
    assert(bad.issues.exists(_.check == "dvsorted_size_file_not_ascending"), bad.toJson)
  }

  test("corrupted norm byte is detected") {
    val d = copyIndex()
    import org.apache.spark.sql.functions._
    val ds = spark.read.parquet(s"$d/segments/seg=2/docstats")
      .withColumn("normByte",
        when(col("docId") === 250L, lit(127.toByte)).otherwise(col("normByte")))
    val tmp = Files.createTempDirectory("graft-checkidx-ds").toString
    ds.write.mode("overwrite").parquet(tmp)
    graft.util.Fs.rmTree(s"$d/segments/seg=2/docstats")
    graft.util.Fs.copyTree(java.nio.file.Paths.get(tmp),
      java.nio.file.Paths.get(s"$d/segments/seg=2/docstats"))
    val report = CheckIndex.check(spark, d)
    val norm = report.issues.find(_.check == "norm_byte_mismatch")
    assert(norm.isDefined, report.toJson)
    assert(norm.get.count == 1)
  }
}
