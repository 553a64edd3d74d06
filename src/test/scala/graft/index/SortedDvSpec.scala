package graft.index

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import graft.corpus.CorpusGen
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Index-sort early termination (reference: IndexWriterConfig.setIndexSort
  * + TopFieldCollector early termination): the sorted doc-values tier
  * answers same-sort top-k reading a bounded number of rows — proven on
  * task input metrics — with results identical to the full sort. */
class SortedDvSpec extends SparkSpec {
  import spark.implicits._

  val N = 400000L
  val FilesN = 8
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dvsorted").toString
    // a small real index (the tier lives beside the segments)...
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 300, 4).toDF(),
      Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, d, numSegments = 1, shufflePartitions = 4)
    // ...and a BIG sorted tier: files must span many vectorized reader
    // batches (4096 rows) for the early stop to be visible in row metrics
    val dv = spark.range(N).select(col("id").as("docId"),
      ((col("id") * 7919) % 100000).cast("int").as("size"),
      (col("id") % 3).cast("int").as("grp"))
    IndexStore.buildSortedDocValues(spark, dv, d, "size", Seq("grp"), partitions = FilesN)
    d
  }
  lazy val idx = IndexStore.OpenIndex(spark, dir)
  lazy val full = spark.read.parquet(s"$dir/dvsorted/size").cache()

  private def recordsRead(body: => Unit): Long = {
    val n = new AtomicLong()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) n.addAndGet(e.taskMetrics.inputMetrics.recordsRead): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try { body; Thread.sleep(1500) } // let the listener bus drain
    finally spark.sparkContext.removeSparkListener(listener)
    n.get()
  }

  test("early-terminated top-k equals the full sort, match-all and filtered") {
    val want = full.orderBy(asc("size"), asc("docId")).limit(10)
      .select("docId", "size").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val got = idx.topKByFieldSorted("size", 10)
      .select("docId", "size").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === want)
    val wantF = full.filter(col("grp") === 1)
      .orderBy(asc("size"), asc("docId")).limit(7)
      .select("docId", "size").collect().toSeq
    val gotF = idx.topKByFieldSorted("size", 7, Some(col("grp") === 1))
      .select("docId", "size").collect().toSeq
    assert(gotF === wantF)
  }

  test("rows read are bounded by reader batches per file, not tier size") {
    idx.topKByFieldSorted("size", 10).collect() // warm (footer reads etc.)
    val read = recordsRead {
      idx.topKByFieldSorted("size", 10).collect(): Unit
    }
    // each of the 8 files stops within a couple of 4096-row vectorized
    // batches; a full scan would read 400k rows
    assert(read > 0, "listener saw no input metrics")
    assert(read <= FilesN * 2L * 4096, s"read $read rows — early termination lost")
    assert(read < N / 10, s"read $read of $N rows")
  }

  test("missing tier fails fast") {
    val e = intercept[IllegalArgumentException] {
      idx.topKByFieldSorted("nosuchfield", 5)
    }
    assert(e.getMessage.contains("no sorted doc-values tier"))
  }
}
