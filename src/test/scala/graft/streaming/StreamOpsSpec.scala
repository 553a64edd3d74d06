package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("timeline: windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "raw")
    val q = StreamOps.timeline(df, "ts", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tl").outputMode("complete").start()
    mem.addData((ts(0), "a"), (ts(1), "b"), (ts(11), "c"), (ts(25), "d"))
    q.processAllAvailable()
    val rows = spark.sql("select * from tl").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    q.stop()
    assert(rows.values.sum === 4)
    assert(rows.size === 3) // buckets 0-10, 10-20, 20-30
  }

  test("extractFields types k=v pairs from raw strings (batch = stream API)") {
    val df = Seq("dur=42 user=bob", "dur=7 user=eve", "garbage").toDF("raw")
    val out = StreamOps.extractFields(df, "raw", Seq("dur"))
    val got = out.select("dur", "dur_s").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
    assert(got.toSet === Set((42L, "42"), (7L, "7"), (-1L, "")))
  }

  test("sessionize: gap splits sessions, state carries counts") {
    val events = Seq((1L, 1000L), (1L, 2000L), (1L, 100000L), (2L, 500L)).toDS()
    val out = StreamOps.sessionize(events, gapMs = 60000L).collect()
    val u1 = out.find(_.userId == 1L).get
    assert(u1.nEvents === 1 && u1.closed) // last session restarted after gap
    val u2 = out.find(_.userId == 2L).get
    assert(u2.nEvents === 1 && !u2.closed)
  }

  test("topicPull: resumable checkpointed consumption appends to sink") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("topic").toString
    val mem = MemoryStream[Long]
    val q = StreamOps.topicPull(spark, mem.toDF().toDF("v"),
      df => df.withColumn("doubled", col("v") * 2),
      s"$dir/sink", s"$dir/chk", intervalMs = 100)
    mem.addData(1L, 2L, 3L)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$dir/sink").select("doubled").as[Long].collect().toSet
    assert(got === Set(2L, 4L, 6L))
  }

  test("hotIndexSink: each micro-batch lands one posting shard; postings match analyzer") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hotidx").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.hotIndexSink(mem.toDF().toDF("doc_id", "content"),
      "doc_id", "content", dir, s"$dir/chk")
    mem.addData((0L, "spark spark query"), (1L, "join the query"))
    q.processAllAvailable()
    mem.addData((2L, "late arrival spark"))
    q.processAllAvailable()
    q.stop()
    val posts = StreamOps.hotPostings(spark, dir)
    val sparkTf = posts.filter(col("term") === "spark")
      .select("docId", "tf").as[(Long, Int)].collect().toMap
    assert(sparkTf === Map(0L -> 2, 2L -> 1))
    assert(posts.filter(col("docId") === 1L).select("dl").head().getInt(0) === 3)
  }

  test("dynamicTimeline FLOORS fractional seconds at bucket boundaries") {
    // an event 0.4s BELOW a bucket boundary must stay in the lower bucket:
    // the engine truncates timestamp->long (floor for positive epochs). The
    // sf1 rehearsal caught the q39 oracle using DuckDB's epoch()::BIGINT,
    // which ROUNDS half-up and bumped exactly such events — this pins the
    // engine side of that boundary contract.
    val gap = 60L // ~6000s span -> the ladder picks the 60s rung for 300
    val base = 1700000000L - (1700000000L % gap)
    val rows = Seq(
      new Timestamp((base + gap) * 1000 - 400),  // boundary - 0.4s: LOWER bucket
      new Timestamp(base * 1000),                // bucket start
      new Timestamp((base + 5999) * 1000)        // span stretcher
    ).toDF("ts")
    val out = StreamOps.dynamicTimeline(rows, "ts", maxBuckets = 300)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(base -> 2L, (base + 5940) -> 1L))
  }
}
