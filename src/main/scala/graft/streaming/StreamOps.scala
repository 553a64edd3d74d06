package graft.streaming

import graft.analysis.Analyzer
import graft.codec.SmallFloat
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** A schema-less time-series event (IVrixDB's data model: `{_raw, _time}` —
  * reference IVrixDB Architecture.md:36; all other fields are extracted at
  * search time). */
final case class RawEvent(raw: String, time: java.sql.Timestamp)

/** One sessionization state row for mapGroupsWithState. */
final case class SessionAgg(userId: Long, nEvents: Long, firstTs: Long, lastTs: Long, closed: Boolean)

/**
 * Structured-Streaming re-expression of the reference's streaming surface
 * (SURVEY.md §2.7):
 *
 *  - IVrixDB ingest + time bucketing (HotBucket.java:24, EventIndexer.java:24)
 *    → event-time tumbling windows with a watermark; bucket rollover =
 *    window close, out-of-order tolerance = watermark delay.
 *  - Dynamic timeline (DynamicTimeline.java:25) → windowed counts in update
 *    mode, re-scoped by the chosen gap.
 *  - topic() incremental pull with persisted checkpoints (TopicStream.java:71)
 *    → readStream + checkpointLocation offsets.
 *  - daemon() interval re-run (DaemonStream.java:52) → Trigger.ProcessingTime.
 *  - Search-time field extraction (FieldExtractionStream.java:37) → the same
 *    regex projection applied to a streaming Dataset.
 *  - Incremental HOT-segment index build → foreachBatch appending posting
 *    shards per micro-batch (each batch = one Lucene "flush").
 *
 * Every transform here works identically on a batch DataFrame (tests run
 * both ways — Spark's unified API).
 */
object StreamOps {

  /** Timeline aggregation: event-time tumbling windows with watermark.
    * `gap` e.g. "1 hour"; `lateness` e.g. "10 minutes". */
  def timeline(events: DataFrame, timeCol: String, gap: String, lateness: String): DataFrame =
    events
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), gap))
      .agg(count("*").as("cnt"))
      .select(col("window.start").as("bucket_start"),
        col("window.end").as("bucket_end"), col("cnt"))

  /** Gap ladder for [[dynamicTimeline]] (seconds). */
  private val GapLadder: Seq[Long] =
    Seq(1L, 10L, 60L, 300L, 900L, 3600L, 3 * 3600L, 6 * 3600L, 12 * 3600L,
      86400L, 7 * 86400L, 30 * 86400L, 365 * 86400L)

  /**
   * Dynamic timeline (IVrixDB DynamicTimeline.java:25-38): pick the
   * smallest gap from a fixed ladder that keeps the bucket count under
   * `maxBuckets` for the data's actual time span, then bucket-count.
   * Buckets are epoch-aligned (floor(epoch/gap)*gap) so the result is
   * reproducible and SQL-expressible. Returns (bucket_start, cnt).
   */
  def dynamicTimeline(events: DataFrame, timeCol: String, maxBuckets: Int): DataFrame = {
    val epoch = col(timeCol).cast("timestamp").cast("long") // NTZ-safe
    val r = events.agg(min(epoch), max(epoch)).head()
    if (r.isNullAt(0)) return events.select(epoch.as("bucket_start")).limit(0)
      .withColumn("cnt", lit(0L))
    val span = r.getLong(1) - r.getLong(0) + 1
    val gap = GapLadder.find(g => span / g < maxBuckets).getOrElse(GapLadder.last)
    // bucket_start as epoch seconds: timezone-representation-proof
    events
      .groupBy((floor(epoch / gap).cast("long") * gap).as("bucket_start"))
      .agg(count("*").as("cnt"))
  }

  /** Search-time field extraction (IVrixDB stfe): split `_raw` into typed
    * fields by k:v regex, schema-on-read. Works on stream or batch. */
  def extractFields(events: DataFrame, rawCol: String, keys: Seq[String]): DataFrame =
    keys.foldLeft(events) { (df, k) =>
      // left word boundary: 'id=' must not match inside 'user_id=';
      // quote the key so regex metacharacters match literally
      val kq = java.util.regex.Pattern.quote(k)
      val numPat = s"(?:^|\\s)$kq=(-?\\d+(\\.\\d+)?)"
      df.withColumn(k,
        when(regexp_extract(col(rawCol), numPat, 1).rlike("^-?\\d+$$"),
          regexp_extract(col(rawCol), numPat, 1).cast("long"))
          .otherwise(null))
        .withColumn(s"${k}_s", regexp_extract(col(rawCol), s"(?:^|\\s)$kq=([^ ]+)", 1))
    }

  /** Sessionize by user with a gap timeout — custom state via
    * mapGroupsWithState (the KeyValueGroupedDataset state API). The emitted
    * row is the user's CURRENT session; `closed` = true iff a gap rollover
    * closed a previous session during THIS batch (reset each batch). */
  def sessionize(events: Dataset[(Long, Long)], gapMs: Long): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[SessionAgg, SessionAgg](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionAgg]) =>
          val ts = rows.map(_._2).toSeq.sorted
          val prev = state.getOption.getOrElse(SessionAgg(userId, 0, Long.MaxValue, Long.MinValue, closed = false))
          val next = ts.foldLeft(prev.copy(closed = false)) { (s, t) =>
            if (s.nEvents > 0 && t - s.lastTs > gapMs)
              SessionAgg(userId, 1, t, t, closed = true) // previous session closed
            else
              SessionAgg(userId, s.nEvents + 1, math.min(s.firstTs, t), math.max(s.lastTs, t), s.closed)
          }
          state.update(next)
          next
      }
  }

  /** topic()-style incremental consumption: stream a source with offsets
    * persisted under `checkpointDir`, applying `transform` per batch and
    * appending to a parquet sink — at-least-once, resumable. */
  def topicPull(spark: SparkSession, source: DataFrame, transform: DataFrame => DataFrame,
                sinkDir: String, checkpointDir: String, intervalMs: Long = 500): StreamingQuery =
    transform(source).writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(intervalMs))
      .start()

  /**
   * Incremental HOT-segment index build: every micro-batch becomes one
   * immutable posting shard (term,docId,tf,normByte rows + per-batch doc
   * stats) appended under `indexDir`/hot — the streaming analogue of a
   * Lucene flush; a periodic IndexStore merge compacts HOT shards into
   * the main segmented index (WARM/COLD).
   */
  def hotIndexSink(docs: DataFrame, idCol: String, contentCol: String,
                   indexDir: String, checkpointDir: String): StreamingQuery = {
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val rows = batch.select(col(idCol).cast("long"), col(contentCol).cast("string"))
          .as[(Long, String)]
          .flatMap { case (docId, content) =>
            val (tfs, dl) = Analyzer.termFreqs(content)
            val nb = SmallFloat.intToByte4(dl)
            tfs.iterator.map { case (t, f) => (t, docId, f, nb, dl) }
          }
          .toDF("term", "docId", "tf", "normByte", "dl")
        rows.write.mode("overwrite")
          .parquet(s"$indexDir/hot/batch=$batchId")
      }
      .start()
  }

  /** Read back all HOT shards as one postings view (queried alongside the
    * main index, newest-first — IVrixDB's HOT→WARM→COLD search order). */
  def hotPostings(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/hot/*")
}
