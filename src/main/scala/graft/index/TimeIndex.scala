package graft.index

import graft.query.{BM25, QueryEngine}
import graft.query.QueryEngine.TermInfo
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/**
 * Time-bucketed event index — the IVrixDB model (reference
 * ivrixdb/index/node/HotBucket.java:24, EventIndexer.java:24-30,
 * `IVrixDB Architecture.md:36-51`): the corpus is a stream of events
 * `(eventId, _time, _raw)`; the index is sliced into time buckets, each an
 * independent immutable mini-index (bucket id = `yyyy-MM-dd'T'HH` of the
 * truncated event time; range bounds must use that format); searches open only the buckets
 * overlapping the queried time range (HOT→WARM→COLD = newest-first), and
 * retention is a bucket drop.
 *
 * Spark-first shape:
 *  - one bucket = one partition directory `buckets/b=<yyyy-MM-dd'T'HH>/` holding
 *    packed postings + docstats + a commit manifest (idempotent, resumable
 *    exactly like IndexStore segments);
 *  - bucket assignment is event-time (`date_trunc`), so out-of-order
 *    arrival lands in the right bucket — search results are independent of
 *    arrival order (IVrixDB Architecture.md:51);
 *  - cross-bucket queries merge collection stats (N, avgdl, df) across the
 *    selected buckets BEFORE scorer construction, so scores are
 *    bit-identical to a single index over the same events (tested).
 *
 * docIds are the (globally unique) eventIds — buckets need no remapping,
 * and the per-bucket build has no density requirement.
 */
object TimeIndex {

  private def bucketDir(dir: String, bucket: String) = s"$dir/buckets/b=$bucket"

  def isCommitted(dir: String, bucket: String): Boolean =
    Files.exists(Paths.get(bucketDir(dir, bucket), "MANIFEST.json"))

  /** Committed bucket ids, ascending by date string. */
  def buckets(dir: String): Seq[String] = {
    val root = Paths.get(s"$dir/buckets")
    if (!Files.exists(root)) return Nil
    val it = Files.list(root).iterator()
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val p = it.next()
      if (Files.exists(p.resolve("MANIFEST.json")))
        out += p.getFileName.toString.stripPrefix("b=")
    }
    out.sorted.toSeq
  }

  /**
   * Build (or resume) the bucketed index over an event table. Buckets whose
   * manifest exists are skipped — re-running after new events arrive only
   * builds new/missing buckets (the HOT-bucket append pattern; an existing
   * bucket is immutable, late events for an already-committed bucket call
   * for a rebuild of that bucket via `dropBucket` first).
   */
  def build(spark: SparkSession, events: DataFrame, dir: String,
            idCol: String = "event_id", timeCol: String = "ts", rawCol: String = "raw",
            granularity: String = "day", shufflePartitions: Int = 8): Unit = {
    import spark.implicits._
    // events without a timestamp cannot be bucketed (IVrixDB requires
    // `_time`); exclude them explicitly rather than corrupting a null bucket
    val withBucket = events
      .filter(col(timeCol).isNotNull)
      .select(
        col(idCol).cast("long").as("docId"),
        col(rawCol).cast("string").as("content"),
        date_format(date_trunc(granularity, col(timeCol)), "yyyy-MM-dd'T'HH").as("bucket"))
      // persisted: the distinct() pass plus one filter PER BUCKET would
      // otherwise re-scan the full source once per bucket
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = withBucket.select("bucket").distinct().as[String].collect().sorted
    for (b <- all if !isCommitted(dir, b)) {
      val slice = withBucket.filter($"bucket" === b).drop("bucket")
      val inv = IndexBuilder.invertDocs(spark, slice)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bd = bucketDir(dir, b)
      IndexBuilder.packBlocks(spark, IndexBuilder.postingsOf(inv), shufflePartitions)
        .write.mode("overwrite").parquet(s"$bd/postings")
      val ds = IndexBuilder.statsOf(inv)
      ds.write.mode("overwrite").parquet(s"$bd/docstats")
      val cs = IndexBuilder.corpusStats(ds)
      inv.unpersist()
      val json = s"""{"bucket":"$b","docCount":${cs.docCount},"sumDl":${cs.sumTotalTermFreq},"appId":"${spark.sparkContext.applicationId}"}"""
      val tmp = Paths.get(s"$bd/MANIFEST.json.tmp")
      Files.createDirectories(tmp.getParent)
      Files.writeString(tmp, json)
      Files.move(tmp, Paths.get(s"$bd/MANIFEST.json"), StandardCopyOption.ATOMIC_MOVE)
    }
    withBucket.unpersist(): Unit
  }

  /** Retention: drop a whole bucket (IVrixDB COLD detach / partition drop). */
  def dropBucket(dir: String, bucket: String): Unit =
    graft.util.Fs.rmTree(bucketDir(dir, bucket))

  /**
   * Top-k BM25 over the buckets intersecting [fromBucket, toBucket]
   * (inclusive, bucket-id strings). Only selected buckets' parquet is read
   * (bucket-level pruning = IVrixDB opening only relevant buckets);
   * collection stats merge across them so scores match a monolithic index.
   */
  def topK(spark: SparkSession, dir: String, terms: Seq[String], k: Int,
           fromBucket: String = "", toBucket: String = "￿"): DataFrame = {
    import spark.implicits._
    val sel = buckets(dir).filter(b => b >= fromBucket && b <= toBucket)
    if (sel.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    // merged collection stats from bucket manifests (no data read)
    var docCount = 0L
    var sumDl = 0L
    sel.foreach { b =>
      val m = Files.readString(Paths.get(bucketDir(dir, b), "MANIFEST.json"))
      docCount += """"docCount":(\d+)""".r.findFirstMatchIn(m).get.group(1).toLong
      sumDl += """"sumDl":(\d+)""".r.findFirstMatchIn(m).get.group(1).toLong
    }
    val blocks = spark.read.parquet(sel.map(b => s"${bucketDir(dir, b)}/postings"): _*)
      .as[BlockRow]
    val qs = terms.distinct
    val dfs = blocks.filter($"term".isin(qs: _*))
      .groupBy("term").agg(sum("n").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val infos = qs.zipWithIndex.collect { case (t, i) if dfs.contains(t) =>
      val scorer = BM25.termScorer(1f, BM25.DefaultK1, BM25.DefaultB, dfs(t), docCount, sumDl)
      TermInfo(t, i, scorer, scorer.score(Int.MaxValue.toFloat, 0.toByte))
    }
    if (infos.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    QueryEngine.topKWithInfos(spark, blocks, infos, k)
  }
}
