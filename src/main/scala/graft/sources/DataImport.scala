package graft.sources

import graft.index.{DocIds, IndexStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * DataImportHandler semantics (reference solr/contrib/dataimporthandler/
 * src/java/org/apache/solr/handler/dataimport/{DataImporter,DocBuilder}
 * .java): pull-style full-import / delta-import from a relational or file
 * source into the index, keyed by the schema's uniqueKey, with the
 * `last_index_time` checkpoint contract —
 *
 *  - full-import `clean=true` rebuilds the index from the source
 *    (DocBuilder.doFullDump after the `*:*` preImportDelete);
 *    `clean=false` upserts every source row over the existing index.
 *  - delta-import re-indexes only rows whose modification stamp is newer
 *    than the persisted `last_index_time` (the deltaQuery
 *    `... where last_modified > '${dataimporter.last_index_time}'`
 *    idiom) and removes `deletedPkQuery` rows. Deleted keys are REMOVED
 *    from the changed set before the upsert so deleted docs are not
 *    re-created (DocBuilder.doDelta:350-354).
 *  - the committed checkpoint is the import START time, not the end
 *    (DocBuilder LAST_INDEX_TIME/INDEX_START_TIME:986-987), so rows
 *    modified while an import runs fall into the NEXT delta rather than
 *    being lost.
 *
 * Docs are addressed externally by uniqueKey (`pkCol`, any type, kept as
 * string) while the engine keeps immutable internal docId ordinals —
 * exactly Lucene's updateDocument model, where a replaced doc gets a NEW
 * internal id. The pk→docId mapping is a parquet sidecar
 * (`<dir>/dataimport_pkmap`) swapped atomically per import; internal ids
 * come from the distributed [[DocIds.assign]] pass offset by a persisted
 * high-water mark, so no committed segment range is ever reused.
 *
 * Spark-first shape: the delta filter pushes into the source scan (a
 * parquet/JDBC predicate on the stamp column), the rebuild is the fully
 * distributed index build, and upserts ride the tombstone + hot-segment
 * seal path ([[IndexStore.updateDocuments]]) — unchanged docs are never
 * re-analyzed. Driver-side state is bounded by the DELTA size (the
 * changed-pk list), never the corpus.
 *
 * `startTime` is supplied by the caller (ISO instant): rerunning a failed
 * import with its recorded start time reproduces the same index — the
 * same replayability contract as the segment manifests and TimeIndex
 * commits.
 */
object DataImport {

  final case class Status(mode: String, imported: Long, deleted: Long,
                          lastIndexTime: String)

  private def propsPath(dir: String) = Paths.get(s"$dir/dataimport.json")
  private def pkmapPath(dir: String) = s"$dir/dataimport_pkmap"

  /** The persisted checkpoint, if any import has committed one. */
  def lastIndexTime(dir: String): Option[String] =
    readProp(dir, "last_index_time")

  private def readProp(dir: String, key: String): Option[String] =
    if (Files.exists(propsPath(dir))) {
      val s = Files.readString(propsPath(dir))
      (s""""$key"\\s*:\\s*"([^"]+)"""").r.findFirstMatchIn(s).map(_.group(1))
    } else None

  private def nextDocId(dir: String): Long =
    readProp(dir, "next_doc_id").map(_.toLong).getOrElse(0L)

  private def writeProps(dir: String, t: String, next: Long): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(propsPath(dir),
      s"""{"last_index_time":"$t","next_doc_id":"$next"}""")
  }

  /** uniqueKey → internal docId mapping (one row per LIVE doc). */
  def pkMap(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(pkmapPath(dir))

  private def writePkMap(spark: SparkSession, dir: String, m: DataFrame): Unit = {
    val next = s"${pkmapPath(dir)}__next"
    graft.util.Fs.rmTree(next)
    m.write.parquet(next)
    graft.util.Fs.rmTree(pkmapPath(dir))
    Files.move(Paths.get(next), Paths.get(pkmapPath(dir)))
  }

  /** full-import. `clean=true` = the reference's default: any existing
    * index at `dir` is replaced by a fully distributed build.
    * `clean=false` upserts every source row into the existing index via
    * the delta path (each gets a fresh internal id). */
  def fullImport(spark: SparkSession, source: DataFrame, pkCol: String,
                 contentCol: String, dir: String, startTime: String,
                 clean: Boolean = true, numSegments: Int = 2,
                 shufflePartitions: Int = 8): Status = {
    if (clean || !Files.exists(Paths.get(s"$dir/stats/corpus.json"))) {
      graft.util.Fs.rmTree(dir)
      val withIds = DocIds.assign(
        source.select(col(pkCol).cast("string").as("pk"),
          col(contentCol).cast("string").as("content")),
        Seq("pk"), shufflePartitions)
      IndexStore.build(spark, withIds.select(col("docId"), col("content")),
        dir, numSegments = numSegments, shufflePartitions = shufflePartitions)
      writePkMap(spark, dir, withIds.select(col("docId"), col("pk")))
      val n = pkMap(spark, dir).count()
      writeProps(dir, startTime, next = n)
      Status("full-import", n, 0L, startTime)
    } else {
      upsert(spark, dir, source, pkCol, contentCol, Nil, startTime,
        shufflePartitions, mode = "full-import")
    }
  }

  /** delta-import: rows with `stampCol` strictly newer than the persisted
    * checkpoint upsert; `deletedPks` (the deletedPkQuery result) delete
    * and are excluded from the upsert set. No checkpoint yet = epoch,
    * i.e. everything is a delta (DocBuilder:123-128). */
  def deltaImport(spark: SparkSession, source: DataFrame, pkCol: String,
                  contentCol: String, stampCol: String, dir: String,
                  startTime: String, deletedPks: Seq[String] = Nil,
                  shufflePartitions: Int = 8): Status = {
    val last = lastIndexTime(dir).getOrElse("1970-01-01T00:00:00")
    val changed = source.filter(col(stampCol) > lit(last))
    upsert(spark, dir, changed, pkCol, contentCol, deletedPks, startTime,
      shufflePartitions, mode = "delta-import")
  }

  private def upsert(spark: SparkSession, dir: String, changed: DataFrame,
                     pkCol: String, contentCol: String, deletedPks: Seq[String],
                     startTime: String, shufflePartitions: Int,
                     mode: String): Status = {
    val pm = pkMap(spark, dir).cache()
    val deletedSet = deletedPks.toSet
    // driver state bounded by the DELTA, not the corpus
    val changedPks = changed.select(col(pkCol).cast("string"))
      .distinct().collect().map(_.getString(0)).filterNot(deletedSet).toSeq
    val goneIds =
      if (deletedPks.isEmpty) Nil
      else pm.filter(col("pk").isin(deletedPks: _*))
        .select("docId").collect().map(_.getLong(0)).toSeq
    if (goneIds.nonEmpty) IndexStore.delete(spark, dir, goneIds)
    if (changedPks.nonEmpty) {
      val replacedIds = pm.filter(col("pk").isin(changedPks: _*))
        .select("docId").collect().map(_.getLong(0)).toSeq
      // high-water mark; pkmap max covers indexes whose props were lost
      // (the checkpoint file is advisory, the no-reuse invariant is not)
      val base = math.max(nextDocId(dir),
        pm.agg(max("docId")).collect()(0).getLong(0) + 1L)
      val newDocs = DocIds.assign(
        changed.filter(col(pkCol).cast("string").isin(changedPks: _*))
          .select(col(pkCol).cast("string").as("pk"),
            col(contentCol).cast("string").as("content")),
        Seq("pk"), shufflePartitions)
        .withColumn("docId", col("docId") + base)
      IndexStore.updateDocuments(spark, dir, replacedIds,
        newDocs, "docId", "content", shufflePartitions)
      val pm2 = pm
        .filter(!col("pk").isin((changedPks ++ deletedPks): _*))
        .unionByName(newDocs.select(col("docId"), col("pk")))
      writePkMap(spark, dir, pm2)
      writeProps(dir, startTime, next = base + changedPks.size)
    } else {
      if (deletedPks.nonEmpty) writePkMap(spark, dir,
        pm.filter(!col("pk").isin(deletedPks: _*)))
      writeProps(dir, startTime, next = nextDocId(dir))
    }
    pm.unpersist()
    Status(mode, changedPks.size.toLong, goneIds.size.toLong, startTime)
  }
}
