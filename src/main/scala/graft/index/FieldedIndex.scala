package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-field inverted indexes — Lucene's multi-field document model
 * (reference document/Document.java: a doc is a bag of named fields, each
 * with its own postings; queries address `field:term`). Spark-first shape:
 * one independent segmented [[IndexStore]] index per field under
 * `dir/fields/<name>/`, sharing the corpus docIds, so cross-field boolean
 * composition is plain docId joins and per-field collection stats (df, N,
 * avgdl) are naturally separate — exactly Lucene's per-field statistics.
 *
 * Build cost note: fields are built sequentially over the same corpus
 * slice; each field's analysis pass reads only its own column (column
 * pruning), and resumability is inherited per field (a crashed build
 * re-runs only uncommitted segments of uncommitted fields).
 *
 * Deletes: tombstones live per field index; [[search]] applies the
 * DEFAULT field's tombstones to the final result (docIds are shared, so
 * deleting a doc means tombstoning it in the default field's index — use
 * `IndexStore.delete` on `dir/fields/<defaultField>`).
 */
object FieldedIndex {

  /** Build (or resume) one index per (fieldName -> sourceColumn). */
  def build(spark: SparkSession, corpusWithIds: DataFrame, dir: String,
            fields: Seq[(String, String)], numSegments: Int, shufflePartitions: Int,
            positionsFor: Set[String] = Set.empty): Unit = {
    require(fields.nonEmpty)
    fields.foreach { case (field, column) =>
      IndexStore.build(spark,
        corpusWithIds.select(col("docId"), col(column).cast("string").as("content")),
        s"$dir/fields/$field", numSegments, shufflePartitions,
        source = s"field:$field", withPositions = positionsFor.contains(field))
    }
  }

  /** Open every committed field index under `dir`. */
  def open(spark: SparkSession, dir: String): Map[String, IndexStore.OpenIndex] = {
    val root = java.nio.file.Paths.get(s"$dir/fields")
    require(java.nio.file.Files.exists(root), s"no fielded index under $dir")
    val it = java.nio.file.Files.list(root).iterator()
    val out = scala.collection.mutable.Map[String, IndexStore.OpenIndex]()
    while (it.hasNext) {
      val p = it.next()
      if (IndexStore.committedSegmentDirs(p.toString).nonEmpty)
        out(p.getFileName.toString) = IndexStore.OpenIndex(spark, p.toString)
    }
    out.toMap
  }

  /** Parse + execute a classic query string with `field:` routing. */
  def search(idxs: Map[String, IndexStore.OpenIndex], defaultField: String,
             query: String, k: Int): DataFrame =
    graft.query.Searcher.searchFielded(idxs, defaultField, query, k)
}
