package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, dense, partitioning-independent docId assignment: the
 * docId of a row is its position in the total order of `keys`. This is the
 * Spark replacement for Lucene's arrival-ordered segment-local docIDs
 * (reference: lucene/core/src/java/org/apache/lucene/index/IndexWriter.java
 * :1212 assigns by insertion) — a total order is required so that BM25
 * tie-breaks (score DESC, docId ASC) are identical at any parallelism
 * (SURVEY.md §7.4.3).
 *
 * Scale note: this is the distributed zipWithIndex pattern — range
 * repartition on the key (Spark's TB-scale sort), per-partition row_number,
 * plus a driver-side prefix sum over ~numPartitions counts. No single-
 * partition window, no collect of data rows; works at 10^12 rows with
 * enough partitions.
 */
object DocIds {

  def assign(df: DataFrame, keys: Seq[String], numPartitions: Int, idCol: String = "docId",
             requireUniqueKeys: Boolean = true): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    // duplicate keys would make row_number ties partitioning-dependent:
    // ids still dense (passing IndexStore's density check) but mapped
    // differently per run — silently corrupting RESUMED builds. Fail fast.
    if (requireUniqueKeys) {
      val dup = df.groupBy(keyCols: _*).count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"docId keys $keys are not unique (e.g. ${dup.headOption}): ids would be " +
          "nondeterministic across runs, breaking resumable builds and rank tie-breaks")
    }
    // PERSIST is load-bearing, not an optimization: range-partition
    // boundaries are sampled with a fresh seed on every materialization, so
    // without pinning them the counts job and the assignment job could see
    // different partition boundaries -> wrong offsets -> lost/duplicate ids.
    // MEMORY_AND_DISK spills rather than evicting, so boundaries are fixed
    // at first materialization. One materialized copy is the price of a
    // deterministic distributed zipWithIndex; it lives until session end or
    // spark.catalog.clearCache() (the cache entry is internal — the
    // returned plan derives from it, so callers must not unpersist early).
    val sorted = df
      .repartitionByRange(numPartitions, keyCols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one tiny job: rows per range-partition -> prefix-sum offsets
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = new Array[Long](numPartitions + 1)
    counts.foreach { case (pid, c) => offsets(pid + 1) = c }
    var i = 1
    while (i <= numPartitions) { offsets(i) += offsets(i - 1); i += 1 }
    val offMap = typedLit(offsets.take(numPartitions).zipWithIndex.map { case (o, p) => (p, o) }.toMap)
    val w = Window.partitionBy("_pid").orderBy(keyCols: _*)
    sorted
      .withColumn(idCol, element_at(offMap, col("_pid")) + row_number().over(w) - 1)
      .drop("_pid")
  }
}
