package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JDBC source (Solr streaming-expression JDBCStream analogue, reference
 * solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/JDBCStream
 * .java:121 — pull rows from a relational store into the dataflow).
 *
 * Spark-first: `spark.read.jdbc` already gives predicate pushdown, column
 * pruning, and partitioned parallel reads; this wrapper just standardizes
 * the two shapes the reference supports (whole table / arbitrary query)
 * and the partitioned-scan contract. Exercised end-to-end against an
 * in-process Derby database in JdbcSourceSpec.
 */
object Jdbc {

  /** Read a whole table (or a `(select ...) alias` subquery). */
  def readTable(spark: SparkSession, url: String, table: String,
                props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, p)
  }

  /**
   * Partitioned parallel read: `numPartitions` concurrent range scans on
   * `partitionCol` in [lower, upper] — the scale path for large source
   * tables (each executor opens its own connection; predicates and column
   * pruning push into each partition's WHERE clause).
   */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      props: Map[String, String] = Map.empty): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, p)
  }
}
