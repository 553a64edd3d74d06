package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-rehearsal table generator: tiles the driver's deterministic sf0.1
 * star schema N× with FOREIGN-KEY-CONSISTENT key offsets (every copy's
 * customer/order/part/supplier/doc/vector keys shift by copy ×
 * (maxKey+1), so joins, graph edges and id-gated queries stay valid),
 * producing an sf1-equivalent directory the full oracle battery can run
 * against — Spark result vs DuckDB on the SAME generated tables, which is
 * exactly the driver's correctness contract at 10× its own gate scale.
 *
 * Deterministic: pure column arithmetic over the (seeded) source tables;
 * no RNG. Text/timestamps are tiled verbatim, so the dedup family sees a
 * 10×-duplicated corpus — a realistic (and stressful) dedup workload.
 *
 * Usage: runMain graft.tools.ScaleGen <baseDir> <outDir> <copies>
 */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val base = args(0)
    val out = args(1)
    val copies = args(2).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(name: String): DataFrame = spark.read.parquet(s"$base/$name.parquet")
    def keySpan(df: DataFrame, keyCol: String): Long =
      df.agg(max(col(keyCol))).head.getLong(0) + 1

    val custSpan = keySpan(rd("customer"), "c_custkey")
    val ordSpan = keySpan(rd("orders"), "o_orderkey")
    val partSpan = keySpan(rd("part"), "p_partkey")
    val suppSpan = keySpan(rd("supplier"), "s_suppkey")
    val docSpan = keySpan(rd("documents"), "doc_id")
    val vecSpan = keySpan(rd("embeddings"), "vec_id")
    val evSpan = keySpan(rd("events"), "event_id")
    val userSpan = rd("events").agg(max(col("user_id"))).head.getLong(0) + 1

    /** Tile `df` `copies`× shifting the listed long key columns by
      * copy × span; non-key columns repeat verbatim. */
    def tile(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val tiled = (0 until copies).map { c =>
        shifts.foldLeft(df) { case (d, (k, span)) =>
          d.withColumn(k, col(k) + lit(c * span))
        }
      }
      tiled.reduce(_ unionByName _)
    }

    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dimension tables tile with their own keys; fact tables shift FKs too
    write(rd("region"), "region", 1)
    write(rd("nation"), "nation", 1)
    write(tile(rd("customer"), "c_custkey" -> custSpan), "customer", copies)
    write(tile(rd("supplier"), "s_suppkey" -> suppSpan), "supplier", 1)
    write(tile(rd("part"), "p_partkey" -> partSpan), "part", copies)
    write(tile(rd("orders"), "o_orderkey" -> ordSpan, "o_custkey" -> custSpan),
      "orders", copies)
    write(tile(rd("lineitem"), "l_orderkey" -> ordSpan, "l_partkey" -> partSpan,
      "l_suppkey" -> suppSpan), "lineitem", copies * 2)
    write(tile(rd("events"), "event_id" -> evSpan, "user_id" -> userSpan),
      "events", copies)
    write(tile(rd("documents"), "doc_id" -> docSpan), "documents", copies)
    write(tile(rd("embeddings"), "vec_id" -> vecSpan), "embeddings", copies)

    val counts = Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .map(n => s"$n=${spark.read.parquet(s"$out/$n.parquet").count()}")
    println(s"scalegen: copies=$copies ${counts.mkString(" ")}")
    spark.stop()
  }
}
