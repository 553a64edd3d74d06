package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway-style probe: connectedComponents timing on a worst-case path
  * graph (kept as a diagnosis tool alongside BenchProbe). */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val edges = ((0 until 99).map(i => (i.toLong, i.toLong + 1)) ++
      Seq((200L, 201L), (201L, 202L), (202L, 200L), (300L, 301L))).toDF("src", "dst")
    val t0 = System.nanoTime()
    val cc = graft.operators.Dedup.connectedComponents(edges, "src", "dst", maxIters = 12)
    val n = cc.collect().length
    println(f"CC rows=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
