package graft.tools

import graft.index.IndexBuilder
import org.apache.spark.sql.SparkSession

/** Isolates analysis cost from cache-materialization cost. */
object AnalyzeProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("8").toInt
    val path = args.drop(1).headOption.getOrElse("target/bench-corpus-240000")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(path)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"APROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    // warm
    IndexBuilder.invertDocs(spark, corpus.limit(2000)).count()
    time("analyze-no-persist") { IndexBuilder.invertDocs(spark, corpus).count(): Unit }
    time("analyze-no-persist-2") { IndexBuilder.invertDocs(spark, corpus).count(): Unit }
    val inv = IndexBuilder.invertDocs(spark, corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("analyze-persist-deser") { inv.count(): Unit }
    inv.unpersist()
    val invS = IndexBuilder.invertDocs(spark, corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    time("analyze-persist-ser") { invS.count(): Unit }
    time("cached-read-ser") { IndexBuilder.postingsOf(invS).count(): Unit }
    invS.unpersist()
    spark.stop()
  }
}

/** Second probe: read-only cost vs analysis cost; union-doubled small corpus. */
object AnalyzeProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false").config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"APROBE2 $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val c120 = spark.read.parquet("target/bench-corpus-120000")
    val c240 = spark.read.parquet("target/bench-corpus-240000")
    IndexBuilder.invertDocs(spark, c120.limit(2000)).count()
    time("scan-chars-120k") { c120.agg(sum(length(col("content")))).head(): Unit }
    time("scan-chars-240k") { c240.agg(sum(length(col("content")))).head(): Unit }
    val doubled = c120.union(c120.withColumn("docId", col("docId") + 120000))
    time("analyze-120k") { IndexBuilder.invertDocs(spark, c120).count(): Unit }
    time("analyze-120k-doubled") { IndexBuilder.invertDocs(spark, doubled).count(): Unit }
    time("analyze-240k") { IndexBuilder.invertDocs(spark, c240).count(): Unit }
    spark.stop()
  }
}
