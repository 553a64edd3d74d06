package graft.tools

import graft.index.{BlockRow, IndexBuilder, IndexStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-phase timing probe for the index build at one parallelism level —
  * identifies which build phase fails to scale with cores (run at 8 and 32
  * and diff). Not part of the driver contract; a diagnosis tool. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTS", "64").toInt
    val corpusPath = args.drop(1).headOption.getOrElse("target/bench-corpus-120000")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-probe-$cores")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // warm-up: small end-to-end build (JIT + codegen)
    val warmDir = s"/dev/shm/graft-probe-warm-$cores"
    graft.util.Fs.rmTree(warmDir)
    IndexStore.build(spark, graft.corpus.CorpusGen.corpusWithIds(spark, 2000, cores),
      warmDir, 1, parts)
    graft.util.Fs.rmTree(warmDir)

    val dir = s"/dev/shm/graft-probe-idx-$cores"
    graft.util.Fs.rmTree(dir)
    val tAll = System.nanoTime()
    val corpus = phase("read-schema") { spark.read.parquet(corpusPath) }
    phase("chk-agg") {
      corpus.agg(max("docId"), count("*"), countDistinct("docId"), min("docId")).head()
    }
    val inv = IndexBuilder.invertDocs(spark, corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    phase("analyze+persist") { inv.count() }
    val segDir = s"$dir/segments/seg=0"
    phase("pack-only-count") {
      IndexBuilder.packBlocks(spark, IndexBuilder.postingsOf(inv), parts).count()
    }
    phase("pack+write-postings") {
      IndexBuilder.packBlocks(spark, IndexBuilder.postingsOf(inv), parts)
        .write.mode("overwrite").parquet(s"$segDir/postings")
    }
    phase("write-docstats") {
      IndexBuilder.statsOf(inv).write.mode("overwrite").parquet(s"$segDir/docstats")
    }
    phase("manifest-agg") {
      IndexBuilder.statsOf(inv).toDF()
        .agg(count("*"), sum(col("dl").cast("long")), bit_xor(xxhash64(col("contentSha256")))).head()
    }
    val segBlocks = phase("read-back-schema") { spark.read.parquet(s"$segDir/postings") }
    phase("seg-termstats") {
      IndexBuilder.termStats(segBlocks.as[BlockRow])
        .write.mode("overwrite").parquet(s"$segDir/termstats")
    }
    phase("block-count") { segBlocks.count() }
    phase("finalize-merge") {
      spark.read.parquet(s"$segDir/termstats")
        .groupBy("term").agg(sum("df").as("df"), sum("ttf").as("ttf"))
        .write.mode("overwrite").parquet(s"$dir/stats/termstats")
    }
    println(f"PROBE TOTAL               ${(System.nanoTime() - tAll) / 1e9}%7.2f s  (cores=$cores parts=$parts)")
    spark.stop()
  }
}
