package graft.tools

import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.query.QueryEngine
import org.apache.spark.sql.SparkSession

/** Query-throughput probe for the scaling bench: measures the Bench
  * QuerySet's QPS at one parallelism level with configurable cached-index
  * partition count and query shuffle partitions, so the (tasks-per-query x
  * concurrent-streams) scheduler load can be tuned empirically.
  *
  *   runMain graft.tools.QueryProbe <cores> <warmParts> <shufParts> [docs]
  */
object QueryProbe {

  private val QuerySet: Seq[(Seq[String], QueryEngine.Mode, Boolean, Boolean)] = Seq(
    (Seq("public"), QueryEngine.Or, false, false),
    (Seq("import"), QueryEngine.Or, false, false),
    (Seq("parseconfig"), QueryEngine.Or, false, false),
    (Seq("public", "static", "void"), QueryEngine.Or, false, false),
    (Seq("public", "static", "void"), QueryEngine.Or, true, false),
    (Seq("public", "static", "void"), QueryEngine.Or, false, true),
    (Seq("import", "handler7"), QueryEngine.And, false, false),
    (Seq("mergepolicy", "checkpoint"), QueryEngine.Or, true, false),
    (Seq("scoredocs", "readblock", "writeshard"), QueryEngine.Or, false, true),
    (Seq("class", "object"), QueryEngine.And, false, true),
    (Seq("uniq_42_1"), QueryEngine.Or, false, false))

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val warmParts = args(1).toInt
    val shufParts = args(2).toInt
    val docs = args.lift(3).map(_.toLong).getOrElse(100000L)
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "20").toInt

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-qprobe-$cores")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"/dev/shm/graft-qprobe-idx-$docs"
    if (!IndexStore.isCommitted(dir, 0)) {
      graft.util.Fs.rmTree(dir)
      IndexStore.build(spark, CorpusGen.corpusWithIds(spark, docs, 64), dir,
        numSegments = 1, shufflePartitions = 64)
    }
    val qSpark = spark.newSession()
    qSpark.conf.set("spark.sql.shuffle.partitions", shufParts.toString)
    val idx = IndexStore.OpenIndex(qSpark, dir).warm(numPartitions = warmParts)
    // untimed warm pass (JIT, DfCache, postings pin)
    QuerySet.foreach { case (t, m, p, w) => idx.topK(t, 10, m, prune = p, wand = w).collect(): Unit }

    val work = new java.util.concurrent.ConcurrentLinkedQueue[
      (Seq[String], QueryEngine.Mode, Boolean, Boolean)]()
    (1 to reps).foreach(_ => QuerySet.foreach(work.add))
    val nq = work.size()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(cores)
    val t0 = System.nanoTime()
    val futs = (0 until cores).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var next = work.poll()
          while (next != null) {
            val (t, m, p, w) = next
            idx.topK(t, 10, m, prune = p, wand = w).collect(): Unit
            next = work.poll()
          }
        }
      })
    }
    futs.foreach(_.get())
    pool.shutdown()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"QPROBE cores=$cores warm=$warmParts shuf=$shufParts docs=$docs qps=${nq / secs}%.2f secs=$secs%.2f")
    spark.stop()
  }
}
