package graft.functions

import graft.SparkSpec
import graft.query.BM25
import org.apache.spark.sql.functions._

/** The codegen Bm25Score expression must be bit-identical to the kernel's
  * TermScorer arithmetic (same float/double casts), in both interpreted and
  * whole-stage-codegen evaluation. */
class Bm25ScoreSpec extends SparkSpec {
  import spark.implicits._

  test("expression == TermScorer.score for random (tf, norm) under random stats") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 10) {
      val df = 1 + rnd.nextInt(5000)
      val n = df + rnd.nextInt(100000)
      val sumTtf = n.toLong * (1 + rnd.nextInt(500))
      val scorer = BM25.termScorer(1f, BM25.DefaultK1, BM25.DefaultB, df.toLong, n.toLong, sumTtf)
      val rows = Seq.fill(64)((1 + rnd.nextInt(200), rnd.nextInt(256).toByte))
      val got = rows.toDF("tf", "nb")
        .select(Bm25Score(col("tf"), col("nb"), scorer.weight, scorer.cache).as("s"))
        .as[Float].collect()
      val want = rows.map { case (tf, nb) => scorer.score(tf.toFloat, nb) }
      assert(got.toSeq === want)
    }
  }

  test("two instances codegen into one projection without name collisions") {
    val s1 = BM25.termScorer(1f, 1.2f, 0.75f, 10L, 1000L, 50000L)
    val s2 = BM25.termScorer(1f, 1.2f, 0.75f, 99L, 1000L, 50000L)
    val df = spark.range(1, 5).select(
      Bm25Score((col("id") % 7 + 1).cast("int"), (col("id") % 256).cast("byte"), s1.weight, s1.cache).as("a"),
      Bm25Score((col("id") % 5 + 1).cast("int"), (col("id") % 100).cast("byte"), s2.weight, s2.cache).as("b"))
    val rows = df.collect()
    assert(rows.length === 4)
    assert(rows.head.getFloat(0) === s1.score(2f, 1.toByte))
    assert(rows.head.getFloat(1) === s2.score(2f, 1.toByte))
  }

  test("wrong-typed arguments fail at analysis, not at runtime") {
    val s1 = BM25.termScorer(1f, 1.2f, 0.75f, 10L, 1000L, 50000L)
    val e = intercept[Exception] {
      spark.range(1).select(Bm25Score(col("id"), lit(1.toByte), s1.weight, s1.cache)).collect()
    }
    assert(e.getMessage.contains("graft_bm25_score expects"))
  }

  test("expression participates in whole-stage codegen") {
    val scorer = BM25.termScorer(1f, 1.2f, 0.75f, 10L, 1000L, 50000L)
    // spark.range (not a local relation, which the optimizer pre-evaluates)
    val df = spark.range(1, 9)
      .select(Bm25Score((col("id") % 7 + 1).cast("int"), (col("id") % 256).cast("byte"),
        scorer.weight, scorer.cache).as("s"))
    // "*(1)" marks a WholeStageCodegen stage in the simple plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val got = df.as[Float].collect().toSeq
    val want = (1L until 9L).map(i => scorer.score((i % 7 + 1).toFloat, (i % 256).toByte))
    assert(got === want)
  }
}

class GraftExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("extension registers graft_bm25_score for plain SQL") {
    import org.apache.spark.sql.SparkSession
    // getOrCreate ignores withExtensions when a session already exists
    // (other suites share one); force a NEW session on the same context
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT graft_bm25_score(3, CAST(5 AS TINYINT), 10L, 1000L, 50000L) AS s")
        .head().getFloat(0)
      val scorer = graft.query.BM25.termScorer(1f, 1.2f, 0.75f, 10L, 1000L, 50000L)
      assert(got === scorer.score(3f, 5.toByte))
      val err = intercept[Exception] {
        spark.sql("SELECT graft_bm25_score(3, CAST(5 AS TINYINT), id, 1000L, 50000L) FROM range(1)").collect()
      }
      assert(err.getMessage.contains("literal"))
      // the OSA distance is registered too
      assert(spark.sql("SELECT graft_damerau('sprak', 'spark') AS d")
        .head().getInt(0) === 1)
    } finally {
      // restore the shared session for later suites (do NOT stop the
      // shared SparkContext)
      import org.apache.spark.sql.SparkSession
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}

class TopKAggSpec extends org.scalatest.funsuite.AnyFunSuite with graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("typed top-k Aggregator equals window row_number; HitQueue tie order") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 500).map { i =>
      (s"g${i % 5}", i.toLong, math.round(rnd.nextFloat() * 10) / 10f) // deliberate score ties
    }.toDF("grp", "docId", "score")
    val agged = rows.groupBy("grp")
      .agg(TopKAgg.topHits(7)(col("docId"), col("score")))
      .select(col("grp"), explode(col("top_hits")).as("h"))
      .select(col("grp"), col("h.docId"), col("h.score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getFloat(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(desc("score"), asc("docId"))
    val want = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select("grp", "docId", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getFloat(2))).toSet
    assert(agged === want)
  }
}
