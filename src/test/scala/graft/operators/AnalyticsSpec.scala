package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Solr analytics contrib semantics (solr/contrib/analytics):
  * order statistics per PercentileFunction.java:107 (index = round(p*n-.5)),
  * OrdinalFunction.java:105-110 (1-based, negative = from the top,
  * missing when ordinal > size), MedianCalculator.java:34-42 (even size
  * averages the two middle values), RangeFacet boundary generation per
  * FacetRangeGenerator.java:154-196 (gap list, last repeats, hardEnd).
  */
class AnalyticsSpec extends SparkSpec {
  import Analytics._

  private lazy val s = spark
  import s.implicits._

  // deterministic multi-group values (no RNG: spec must be replayable)
  private lazy val vals: Seq[(String, Int)] = {
    val xs = for (i <- 1 to 23) yield ("a", (i * 7919) % 101)
    val ys = for (i <- 1 to 10) yield ("b", (i * 104729) % 53)
    xs ++ ys :+ ("c", 42)
  }
  private lazy val df = vals.toDF("g", "v")

  private def sortedGroup(g: String): Vector[Int] =
    vals.filter(_._1 == g).map(_._2).sorted.toVector

  /** reference percentile pick: collector.get((int) Math.round(p*size - .5)) */
  private def refPct(xs: Vector[Int], p: Double): Int =
    xs(math.round(p * xs.size - .5).toInt)

  private def refMedian(xs: Vector[Int]): Double = {
    val size = xs.size - 1
    val first = math.floor(.5 * size).toInt
    val second = if (first <= size && size % 2 == 1) first + 1 else first
    (xs(first) + xs(second)) / 2.0
  }

  test("percentile matches the reference round(p*n-.5) index rule per group") {
    for (p <- Seq(0.0, 0.2, 0.5, 0.95)) {
      val got = orderStats(df, Seq("g"), Seq(OrderStat("pct", col("v"), Pct(p))))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      for (g <- Seq("a", "b", "c"))
        assert(got(g) == refPct(sortedGroup(g), p), s"p=$p g=$g")
    }
  }

  test("median averages the two middle values on even sizes") {
    val got = orderStats(df, Seq("g"), Seq(OrderStat("med", col("v"), Med)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (g <- Seq("a", "b", "c"))
      assert(got(g) == refMedian(sortedGroup(g)), s"g=$g")
  }

  test("ordinal: 1-based, negative from the top, null beyond size") {
    val stats = Seq(
      OrderStat("o1", col("v"), Ord(1)),
      OrderStat("o3", col("v"), Ord(3)),
      OrderStat("oneg", col("v"), Ord(-2)),
      OrderStat("obig", col("v"), Ord(30)))
    val got = orderStats(df, Seq("g"), stats)
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b")) {
      val xs = sortedGroup(g)
      assert(got(g).getInt(1) == xs.head)
      assert(got(g).getInt(2) == xs(2))
      assert(got(g).getInt(3) == xs(xs.size - 2))
      if (xs.size < 30) assert(got(g).isNullAt(4)) // exists=false → missing
    }
    val c = got("c") // single value group
    assert(c.getInt(1) == 42 && c.isNullAt(2) && c.isNullAt(3))
  }

  test("stats over the same expression share one rank pass") {
    val stats = Seq(
      OrderStat("p50", col("v"), Pct(0.5)),
      OrderStat("med", col("v"), Med),
      OrderStat("o2", col("v"), Ord(2)))
    val plan = orderStats(df, Seq("g"), stats).queryExecution.optimizedPlan
    // one shared pass => no join in the optimized plan
    assert(!plan.toString.toLowerCase.contains("join"))
  }

  test("request joins simple reductions with order stats on the grouping") {
    val out = request(df, Seq("g"),
      simple = Seq("n" -> countValues(col("v")), "mean" -> meanF(col("v")),
                   "uniq" -> uniqueCount(col("v")), "miss" -> missingCount(col("v"))),
      order = Seq(OrderStat("med", col("v"), Med)))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = sortedGroup("a")
    assert(out("a").getLong(1) == a.size)
    assert(math.abs(out("a").getDouble(2) - a.sum.toDouble / a.size) < 1e-12)
    assert(out("a").getLong(3) == a.distinct.size)
    assert(out("a").getLong(4) == 0)
    assert(out("a").getDouble(5) == refMedian(a))
  }

  test("mapping functions follow the reference missing-value contracts") {
    val m = Seq((Some(1), Some(2)), (None, Some(7)), (Some(3), None))
      .toDF("a", "b")
    val r = m.select(
      fillMissing(col("a"), col("b")).as("fm"),
      existsF(col("a")).as("ex"),
      removeF(col("a"), lit(3)).as("rm"),
      filterF(col("a"), col("a") > 1).as("fl"),
      ifF(col("a") > 1, lit("t"), lit("f")).as("iff"),
      replaceF(col("a"), lit(1), lit(9)).as("rp"),
      concatF(col("a").cast("string"), col("b").cast("string")).as("cc"),
      concatSep("-", col("a").cast("string"), col("b").cast("string")).as("cs"))
      .collect()
    assert(r(0) == Row(1, true, 1, null, "f", 9, "12", "1-2"))
    // missing condition (a is null) → missing if() result, not the else arm
    assert(r(1) == Row(7, false, null, null, null, null, null, "7"))
    // concat: any missing operand → missing; concat_sep skips missing;
    // remove(a=3, v=3) → missing
    assert(r(2) == Row(3, true, null, 3, "t", 3, null, "3"))
  }

  test("rangeFacet: gap list consumed in order, last gap repeats, hardEnd clips") {
    val data = (0 to 20).map(_.toDouble).toDF("x")
    // start=0 end=14 gaps=[2,5,3]: buckets [0,2) [2,7) [7,10) [10,13) then
    // last gap carries past end → soft end extends to 16: [13,16)
    val soft = rangeFacet(data, col("x"), 0, 14, Seq(2, 5, 3))
      .orderBy("bucket").collect()
    assert(soft.map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq ==
      Seq((0.0, 2.0, 2L), (2.0, 7.0, 5L), (7.0, 10.0, 3L), (10.0, 13.0, 3L), (13.0, 16.0, 3L)))
    // hardEnd: final bucket clipped to [13,14)
    val hard = rangeFacet(data, col("x"), 0, 14, Seq(2, 5, 3), hardEnd = true)
      .orderBy("bucket").collect()
    assert(hard.last.getDouble(1) == 13.0 && hard.last.getDouble(2) == 14.0 &&
      hard.last.getLong(3) == 1L)
  }

  test("rangeFacet: before/after/between rows and additive metrics") {
    val data = (-3 to 8).map(_.toDouble).toDF("x")
    val out = rangeFacet(data, col("x"), 0, 4, Seq(2),
      others = Set("before", "after", "between"),
      metrics = Seq("sx" -> sum(col("x"))))
      .orderBy("bucket").collect()
      .map(r => r.getInt(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(out(-1) == ((3L, -6.0)))   // -3,-2,-1
    assert(out(-2) == ((5L, 30.0)))   // 4..8
    assert(out(0) == ((2L, 1.0)))     // 0,1
    assert(out(1) == ((2L, 5.0)))     // 2,3
    assert(out(-3) == ((4L, 6.0)))    // between = sum of buckets
  }

  test("valueFacet sorts buckets by metric desc with value tie-break, offset/limit") {
    val d = Seq("x", "x", "x", "y", "y", "z", "w", "w").toDF("f")
    val top = valueFacet(d, "f", Seq("n" -> count(lit(1))), "n", limit = 2)
      .collect().map(_.getString(0)).toSeq
    assert(top == Seq("x", "w")) // w ties y at 2; value ASC tie-break
    val page2 = valueFacet(d, "f", Seq("n" -> count(lit(1))), "n", limit = 2, offset = 2)
      .collect().map(_.getString(0)).toSeq
    assert(page2 == Seq("y", "z"))
  }

  test("pivotFacet2 keeps top parents then top children within each parent") {
    val d = Seq(("p1", "c1"), ("p1", "c1"), ("p1", "c2"), ("p1", "c3"),
                ("p2", "c1"), ("p2", "c2"), ("p3", "c9")).toDF("f1", "f2")
    val out = pivotFacet2(d, "f1", "f2", limit1 = 2, limit2 = 2)
      .orderBy("level", "f1", "f2").collect()
    val l1 = out.filter(_.getInt(2) == 1).map(r => (r.getString(0), r.getLong(3))).toSeq
    assert(l1 == Seq(("p1", 4L), ("p2", 2L)))
    val l2 = out.filter(_.getInt(2) == 2)
      .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSeq
    assert(l2 == Seq(("p1", "c1", 2L), ("p1", "c2", 1L), ("p2", "c1", 1L), ("p2", "c2", 1L)))
  }

  test("queryFacet evaluates all named domains in one pass") {
    val d = (1 to 10).toDF("v")
    val out = queryFacet(d,
      queries = Seq("low" -> (col("v") <= 3), "high" -> (col("v") > 7)),
      metrics = Seq(
        "n" -> ((q: org.apache.spark.sql.Column) => count(when(q, 1))),
        "s" -> ((q: org.apache.spark.sql.Column) => sum(when(q, col("v"))))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("low") == ((3L, 6L)))
    assert(out("high") == ((3L, 27L)))
  }

  // RelatednessAgg.java:473 computeRelatedness, pinned against hand-computed
  // values of the published formula (z-score through the 5-sigmoid blend,
  // Math.round-to-5-digits). Dataset: bucket a = 30 rows / 12 fg, bucket
  // b = 70 rows / 8 fg → fgSize 20, bgSize 100.
  private lazy val relRows =
    (1 to 30).map(i => ("a", i <= 12)) ++ (1 to 70).map(i => ("b", i <= 8))

  test("relatedness matches the reference formula on pinned buckets") {
    val df = relRows.toDF("bucket", "fg")
    val out = relatedness(df, "bucket", col("fg")).orderBy("bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out(0) == (("a", 12L, 30L, 0.03103, 0.12, 0.3)))
    assert(out(1) == (("b", 8L, 70L, -0.03103, 0.08, 0.7)))
  }

  test("relatedness min_popularity gates buckets to -Infinity") {
    val df = relRows.toDF("bucket", "fg")
    val out = relatedness(df, "bucket", col("fg"), minPop = 0.1)
      .orderBy("bucket").collect()
    assert(out(0).getDouble(3) == 0.03103) // a: fg_pop 0.12 >= 0.1
    assert(out(1).getDouble(3).isNegInfinity) // b: fg_pop 0.08 < 0.1
  }

  test("relatedness z=0 and empty-foreground degenerate cases score 0") {
    // fg == bucket scaled to the background: fg_count = fgSize * bg_prob
    // exactly → z = 0 → all five sigmoids cancel pairwise + center 0
    val uniform = (1 to 10).map(i => ("a", i <= 5)) ++ (1 to 10).map(i => ("b", i <= 5))
    val u = relatedness(uniform.toDF("bucket", "fg"), "bucket", col("fg"))
      .collect().map(_.getDouble(3)).toSeq
    assert(u == Seq(0.0, 0.0))
    // empty foreground: num = 0, denom guard 1e-10 (never divides by zero)
    val e = relatedness(uniform.toDF("bucket", "fg"), "bucket", lit(false))
      .collect().map(_.getDouble(3)).toSeq
    assert(e == Seq(0.0, 0.0))
  }
}
