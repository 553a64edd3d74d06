package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The Solr math-evaluator family (solrj io/eval) re-expressed Spark-first
 * (MathEval.scala). Every statistical path is cross-checked against the
 * SAME commons-math3 entry points the reference evaluators delegate to,
 * run locally on the collected data — so engine == reference arithmetic.
 */
class MathEvalSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  // ---- per-series kernels -------------------------------------------------

  test("fft matches the textbook DFT on a known vector and ifft round-trips") {
    val xs = Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0)
    val (re, im) = MathEval.fft(xs)
    // bin 0 = sum; bin 4 (Nyquist) = alternating sum
    assert(approx(re(0), 36.0) && approx(im(0), 0.0))
    assert(approx(re(4), -4.0) && approx(im(4), 0.0))
    // closed-form bin 1 of ramp: re = -4, im = 4/tan(pi/8)... cross-check
    // against a direct O(n^2) DFT instead of hand constants
    for (k <- xs.indices) {
      val dre = xs.indices.map(n => xs(n) * math.cos(-2 * math.Pi * k * n / 8)).sum
      val dim = xs.indices.map(n => xs(n) * math.sin(-2 * math.Pi * k * n / 8)).sum
      assert(approx(re(k), dre, 1e-9), s"re bin $k")
      assert(approx(im(k), dim, 1e-9), s"im bin $k")
    }
    val back = MathEval.ifft(re, im)
    xs.indices.foreach(i => assert(approx(back(i), xs(i))))
  }

  test("fft of a pure sinusoid concentrates at the planted bin") {
    val n = 64
    val f = 5
    val xs = MathEval.oscillate(3.0, 2 * math.Pi * f / n, 0.0, n)
    val (re, im) = MathEval.fft(xs)
    val mag = xs.indices.map(i => math.sqrt(re(i) * re(i) + im(i) * im(i)))
    assert(approx(mag(f), 3.0 * n / 2, 1e-9))
    assert(approx(mag(n - f), 3.0 * n / 2, 1e-9))
    xs.indices.filterNot(i => i == f || i == n - f)
      .foreach(i => assert(mag(i) < 1e-9, s"bin $i leaked ${mag(i)}"))
  }

  test("convolve delegates to MathArrays.convolve (reference arithmetic)") {
    val a = Array(1.0, 2.0, 3.0)
    val b = Array(0.5, 1.0)
    val got = MathEval.convolve(a, b)
    assert(got.toSeq === org.apache.commons.math3.util.MathArrays.convolve(a, b).toSeq)
    assert(got.toSeq === Seq(0.5, 2.0, 3.5, 3.0))
  }

  test("movingAvg/movingMedian/expMovingAvg match the reference windowing") {
    val xs = Array(1.0, 2.0, 3.0, 4.0, 10.0, 6.0)
    // MovingAverageEvaluator: emit once the window fills (length n-w+1)
    assert(MathEval.movingAvg(xs, 3).toSeq === Seq(2.0, 3.0, 17.0 / 3, 20.0 / 3))
    // DescriptiveStatistics.getPercentile(50) on each full window
    val med = MathEval.movingMedian(xs, 3)
    assert(med.toSeq === Seq(2.0, 3.0, 4.0, 6.0))
    // ExponentialMovingAverageEvaluator: seed = SMA(first w), alpha=2/(w+1)
    val ema = MathEval.expMovingAvg(xs, 3)
    assert(approx(ema(0), 2.0))
    assert(approx(ema(1), (4.0 - 2.0) * 0.5 + 2.0))
    assert(ema.length === xs.length - 3 + 1)
    // timeDiff: lagged difference
    assert(MathEval.timeDiff(xs, 2).toSeq === Seq(2.0, 2.0, 7.0, 2.0))
  }

  test("polyFit recovers exact polynomial coefficients; derivative/eval agree") {
    val x = Array.tabulate(16)(_.toDouble)
    val y = x.map(v => 2.0 + 3.0 * v + 0.5 * v * v)
    val c = MathEval.polyFit(x, y, 2)
    assert(approx(c(0), 2.0, 1e-8) && approx(c(1), 3.0, 1e-8) && approx(c(2), 0.5, 1e-8))
    val d = MathEval.polyDerivative(c)
    assert(approx(d(0), 3.0, 1e-7) && approx(d(1), 1.0, 1e-7))
    assert(approx(MathEval.polyEval(c, 10.0), 2.0 + 30.0 + 50.0, 1e-7))
  }

  test("spline derivative and Romberg integral are exact on linear data") {
    val x = Array.tabulate(10)(_.toDouble)
    val y = x.map(v => 4.0 + 2.5 * v)
    MathEval.splineDerivative(x, y).foreach(d => assert(approx(d, 2.5, 1e-9)))
    assert(approx(MathEval.integrateSpline(x, y, 0.0, 9.0),
      4.0 * 9 + 2.5 * 81 / 2, 1e-8))
  }

  test("lerp/akima interpolate through the knots; loess smooths") {
    val x = Array.tabulate(8)(_.toDouble)
    val y = x.map(v => v * v)
    assert(approx(MathEval.lerp(x, y, Array(2.5))(0), 6.5))
    assert(approx(MathEval.akima(x, y, Array(3.0))(0), 9.0, 1e-9))
    val sm = MathEval.loess(x, y, bandwidth = 0.6)
    assert(sm.length === 8 && sm.zip(y).forall { case (a, b) => math.abs(a - b) < 2.0 })
  }

  // ---- distributions ------------------------------------------------------

  test("distribution columns match commons-math3 (the reference's engine)") {
    val df = Seq(0, 1, 3, 7, 12).toDF("k")
      .withColumn("x", col("k").cast("double") * 7.5)
    val rows = df.select(
      MathEval.poissonPmf(col("k"), 5.0).as("pp"),
      MathEval.poissonCdf(col("k"), 5.0).as("pc"),
      MathEval.binomialPmf(col("k"), 15, 0.3).as("bp"),
      MathEval.uniformCdf(col("x"), 0, 100).as("uc"),
      MathEval.exponentialCdf(col("x"), 50.0).as("ec"),
      MathEval.weibullCdf(col("x"), 1.5, 50.0).as("wc"),
      MathEval.triangularCdf(col("x"), 0, 50, 100).as("tc"),
      MathEval.zipfPmf(col("k") + 1, 15, 1.1).as("zp"),
      MathEval.normalCdfUdf(col("x"), lit(50.0), lit(25.0)).as("nc"),
      MathEval.logNormalCdfUdf(col("x") + 1.0, lit(3.0), lit(0.5)).as("lc"),
      MathEval.gammaCdfUdf(col("x") + 1.0, lit(2.0), lit(10.0)).as("gc"),
      MathEval.geometricPmf(col("k"), 0.25).as("gp"),
      MathEval.geometricCdf(col("k"), 0.25).as("gcd"),
      MathEval.uniformIntegerCdf(col("k"), 1, 10).as("uic"),
      col("k"), col("x")).collect()
    import org.apache.commons.math3.distribution._
    val pois = new PoissonDistribution(5.0)
    val binom = new BinomialDistribution(15, 0.3)
    val unif = new UniformRealDistribution(0, 100)
    val expo = new ExponentialDistribution(50.0)
    val weib = new WeibullDistribution(1.5, 50.0)
    val tri = new TriangularDistribution(0, 50, 100)
    val zipf = new ZipfDistribution(15, 1.1)
    val norm = new NormalDistribution(50.0, 25.0)
    val logn = new LogNormalDistribution(3.0, 0.5)
    val gam = new GammaDistribution(2.0, 10.0)
    val geom = new GeometricDistribution(0.25)
    val uint = new UniformIntegerDistribution(1, 10)
    rows.foreach { r =>
      val k = r.getInt(14); val x = r.getDouble(15)
      assert(approx(r.getDouble(11), geom.probability(k), 1e-12))
      assert(approx(r.getDouble(12), geom.cumulativeProbability(k), 1e-12))
      assert(approx(r.getDouble(13), uint.cumulativeProbability(k), 1e-12))
      assert(approx(r.getDouble(0), pois.probability(k), 1e-12), s"poisson pmf k=$k")
      assert(approx(r.getDouble(1), pois.cumulativeProbability(k), 1e-12))
      assert(approx(r.getDouble(2), binom.probability(k), 1e-12))
      assert(approx(r.getDouble(3), unif.cumulativeProbability(x), 1e-12))
      assert(approx(r.getDouble(4), expo.cumulativeProbability(x), 1e-12))
      assert(approx(r.getDouble(5), weib.cumulativeProbability(x), 1e-12))
      assert(approx(r.getDouble(6), tri.cumulativeProbability(x), 1e-12))
      assert(approx(r.getDouble(7), zipf.probability(k + 1), 1e-12))
      assert(approx(r.getDouble(8), norm.cumulativeProbability(x), 1e-12))
      assert(approx(r.getDouble(9), logn.cumulativeProbability(x + 1), 1e-12))
      assert(approx(r.getDouble(10), gam.cumulativeProbability(x + 1), 1e-12))
    }
    // golden anchor: Φ(1.96) standard normal
    val phi = Seq(1.96).toDF("x")
      .select(MathEval.normalCdfUdf(col("x"), lit(0.0), lit(1.0))).head().getDouble(0)
    assert(approx(phi, 0.9750021048517795, 1e-12))
  }

  test("empiricalCdf is the distributed ecdf (ties -> max rank)") {
    val df = Seq(1.0, 2.0, 2.0, 5.0).toDF("v")
    val got = MathEval.empiricalCdf(df, "v")
      .select("v", "ecdf").as[(Double, Double)].collect().toSet
    assert(got === Set((1.0, 0.25), (2.0, 0.75), (5.0, 1.0)))
  }

  // ---- hypothesis tests: distributed stats == commons-math3 on collected --

  private val sampleA = (1 to 40).map(i => 10.0 + (i * 7 % 13) - (i % 5) * 0.5)
  private val sampleB = (1 to 50).map(i => 12.0 + (i * 5 % 11) - (i % 7) * 0.25)

  private def twoGroupDf = (sampleA.map(("a", _)) ++ sampleB.map(("b", _)))
    .toDF("g", "v")

  test("tTestWelch matches commons-math3 TTest (statistic and p-value)") {
    val r = MathEval.tTestWelch(twoGroupDf, "v", "g", "a", "b").head()
    val tt = new org.apache.commons.math3.stat.inference.TTest()
    assert(approx(r.getDouble(0), tt.t(sampleA.toArray, sampleB.toArray), 1e-10))
    assert(approx(r.getDouble(2), tt.tTest(sampleA.toArray, sampleB.toArray), 1e-10))
  }

  test("pairedTTest matches commons-math3 pairedTTest") {
    val a = sampleA.take(30).toArray
    val b = sampleB.take(30).toArray
    val df = a.zip(b).toSeq.toDF("x", "y")
    val r = MathEval.pairedTTest(df, "x", "y").head()
    val tt = new org.apache.commons.math3.stat.inference.TTest()
    assert(approx(r.getDouble(0), tt.pairedT(a, b), 1e-10))
    assert(approx(r.getDouble(2), tt.pairedTTest(a, b), 1e-10))
  }

  test("anova matches commons-math3 OneWayAnova") {
    val c = (1 to 35).map(i => 9.0 + (i * 3 % 17) * 0.8)
    val df = (sampleA.map(("a", _)) ++ sampleB.map(("b", _)) ++ c.map(("c", _))).toDF("g", "v")
    val r = MathEval.anova(df, "v", "g").head()
    val ow = new org.apache.commons.math3.stat.inference.OneWayAnova()
    val cats = java.util.Arrays.asList(sampleA.toArray, sampleB.toArray, c.toArray)
    assert(approx(r.getDouble(0), ow.anovaFValue(cats), 1e-10))
    assert(approx(r.getDouble(1), ow.anovaPValue(cats), 1e-10))
  }

  test("ksUniform matches commons-math3 KolmogorovSmirnovTest") {
    val vals = (1 to 60).map(i => (i * 37 % 101).toDouble)
    val df = vals.toDF("v")
    val r = MathEval.ksUniform(df, "v", 0, 101).head()
    val ks = new org.apache.commons.math3.stat.inference.KolmogorovSmirnovTest()
    val dist = new org.apache.commons.math3.distribution.UniformRealDistribution(0, 101)
    assert(approx(r.getDouble(0),
      ks.kolmogorovSmirnovStatistic(dist, vals.toArray), 1e-12))
    assert(approx(r.getDouble(1),
      ks.kolmogorovSmirnovTest(dist, vals.toArray), 1e-9))
  }

  test("mannWhitneyU matches commons-math3 MannWhitneyUTest") {
    val r = MathEval.mannWhitneyU(twoGroupDf, "v", "g", "a", "b").head()
    val mw = new org.apache.commons.math3.stat.inference.MannWhitneyUTest()
    // commons-math3 reports max(U1, U2); we report both
    val uMax = mw.mannWhitneyU(sampleA.toArray, sampleB.toArray)
    assert(math.max(r.getDouble(0), r.getDouble(1)) === uMax)
    assert(approx(r.getDouble(2),
      mw.mannWhitneyUTest(sampleA.toArray, sampleB.toArray), 1e-9))
  }

  test("chiSquareDataSets matches chiSquareTestDataSetsComparison") {
    val o1 = Seq(("x", 30L), ("y", 12L), ("z", 25L))
    val o2 = Seq(("x", 45L), ("y", 30L), ("z", 15L))
    val r = MathEval.chiSquareDataSets(o1.toDF("cat", "n"), o2.toDF("cat", "n"),
      "cat", "n").head()
    val cs = new org.apache.commons.math3.stat.inference.ChiSquareTest()
    val a1 = o1.map(_._2).toArray
    val a2 = o2.map(_._2).toArray
    assert(approx(r.getDouble(0), cs.chiSquareDataSetsComparison(a1, a2), 1e-10))
    assert(approx(r.getDouble(1), cs.chiSquareTestDataSetsComparison(a1, a2), 1e-10))
  }

  test("movingMad matches the reference's DescriptiveStatistics slider") {
    val xs = Array(4.0, 1.0, 7.0, 2.0, 9.0, 3.0, 8.0)
    val got = MathEval.movingMad(xs, 3)
    val exp = (0 to 4).map { i =>
      val st = new org.apache.commons.math3.stat.descriptive.DescriptiveStatistics(3)
      xs.slice(i, i + 3).foreach(st.addValue)
      val m = st.getMean
      st.getValues.map(x => math.abs(x - m)).sum / 3
    }
    assert(got.length == 5 && got.zip(exp).forall { case (a, b) => approx(a, b) })
  }

  test("findDelay recovers a planted shift (reference xcorr convention)") {
    val base = Array(0.0, 0.0, 1.0, 5.0, 2.0, 0.0, 0.0, 0.0)
    val shifted = Array(0.0, 0.0, 0.0, 0.0, 1.0, 5.0, 2.0, 0.0) // delayed by 2
    assert(MathEval.findDelay(shifted, base) == 2.0)
    assert(MathEval.findDelay(base, base) == 0.0)
  }

  test("earthMovers matches commons-math3 EarthMoversDistance") {
    val a = Seq(0.1, 0.4, 0.2, 0.3)
    val b = Seq(0.3, 0.1, 0.4, 0.2)
    val got = Seq((a, b)).toDF("a", "b")
      .select(MathEval.earthMovers(col("a"), col("b"))).head().getDouble(0)
    val exp = new org.apache.commons.math3.ml.distance.EarthMoversDistance()
      .compute(a.toArray, b.toArray)
    assert(approx(got, exp))
  }

  test("frequencyTable/mode/histogram/outliers match hand-checked forms") {
    val vals = Seq(1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 9.0, 100.0).toDF("v")
    val ft = MathEval.frequencyTable(vals, "v")
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ft(3.0) == ((3L, 0.375)) && ft(1.0) == ((1L, 0.125)))
    assert(MathEval.mode(vals, "v").head().getDouble(0) == 3.0)
    // tie -> smallest value
    val tied = Seq(5.0, 5.0, 2.0, 2.0, 7.0).toDF("v")
    assert(MathEval.mode(tied, "v").head().getDouble(0) == 2.0)
    val h = MathEval.histogram(vals, "v", 4) // width (100-1)/4: max clamps to bin 3
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h(0) == 7L && h(3) == 1L && h.values.sum == 8L)
    val out = MathEval.outliers(vals, "v", MathEval.uniformCdf(_, 0.0, 10.0), 0.15, 0.85)
      .collect().map(_.getDouble(0)).sorted
    assert(out.toSeq == Seq(1.0, 9.0, 100.0))
  }

  test("convexHull/enclosingDisk match the driver-side commons-math3 forms") {
    import org.apache.commons.math3.geometry.euclidean.twod.Vector2D
    import org.apache.commons.math3.geometry.euclidean.twod.hull.MonotoneChain
    import scala.jdk.CollectionConverters._
    val pts = for (i <- 0 until 15; j <- 0 until 7) yield (i.toDouble, j.toDouble)
    val df = pts.toDF("x", "y").repartition(5)
    val hull = MathEval.convexHull(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val ref = new MonotoneChain().generate(
      pts.map { case (x, y) => new Vector2D(x, y) }.asJava)
      .getVertices.map(v => (v.getX, v.getY)).toSet
    assert(hull == ref)
    assert(hull == Set((0.0, 0.0), (14.0, 0.0), (14.0, 6.0), (0.0, 6.0)))
    val disk = MathEval.enclosingDisk(df, "x", "y").head()
    assert(approx(disk.getDouble(0), 7.0) && approx(disk.getDouble(1), 3.0))
    assert(approx(disk.getDouble(2), math.sqrt(49.0 + 9.0)))
  }

  test("gTestDataSets matches commons-math3 gDataSetsComparison") {
    val o1 = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 5L))
    val o2 = Seq(("a", 15L), ("b", 12L), ("c", 28L), ("d", 9L))
    val r = MathEval.gTestDataSets(o1.toDF("cat", "n"), o2.toDF("cat", "n"),
      "cat", "n").head()
    val gt = new org.apache.commons.math3.stat.inference.GTest()
    val a1 = o1.map(_._2).toArray
    val a2 = o2.map(_._2).toArray
    assert(approx(r.getDouble(0), gt.gDataSetsComparison(a1, a2), 1e-10))
    assert(approx(r.getDouble(1), gt.gTestDataSetsComparison(a1, a2), 1e-10))
  }

  test("dbscan matches commons-math3 DBSCANClusterer memberships (+ noise)") {
    import org.apache.commons.math3.ml.clustering.{DBSCANClusterer, DoublePoint}
    import scala.jdk.CollectionConverters._
    // two 5-point chains (spacing 0.3 < eps) + one noise point; with
    // minPts=2 the chain endpoints are border points, interiors are core
    val pts: Seq[(Long, Seq[Double])] =
      (0 to 4).map(i => i.toLong -> Seq(i * 0.3, 0.0)) ++
      (0 to 4).map(i => (10 + i).toLong -> Seq(10 + i * 0.3, 0.0)) :+
      (99L -> Seq(20.0, 0.0))
    val got = MathEval.dbscan(pts.toDF("id", "vec"), "id", "vec", 0.35, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = new DBSCANClusterer[DoublePoint](0.35, 2)
      .cluster(pts.map(p => new DoublePoint(p._2.toArray)).asJava).asScala
    val byCoord = pts.map(p => p._2.head -> p._1).toMap
    val refPartition = ref.map(_.getPoints.asScala.map(dp => byCoord(dp.getPoint()(0))).toSet).toSet
    val gotPartition = got.groupBy(_._2).values.map(_.keySet).toSet
    assert(gotPartition == refPartition)
    assert(!got.contains(99L), "noise must be absent")
    // cluster label is the min CORE id (endpoint 0 is border, so min core = 1)
    assert(got(0L) == 1L && got(10L) == 11L)
  }

  // ---- matrices / regressions / kmeans ------------------------------------

  test("COO matMul/transpose/sums match a dense local multiply") {
    val a = Seq((0L, 0L, 1.0), (0L, 1L, 2.0), (1L, 0L, 3.0), (1L, 2L, 4.0))
    val b = Seq((0L, 0L, 5.0), (1L, 0L, 6.0), (2L, 1L, 7.0))
    val c = MathEval.matMul(a.toDF("i", "j", "v"), b.toDF("i", "j", "v"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // dense: A = [[1,2,0],[3,0,4]], B = [[5,0],[6,0],[0,7]] -> C = [[17,0],[15,28]]
    assert(c === Map((0L, 0L) -> 17.0, (1L, 0L) -> 15.0, (1L, 1L) -> 28.0))
    val t = MathEval.transpose(a.toDF("i", "j", "v"))
      .as[(Long, Long, Double)].collect().toSet
    assert(t === Set((0L, 0L, 1.0), (1L, 0L, 2.0), (0L, 1L, 3.0), (2L, 1L, 4.0)))
    assert(MathEval.grandSum(a.toDF("i", "j", "v")).head().getDouble(0) === 10.0)
    assert(MathEval.sumRows(a.toDF("i", "j", "v")).as[(Long, Double)].collect().toMap
      === Map(0L -> 3.0, 1L -> 7.0))
  }

  test("corrMatrix/covMatrix match commons-math3 PearsonsCorrelation/Covariance") {
    val data = (1 to 50).map(i =>
      (i.toDouble, (i * i % 17).toDouble, (i * 7 % 23).toDouble))
    val df = data.toDF("a", "b", "c")
    val corr = MathEval.corrMatrix(df, Seq("a", "b", "c"))
      .as[(String, String, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val arr = data.map(t => Array(t._1, t._2, t._3)).toArray
    val pc = new org.apache.commons.math3.stat.correlation.PearsonsCorrelation(arr)
    assert(approx(corr(("a", "b")), pc.getCorrelationMatrix.getEntry(0, 1), 1e-10))
    assert(approx(corr(("b", "c")), pc.getCorrelationMatrix.getEntry(1, 2), 1e-10))
    val cov = MathEval.covMatrix(df, Seq("a", "b", "c"))
      .as[(String, String, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val cm = new org.apache.commons.math3.stat.correlation.Covariance(arr)
    assert(approx(cov(("a", "c")), cm.getCovarianceMatrix.getEntry(0, 2), 1e-10))
  }

  test("olsRegress matches OLSMultipleLinearRegression; ridge shrinks") {
    val data = (1 to 80).map { i =>
      val x1 = (i % 9).toDouble
      val x2 = (i * 3 % 7).toDouble
      (4.0 + 2.0 * x1 - 1.5 * x2 + 0.01 * (i % 5), x1, x2)
    }
    val df = data.toDF("y", "x1", "x2")
    val beta = MathEval.olsRegress(df, "y", Seq("x1", "x2"))
    val ols = new org.apache.commons.math3.stat.regression.OLSMultipleLinearRegression()
    ols.newSampleData(data.map(_._1).toArray,
      data.map(t => Array(t._2, t._3)).toArray)
    val ref = ols.estimateRegressionParameters()
    beta.indices.foreach(i => assert(approx(beta(i), ref(i), 1e-8), s"beta $i"))
    // ridge: coefficients move toward zero, intercept unpenalized
    val ridge = MathEval.olsRegress(df, "y", Seq("x1", "x2"), ridgeLambda = 100.0)
    assert(math.abs(ridge(1)) < math.abs(beta(1)))
    assert(math.abs(ridge(2)) < math.abs(beta(2)))
  }

  test("knnRegress predicts the k-nearest mean with deterministic ties") {
    val train = (1 to 100).map(i => (i.toLong, (i % 10).toDouble, i.toDouble * 2))
      .toDF("id", "x", "y")
    val test = Seq(3.0).toDF("x")
    val got = MathEval.knnRegress(train, test, "x", "y", k = 5, tieCols = Seq("id"))
      .head().getDouble(1)
    // x==3 at i = 3,13,23,...: nearest 5 by (d=0, id asc) = ids 3,13,23,33,43
    assert(got === Seq(3, 13, 23, 33, 43).map(_ * 2.0).sum / 5)
  }

  test("kmeans recovers planted well-separated clusters exactly") {
    val pts = (0 until 90).map { i =>
      val g = i % 3
      (i.toLong, Seq(g * 100.0 + (i % 7) * 0.01, (i % 5) * 0.01))
    }.toDF("id", "vec")
    val (assign, cents) = MathEval.kmeans(pts, "id", "vec", k = 3, iters = 4)
    val byCluster = assign.as[(Long, Int)].collect().groupBy(_._2)
      .map { case (c, xs) => c -> xs.map(_._1 % 3).toSet }
    // every cluster is exactly one planted group
    assert(byCluster.values.forall(_.size == 1) && byCluster.size == 3)
    // centroid dim0 = planted group mean
    val dim0 = cents.map(_(0)).sorted
    val expected = (0 until 3).map(g =>
      (0 until 90).filter(_ % 3 == g).map(i => g * 100.0 + (i % 7) * 0.01)
        .sum / 30).sorted
    dim0.zip(expected).foreach { case (a, b) => assert(approx(a, b, 1e-9)) }
  }

  test("gaussFit/harmonicFit recover planted curves (commons-math3 fitters)") {
    val x = (0 until 32).map(_.toDouble).toArray
    val gy = x.map(v => 4.0 * math.exp(-math.pow(v - 16, 2) / 50.0))
    val (gc, gfit) = MathEval.gaussFit(x, gy)
    assert(approx(gc(0), 4.0, 1e-6) && approx(gc(1), 16.0, 1e-6))
    assert(gfit.zip(gy).forall { case (a, b) => approx(a, b, 1e-6) })
    val hy = x.map(v => 2.5 * math.sin(0.7 * v + 0.3))
    val (hc, hfit) = MathEval.harmonicFit(x, hy)
    assert(approx(math.abs(hc(0)), 2.5, 1e-6))
    assert(hfit.zip(hy).forall { case (a, b) => approx(a, b, 1e-6) })
  }

  test("fuzzyKmeans converges to the planted means; hard labels = planted") {
    val pts = (0L until 60L).map { i =>
      val g = (i % 3).toInt
      (i, Seq(g * 100.0 + (i % 7) * 0.1, g * 100.0 + (i % 5) * 0.1))
    }
    val (assign, cents) = MathEval.fuzzyKmeans(pts.toDF("id", "vec"), "id", "vec",
      k = 3, m = 2.0, iters = 8)
    val got = assign.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
    // same planted group -> same cluster; memberships ~1 on separated data
    val byGroup = got.groupBy(_._1 % 3).view.mapValues(_.map(_._2._1).toSet).toMap
    assert(byGroup.values.forall(_.size == 1) && byGroup.values.flatten.toSet.size == 3)
    assert(got.forall(_._2._2 > 0.99))
    // centroids sit at the (fuzzy-weighted ~= plain) group means
    val means = pts.groupBy(_._1 % 3).values.map { g =>
      val vs = g.map(_._2)
      Seq(vs.map(_.head).sum / vs.size, vs.map(_(1)).sum / vs.size)
    }.toSet
    assert(cents.forall(c => means.exists(m =>
      approx(c(0), m.head, 1e-3) && approx(c(1), m(1), 1e-3))))
  }

  test("multiKmeans picks the lowest-WCSS restart") {
    val pts = (0L until 60L).map { i =>
      val g = (i % 3).toInt
      (i, Seq(g * 100.0 + (i % 7) * 0.1, g * 100.0))
    }
    val (_, _, wcssMulti) = MathEval.multiKmeans(pts.toDF("id", "vec"), "id", "vec",
      k = 3, iters = 5, restarts = 3)
    val (_, cents1) = MathEval.kmeans(pts.toDF("id", "vec"), "id", "vec", 3, 5)
    val wcss1 = pts.map { case (_, v) =>
      cents1.map(c => math.pow(v.head - c(0), 2) + math.pow(v(1) - c(1), 2)).min
    }.sum
    assert(wcssMulti <= wcss1 + 1e-9)
  }

  test("distance/norm/scale columns match commons-math3 distance classes") {
    val df = Seq((Seq(1.0, -2.0, 3.0), Seq(0.5, 1.0, -1.0))).toDF("a", "b")
    val r = df.select(
      MathEval.l1Norm(col("a")), MathEval.lInfNorm(col("a")),
      MathEval.manhattan(col("a"), col("b")),
      MathEval.euclidean(col("a"), col("b")),
      MathEval.chebyshev(col("a"), col("b")),
      MathEval.canberra(col("a"), col("b")),
      MathEval.minMaxScale(col("a")),
      MathEval.normalizeSum(col("b"))).head()
    val a = Array(1.0, -2.0, 3.0)
    val b = Array(0.5, 1.0, -1.0)
    assert(r.getDouble(0) === 6.0 && r.getDouble(1) === 3.0)
    assert(approx(r.getDouble(2),
      new org.apache.commons.math3.ml.distance.ManhattanDistance().compute(a, b)))
    assert(approx(r.getDouble(3),
      new org.apache.commons.math3.ml.distance.EuclideanDistance().compute(a, b)))
    assert(approx(r.getDouble(4),
      new org.apache.commons.math3.ml.distance.ChebyshevDistance().compute(a, b)))
    assert(approx(r.getDouble(5),
      new org.apache.commons.math3.ml.distance.CanberraDistance().compute(a, b)))
    assert(r.getSeq[Double](6) === Seq(0.6, 0.0, 1.0))
    assert(r.getSeq[Double](7) === Seq(1.0, 2.0, -2.0))
  }

  test("plan audit: dbscan joins are keyed (no cartesian product) and ecdf has no global window") {
    val pts = (0L until 40L).map(i => (i, Seq((i % 4) * 10.0, (i % 4) * 10.0)))
    val plan = MathEval.dbscan(pts.toDF("id", "vec"), "id", "vec", 0.5, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    val ecdfPlan = Seq(1.0, 2.0, 3.0).toDF("v")
    val p2 = MathEval.empiricalCdf(ecdfPlan, "v").queryExecution.executedPlan.toString
    // a global (unpartitioned) Window would serialize the table through
    // one task; the cumCounts prefix-sum form must not contain one
    assert(!p2.contains("Window"), p2.take(1500))
  }

  test("series assembly orders by the ord column deterministically") {
    val df = Seq((1L, 3L, 30.0), (1L, 1L, 10.0), (1L, 2L, 20.0), (2L, 1L, 5.0))
      .toDF("k", "o", "v")
    val got = MathEval.series(df, "k", "o", "v")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got === Map(1L -> Seq(10.0, 20.0, 30.0), 2L -> Seq(5.0)))
  }
}
