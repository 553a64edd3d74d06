package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The Solr math-expression evaluator family (reference
 * solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/ — ~240
 * evaluators delegating to commons-math3), re-expressed Spark-first.
 *
 * The reference evaluates vectors DRIVER-side inside a streaming
 * expression (`let(a=col(search(...)), b=fft(a))`). The Spark-native
 * shape is different in kind:
 *
 *  - **Series ops** (fft/convolve/polyfit/moving-avg/spline/loess/...) run
 *    as NARROW per-row kernels over `array<double>` columns — one row =
 *    one series, millions of series transform in parallel with zero
 *    shuffles. Series assembly from a long table is ONE keyed shuffle
 *    ([[series]]). The per-series arithmetic delegates to the exact
 *    commons-math3 entry points the reference uses (same library, same
 *    version family), so semantics match evaluator-for-evaluator.
 *  - **Hypothesis tests** (ttest/anova/ks/mannWhitney/chiSquare) become
 *    DISTRIBUTED aggregations: Spark computes the sufficient statistics
 *    (moments, ranks, ecdfs, contingency counts) with aggs/windows, and
 *    only the O(1) final statistic → p-value step touches commons-math3.
 *    At 100 TB the reference's collect-the-vector approach is impossible;
 *    this shape never materializes a vector on the driver.
 *  - **Matrix ops** run over COO (row, col, value) frames: matmul is a
 *    co-partitioned join + agg on the contraction key — the standard
 *    distributed sparse-matmul plan ([[matMul]]).
 *  - **kmeans** is Lloyd's with deterministic farthest-point init; each
 *    iteration is one typed aggregation producing k×d doubles on the
 *    driver (constant-size driver state, like Similarity.ivfIndex).
 *
 * Scalar evaluators (add/pow/ceil/sine/...) are Spark built-ins by
 * design and are exercised by the q12/q47 oracle batteries; this module
 * covers the vector/matrix/statistical surface that had been scoped out
 * (VERDICT r3 "missing #6").
 */
object MathEval {

  // ---------------------------------------------------------------------
  // Series assembly: long table -> (key, xs: array<double>) in ONE shuffle.
  // ---------------------------------------------------------------------

  /** Collect an ordered series per key. `ordCol` must be unique per key
    * (deterministic order ⇒ deterministic series). One groupBy shuffle;
    * the sort happens inside the aggregated array, not as a global sort. */
  def series(df: DataFrame, keyCol: String, ordCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col(ordCol).as("o"),
        col(valCol).cast("double").as("v")))).as("__p"))
      .select(col(keyCol), expr("transform(__p, x -> x.v)").as("xs"))

  // ---------------------------------------------------------------------
  // Per-series kernels (pure Scala over Array[Double]) — each mirrors one
  // reference evaluator; exposed as both plain functions (for specs) and
  // array-column UDFs (narrow per-row transforms in a plan).
  // ---------------------------------------------------------------------

  /** MovingAverageEvaluator.java:54-62: slide a window of `w`, emit the
    * window mean once the window is full (output length n-w+1). */
  def movingAvg(xs: Array[Double], w: Int): Array[Double] = {
    require(w >= 1)
    if (xs.length < w) Array.empty
    else {
      val out = new Array[Double](xs.length - w + 1)
      var s = 0.0
      var i = 0
      while (i < xs.length) {
        s += xs(i)
        if (i >= w) s -= xs(i - w)
        if (i >= w - 1) out(i - w + 1) = s / w
        i += 1
      }
      out
    }
  }

  /** MovingMedianEvaluator: window median via DescriptiveStatistics'
    * percentile(50) = R-6/commons-math3 estimation on the sorted window. */
  def movingMedian(xs: Array[Double], w: Int): Array[Double] = {
    require(w >= 1)
    if (xs.length < w) Array.empty
    else (0 to xs.length - w).map { i =>
      val st = new org.apache.commons.math3.stat.descriptive.DescriptiveStatistics(
        xs.slice(i, i + w))
      st.getPercentile(50)
    }.toArray
  }

  /** ExponentialMovingAverageEvaluator: seed with the SMA of the first
    * window, then ema = (x - ema) * alpha + ema with alpha=2/(w+1). */
  def expMovingAvg(xs: Array[Double], w: Int): Array[Double] = {
    require(w >= 1)
    if (xs.length < w) Array.empty
    else {
      val alpha = 2.0 / (w + 1)
      val out = scala.collection.mutable.ArrayBuffer[Double]()
      var ema = xs.take(w).sum / w
      out += ema
      var i = w
      while (i < xs.length) {
        ema = (xs(i) - ema) * alpha + ema
        out += ema
        i += 1
      }
      out.toArray
    }
  }

  /** MovingMADEvaluator: mean absolute deviation around the window mean,
    * emitted once the window fills (length n-w+1). */
  def movingMad(xs: Array[Double], w: Int): Array[Double] = {
    require(w >= 1)
    if (xs.length < w) Array.empty
    else (0 to xs.length - w).map { i =>
      val win = xs.slice(i, i + w)
      val mean = win.sum / w
      win.map(x => math.abs(x - mean)).sum / w
    }.toArray
  }

  /** FindDelayEvaluator: argmax |xcorr| via convolve(a, reverse(b)); the
    * reference returns (index+1) − b.length, FIRST max winning. */
  def findDelay(a: Array[Double], b: Array[Double]): Double = {
    val conv = convolve(a, b.reverse)
    var maxV = -Double.MaxValue
    var maxI = -1
    var i = 0
    while (i < conv.length) {
      val abs = math.abs(conv(i))
      if (abs > maxV) { maxV = abs; maxI = i }
      i += 1
    }
    (maxI + 1).toDouble - b.length
  }

  /** EarthMoversEvaluator (commons-math3 EarthMoversDistance): 1-D EMD as
    * the running-flow recurrence — pure Column aggregate with a struct
    * accumulator (codegen, no UDF): flowᵢ = aᵢ + flowᵢ₋₁ − bᵢ,
    * emd = Σ|flowᵢ|. */
  def earthMovers(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x - y),
      struct(lit(0.0).as("flow"), lit(0.0).as("total")),
      (s, d) => {
        val flow = s.getField("flow") + d
        struct(flow.as("flow"), (s.getField("total") + abs(flow)).as("total"))
      },
      s => s.getField("total"))

  /** TimeDifferencingEvaluator: lagged difference series (len n-lag). */
  def timeDiff(xs: Array[Double], lag: Int): Array[Double] = {
    require(lag >= 1)
    if (xs.length <= lag) Array.empty
    else Array.tabulate(xs.length - lag)(i => xs(i + lag) - xs(i))
  }

  /** FFTEvaluator.java:54-69: STANDARD-normalized forward DFT via
    * commons-math3 FastFourierTransformer (len must be a power of 2),
    * returned as (real[], imaginary[]) rows of a 2-row matrix. */
  def fft(xs: Array[Double]): (Array[Double], Array[Double]) = {
    val t = new org.apache.commons.math3.transform.FastFourierTransformer(
      org.apache.commons.math3.transform.DftNormalization.STANDARD)
    val c = t.transform(xs, org.apache.commons.math3.transform.TransformType.FORWARD)
    (c.map(_.getReal), c.map(_.getImaginary))
  }

  /** IFFTEvaluator: inverse transform of an (re, im) pair, real part. */
  def ifft(re: Array[Double], im: Array[Double]): Array[Double] = {
    val t = new org.apache.commons.math3.transform.FastFourierTransformer(
      org.apache.commons.math3.transform.DftNormalization.STANDARD)
    val c = re.indices.map(i =>
      new org.apache.commons.math3.complex.Complex(re(i), im(i))).toArray
    t.transform(c, org.apache.commons.math3.transform.TransformType.INVERSE)
      .map(_.getReal)
  }

  /** ConvolutionEvaluator.java:55: full discrete convolution
    * (MathArrays.convolve — output length |a|+|b|-1). */
  def convolve(a: Array[Double], b: Array[Double]): Array[Double] =
    org.apache.commons.math3.util.MathArrays.convolve(a, b)

  /** PolyFitEvaluator.java:85-92: least-squares polynomial coefficients
    * (ascending degree) via PolynomialCurveFitter. */
  def polyFit(x: Array[Double], y: Array[Double], degree: Int): Array[Double] = {
    val fitter = org.apache.commons.math3.fitting.PolynomialCurveFitter.create(degree)
    val pts = new org.apache.commons.math3.fitting.WeightedObservedPoints()
    x.indices.foreach(i => pts.add(x(i), y(i)))
    fitter.fit(pts.toList)
  }

  /** PolyFitDerivativeEvaluator: derivative coefficients of a fitted poly. */
  def polyDerivative(coefs: Array[Double]): Array[Double] =
    new org.apache.commons.math3.analysis.polynomials.PolynomialFunction(coefs)
      .polynomialDerivative().getCoefficients

  def polyEval(coefs: Array[Double], x: Double): Double =
    new org.apache.commons.math3.analysis.polynomials.PolynomialFunction(coefs).value(x)

  /** SplineEvaluator + DerivativeEvaluator.java:49-58: natural cubic
    * spline of (x, y), differentiated and sampled back at x. */
  def splineDerivative(x: Array[Double], y: Array[Double]): Array[Double] = {
    val f = new org.apache.commons.math3.analysis.interpolation.SplineInterpolator()
      .interpolate(x, y)
    val d = f.polynomialSplineDerivative()
    x.map(d.value)
  }

  /** LerpEvaluator: linear interpolation function sampled at `at`. */
  def lerp(x: Array[Double], y: Array[Double], at: Array[Double]): Array[Double] = {
    val f = new org.apache.commons.math3.analysis.interpolation.LinearInterpolator()
      .interpolate(x, y)
    at.map(f.value)
  }

  /** AkimaEvaluator: Akima cubic spline sampled at `at` (needs ≥5 pts). */
  def akima(x: Array[Double], y: Array[Double], at: Array[Double]): Array[Double] = {
    val f = new org.apache.commons.math3.analysis.interpolation.AkimaSplineInterpolator()
      .interpolate(x, y)
    at.map(f.value)
  }

  /** GaussFitEvaluator: commons-math3 GaussianCurveFitter seeded by its
    * ParameterGuesser (the reference's exact recipe), returning the fitted
    * curve sampled at x. Deterministic: LM from a deterministic start. */
  def gaussFit(x: Array[Double], y: Array[Double]): (Array[Double], Array[Double]) = {
    import org.apache.commons.math3.fitting._
    val pts = new WeightedObservedPoints
    x.indices.foreach(i => pts.add(x(i), y(i)))
    val list = pts.toList
    val guess = new GaussianCurveFitter.ParameterGuesser(list).guess()
    val coef = GaussianCurveFitter.create().withStartPoint(guess).fit(list)
    val g = new org.apache.commons.math3.analysis.function.Gaussian(
      coef(0), coef(1), coef(2))
    (coef, x.map(g.value))
  }

  /** HarmonicFitEvaluator: commons-math3 HarmonicCurveFitter → (amplitude,
    * angularFrequency, phase) + the fitted sinusoid sampled at x. */
  def harmonicFit(x: Array[Double], y: Array[Double]): (Array[Double], Array[Double]) = {
    import org.apache.commons.math3.fitting._
    val pts = new WeightedObservedPoints
    x.indices.foreach(i => pts.add(x(i), y(i)))
    val coef = HarmonicCurveFitter.create().fit(pts.toList)
    val h = new org.apache.commons.math3.analysis.function.HarmonicOscillator(
      coef(0), coef(1), coef(2))
    (coef, x.map(h.value))
  }

  /** LoessEvaluator: commons-math3 LoessInterpolator.smooth with the
    * reference's default bandwidth 0.25 unless overridden. */
  def loess(x: Array[Double], y: Array[Double], bandwidth: Double = 0.25): Array[Double] =
    new org.apache.commons.math3.analysis.interpolation.LoessInterpolator(
      bandwidth, org.apache.commons.math3.analysis.interpolation.LoessInterpolator.DEFAULT_ROBUSTNESS_ITERS)
      .smooth(x, y)

  /** IntegrateEvaluator: Romberg integral of the natural cubic spline of
    * (x, y) over [lo, hi] — the reference integrates the VectorFunction
    * produced by spline()/loess(). */
  def integrateSpline(x: Array[Double], y: Array[Double], lo: Double, hi: Double): Double = {
    val f = new org.apache.commons.math3.analysis.interpolation.SplineInterpolator()
      .interpolate(x, y)
    new org.apache.commons.math3.analysis.integration.RombergIntegrator()
      .integrate(5000, f, lo, hi)
  }

  /** OscillateEvaluator: amplitude*sin(angularFrequency*x + phase) sampled
    * at x = 0..length-1 (the reference's sine-wave generator). */
  def oscillate(amplitude: Double, angularFrequency: Double, phase: Double,
                length: Int): Array[Double] =
    Array.tabulate(length)(i => amplitude * math.sin(angularFrequency * i + phase))

  // ---------------------------------------------------------------------
  // Distributions (reference *DistributionEvaluator + Cumulative-
  // Probability/Probability/DensityEvaluator). Closed-form ones are pure
  // Column arithmetic (codegen); erf/regularized-gamma ones go through a
  // commons-math3 UDF — still a narrow per-row map.
  // ---------------------------------------------------------------------

  /** PoissonDistributionEvaluator + ProbabilityEvaluator: pmf(k; λ) =
    * exp(-λ) λ^k / k!  (k ≤ 20 keeps factorial in long range; larger k
    * should use [[normalCdf]]'s UDF form). Pure codegen arithmetic. */
  def poissonPmf(k: Column, lambda: Double): Column =
    exp(lit(-lambda)) * pow(lit(lambda), k.cast("double")) / factorial(k.cast("int")).cast("double")

  /** CumulativeProbability over Poisson: Σ_{i≤k} pmf(i) via a sequence
    * aggregate — stays in codegen for the small-k regime. */
  def poissonCdf(k: Column, lambda: Double): Column =
    aggregate(sequence(lit(0), k.cast("int")),
      lit(0.0),
      (acc, i) => acc + exp(lit(-lambda)) * pow(lit(lambda), i.cast("double")) /
        factorial(i).cast("double"))

  /** BinomialDistributionEvaluator: pmf(k; n, p) = C(n,k) p^k (1-p)^(n-k)
    * (BinomialCoefficientEvaluator's C(n,k) inlined via factorials). */
  def binomialPmf(k: Column, n: Int, p: Double): Column = {
    require(n <= 20, "factorial-based form needs n <= 20")
    val kd = k.cast("int")
    (factorial(lit(n)).cast("double") /
      (factorial(kd).cast("double") * factorial(lit(n) - kd).cast("double"))) *
      pow(lit(p), kd.cast("double")) * pow(lit(1 - p), lit(n.toDouble) - kd.cast("double"))
  }

  /** UniformDistributionEvaluator cdf on [lo, hi]. */
  def uniformCdf(x: Column, lo: Double, hi: Double): Column =
    least(lit(1.0), greatest(lit(0.0), (x - lit(lo)) / lit(hi - lo)))

  /** Exponential cdf(x; mean) = 1 - exp(-x/mean) (commons-math3
    * ExponentialDistribution is mean-parameterized). */
  def exponentialCdf(x: Column, mean: Double): Column =
    when(x <= 0, lit(0.0)).otherwise(lit(1.0) - exp(-x / lit(mean)))

  /** WeibullDistributionEvaluator cdf(x; shape k, scale λ) = 1-exp(-(x/λ)^k). */
  def weibullCdf(x: Column, shape: Double, scale: Double): Column =
    when(x <= 0, lit(0.0)).otherwise(lit(1.0) - exp(-pow(x / lit(scale), lit(shape))))

  /** TriangularDistributionEvaluator cdf on (a, c, b) (mode c). */
  def triangularCdf(x: Column, a: Double, c: Double, b: Double): Column =
    when(x <= a, lit(0.0))
      .when(x <= c, pow(x - lit(a), lit(2.0)) / lit((b - a) * (c - a)))
      .when(x < b, lit(1.0) - pow(lit(b) - x, lit(2.0)) / lit((b - a) * (b - c)))
      .otherwise(lit(1.0))

  /** GeometricDistributionEvaluator pmf(k; p) = (1-p)^k·p, cdf =
    * 1-(1-p)^(k+1) (commons-math3 support k ≥ 0 = failures before the
    * first success). */
  def geometricPmf(k: Column, p: Double): Column =
    pow(lit(1 - p), k.cast("double")) * lit(p)
  def geometricCdf(k: Column, p: Double): Column =
    lit(1.0) - pow(lit(1 - p), k.cast("double") + 1)

  /** UniformIntegerDistributionEvaluator cdf on [lo, hi] inclusive. */
  def uniformIntegerCdf(k: Column, lo: Int, hi: Int): Column =
    least(lit(1.0), greatest(lit(0.0),
      (floor(k.cast("double")) - lo + 1) / lit((hi - lo + 1).toDouble)))

  /** ZipFDistributionEvaluator pmf(k; n, s) = k^-s / H(n,s). */
  def zipfPmf(k: Column, n: Int, s: Double): Column = {
    val h = (1 to n).map(i => math.pow(i, -s)).sum
    pow(k.cast("double"), lit(-s)) / lit(h)
  }

  /** NormalDistributionEvaluator + CumulativeProbabilityEvaluator: Φ via
    * commons-math3 (erf has no codegen form). Narrow per-row UDF. */
  val normalCdfUdf = udf((x: Double, mu: Double, sigma: Double) =>
    new org.apache.commons.math3.distribution.NormalDistribution(mu, sigma)
      .cumulativeProbability(x))

  /** LogNormalDistributionEvaluator cdf (shape/scale as commons-math3). */
  val logNormalCdfUdf = udf((x: Double, scale: Double, shape: Double) =>
    new org.apache.commons.math3.distribution.LogNormalDistribution(scale, shape)
      .cumulativeProbability(x))

  /** GammaDistributionEvaluator cdf (regularized incomplete gamma). */
  val gammaCdfUdf = udf((x: Double, shape: Double, scale: Double) =>
    new org.apache.commons.math3.distribution.GammaDistribution(shape, scale)
      .cumulativeProbability(x))

  /** Per-distinct-value INCLUSIVE cumulative counts — the distributed
    * primitive under [[empiricalCdf]]/[[ksUniform]]/[[mannWhitneyU]]:
    * one groupBy shuffle + one range repartition + a two-phase prefix sum
    * (the packCounted pattern — per-partition subtotals are the only
    * driver state), instead of a single-partition global Window, which
    * would serialize the whole table through one task at 100 TB.
    * Returns (v, ct, cum) with cum = #rows with value ≤ v. */
  private def cumCounts(df: DataFrame, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.sessionState.conf.numShufflePartitions
    val counted = df.groupBy(col(valCol).cast("double").as("v"))
      .agg(count(lit(1)).as("ct"))
      .repartitionByRange(parts, col("v"))
      .sortWithinPartitions("v")
      .as[(Double, Long)]
    val rdd = counted.rdd
    // both prefix-sum phases consume it; freed on context GC (see
    // Pipeline.packCounted for the lifecycle rationale)
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subtotals = rdd.mapPartitionsWithIndex { case (pi, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((pi, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = subtotals.scanLeft(0L)(_ + _)
    rdd.mapPartitionsWithIndex { case (pi, it) =>
      var cum = offsets(pi)
      it.map { case (v, ct) => cum += ct; (v, ct, cum) }
    }.toDF("v", "ct", "cum")
  }

  /** EmpiricalDistribution cdf, DISTRIBUTED — the 100 TB form of
    * EmpiricalDistributionEvaluator (no vector on the driver, no global
    * window): ecdf(x) = #(values ≤ x)/n via [[cumCounts]], joined back on
    * the value key (ties take their max rank, as in the window form). */
  def empiricalCdf(df: DataFrame, valCol: String): DataFrame = {
    val cc = cumCounts(df, valCol)
    val n = cc.agg(sum("ct")).head().getLong(0).toDouble
    df.join(cc.select(col("v").as("__v"), (col("cum") / lit(n)).as("ecdf")),
        col(valCol).cast("double") === col("__v"))
      .drop("__v")
  }

  // ---------------------------------------------------------------------
  // Hypothesis tests — sufficient statistics via Spark aggregation,
  // statistic → p-value via commons-math3 on the aggregated scalars.
  // ---------------------------------------------------------------------

  /** TTestEvaluator (two-sample Welch, commons-math3 TTest.tTest
    * semantics): t = (m1-m2)/sqrt(v1/n1 + v2/n2), Welch-Satterthwaite df,
    * two-sided p. Group stats come from ONE aggregation pass. */
  def tTestWelch(df: DataFrame, valCol: String, groupCol: String,
                 g1: String, g2: String): DataFrame = {
    val stats = df.filter(col(groupCol).isin(g1, g2))
      .groupBy(groupCol)
      .agg(avg(valCol).as("m"), var_samp(valCol).as("v"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3).toDouble)).toMap
    val (m1, v1, n1) = stats(g1)
    val (m2, v2, n2) = stats(g2)
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    val dfree = math.pow(v1 / n1 + v2 / n2, 2) /
      (math.pow(v1 / n1, 2) / (n1 - 1) + math.pow(v2 / n2, 2) / (n2 - 1))
    val p = 2.0 * new org.apache.commons.math3.distribution.TDistribution(dfree)
      .cumulativeProbability(-math.abs(t))
    df.sparkSession.createDataFrame(Seq((t, dfree, p)))
      .toDF("t_stat", "t_df", "p_value")
  }

  /** PairedTTestEvaluator: t over the per-row differences. */
  def pairedTTest(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val r = df.agg(avg(col(aCol) - col(bCol)).as("md"),
      var_samp(col(aCol) - col(bCol)).as("vd"), count(lit(1)).as("n")).head()
    val (md, vd, n) = (r.getDouble(0), r.getDouble(1), r.getLong(2).toDouble)
    val t = md / math.sqrt(vd / n)
    val p = 2.0 * new org.apache.commons.math3.distribution.TDistribution(n - 1)
      .cumulativeProbability(-math.abs(t))
    df.sparkSession.createDataFrame(Seq((t, n - 1, p)))
      .toDF("t_stat", "t_df", "p_value")
  }

  /** AnovaEvaluator (commons-math3 OneWayAnova): F from between/within
    * sums of squares — all from one grouped-aggregation pass. */
  def anova(df: DataFrame, valCol: String, groupCol: String): DataFrame = {
    val g = df.groupBy(groupCol)
      .agg(sum(valCol).as("s"), sum(col(valCol) * col(valCol)).as("ss"),
        count(lit(1)).as("n"))
      .agg(sum("s").as("ts"), sum("ss").as("tss"), sum("n").as("tn"),
        sum(col("s") * col("s") / col("n")).as("sgm"), count(lit(1)).as("k"))
      .head()
    val (ts, tss, tn, sgm, k) =
      (g.getDouble(0), g.getDouble(1), g.getLong(2).toDouble, g.getDouble(3),
        g.getLong(4).toDouble)
    val ssbg = sgm - ts * ts / tn
    val sswg = tss - sgm
    val dfbg = k - 1
    val dfwg = tn - k
    val f = (ssbg / dfbg) / (sswg / dfwg)
    val p = 1.0 - new org.apache.commons.math3.distribution.FDistribution(dfbg, dfwg)
      .cumulativeProbability(f)
    df.sparkSession.createDataFrame(Seq((f, p))).toDF("f_ratio", "p_value")
  }

  /** KolmogorovSmirnovEvaluator.java:51-61 one-sample form vs a uniform
    * reference distribution on [lo, hi]: D = max over sorted points of
    * max(|i/n − F(x_i)|, |(i−1)/n − F(x_i)|), computed with a window
    * row_number (distributed sort, no driver vector). */
  def ksUniform(df: DataFrame, valCol: String, lo: Double, hi: Double): DataFrame = {
    // distributed: for a run of equal values at 1-based sorted indices
    // a..b, the row-wise max of |i/n − F| and |(i−1)/n − F| over i∈[a,b]
    // is attained at the endpoints — max(|b/n − F|, |(a−1)/n − F|) with
    // b = cum and a−1 = cum−ct, so cumCounts carries everything needed
    val cc = cumCounts(df, valCol)
    val n = cc.agg(sum("ct")).head().getLong(0)
    val nf = n.toDouble
    val cdf = least(lit(1.0), greatest(lit(0.0), (col("v") - lit(lo)) / lit(hi - lo)))
    val d = cc.select(greatest(
        abs(col("cum") / lit(nf) - cdf),
        abs((col("cum") - col("ct")) / lit(nf) - cdf)).as("dev"))
      .agg(max("dev")).head().getDouble(0)
    // the reference evaluator's p: KolmogorovSmirnovTest.kolmogorovSmirnovTest
    // = 1 − cdf(d, n) — the fast double-precision cdf (exact-BigFraction
    // KolmogorovSmirnovDistribution is O(n·k³) big-rational work: minutes
    // at n=10k, unusable at scale)
    val p = 1.0 - new org.apache.commons.math3.stat.inference.KolmogorovSmirnovTest()
      .cdf(d, n.toInt)
    df.sparkSession.createDataFrame(Seq((d, p))).toDF("d_stat", "p_value")
  }

  /** MannWhitneyUEvaluator (commons-math3 MannWhitneyUTest): ranks with
    * ties averaged (NaturalRanking TiesStrategy.AVERAGE) — here via a
    * distributed rank window: avgRank(v) = rank(v) + (ct(v)-1)/2; U1 =
    * R1 − n1(n1+1)/2; z against the normal approximation. */
  def mannWhitneyU(df: DataFrame, valCol: String, groupCol: String,
                   g1: String, g2: String): DataFrame = {
    val two = df.filter(col(groupCol).isin(g1, g2))
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
    // distributed tie-averaged ranks without a global window: avgRank(v) =
    // (cum − ct) + (ct+1)/2 from cumCounts; per-group rank sums are then
    // Σ count_g(v)·avgRank(v) over the (small) distinct-value frame
    val avgRank = cumCounts(two, "v").select(col("v"),
      (col("cum") - col("ct") + (col("ct") + 1) / lit(2.0)).as("ar"))
    val agg0 = two.groupBy("g", "v").agg(count(lit(1)).as("cg"))
      .join(avgRank, "v")
      .groupBy("g").agg(sum(col("cg") * col("ar")).as("rs"), sum("cg").as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2).toDouble)).toMap
    val (r1, n1) = agg0(g1)
    val (_, n2) = agg0(g2)
    val u1 = r1 - n1 * (n1 + 1) / 2
    val u2 = n1 * n2 - u1
    val umin = math.min(u1, u2)
    val mu = n1 * n2 / 2.0
    val sd = math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    val z = (umin - mu) / sd
    val p = 2.0 * new org.apache.commons.math3.distribution.NormalDistribution()
      .cumulativeProbability(z)
    df.sparkSession.createDataFrame(Seq((u1, u2, math.min(p, 1.0))))
      .toDF("u1", "u2", "p_value")
  }

  /** ChiSquareDataSetEvaluator (commons-math3
    * chiSquareTestDataSetsComparison): χ² between two observed count
    * vectors o1, o2 joined on category — with the unequal-total weighting
    * χ² = Σ (√(N2/N1)·o1 − √(N1/N2)·o2)² / (o1+o2). One join + one agg. */
  def chiSquareDataSets(counts1: DataFrame, counts2: DataFrame,
                        catCol: String, cntCol: String): DataFrame = {
    val a = counts1.select(col(catCol).as("cat"), col(cntCol).cast("double").as("o1"))
    val b = counts2.select(col(catCol).as("cat"), col(cntCol).cast("double").as("o2"))
    val j = a.join(b, Seq("cat"), "outer").na.fill(0.0, Seq("o1", "o2"))
    val tot = j.agg(sum("o1"), sum("o2")).head()
    val (t1, t2) = (tot.getDouble(0), tot.getDouble(1))
    val w1 = math.sqrt(t2 / t1)
    val w2 = math.sqrt(t1 / t2)
    val kRow = j.filter(col("o1") + col("o2") > 0)
      .select((pow(lit(w1) * col("o1") - lit(w2) * col("o2"), lit(2.0)) /
        (col("o1") + col("o2"))).as("term"))
      .agg(sum("term").as("chi2"), count(lit(1)).as("k")).head()
    val (chi2, k) = (kRow.getDouble(0), kRow.getLong(1).toDouble)
    val p = 1.0 - new org.apache.commons.math3.distribution.ChiSquaredDistribution(k - 1)
      .cumulativeProbability(chi2)
    counts1.sparkSession.createDataFrame(Seq((chi2, p))).toDF("chi2", "p_value")
  }

  /** GTestDataSetEvaluator (commons-math3 GTest.gDataSetsComparison):
    * G = 2·Σ oᵢⱼ·ln(oᵢⱼ/eᵢⱼ) with eᵢⱼ = (o1ⱼ+o2ⱼ)·Nᵢ/(N1+N2), zero cells
    * contributing 0 — same one-join + one-agg shape as [[chiSquareDataSets]]. */
  def gTestDataSets(counts1: DataFrame, counts2: DataFrame,
                    catCol: String, cntCol: String): DataFrame = {
    val a = counts1.select(col(catCol).as("cat"), col(cntCol).cast("double").as("o1"))
    val b = counts2.select(col(catCol).as("cat"), col(cntCol).cast("double").as("o2"))
    val j = a.join(b, Seq("cat"), "outer").na.fill(0.0, Seq("o1", "o2"))
    val tot = j.agg(sum("o1"), sum("o2")).head()
    val (t1, t2) = (tot.getDouble(0), tot.getDouble(1))
    val (f1, f2) = (t1 / (t1 + t2), t2 / (t1 + t2))
    def term(o: Column, f: Double) =
      when(o > 0, o * log(o / ((col("o1") + col("o2")) * lit(f)))).otherwise(lit(0.0))
    val kRow = j.filter(col("o1") + col("o2") > 0)
      .select((term(col("o1"), f1) + term(col("o2"), f2)).as("t"))
      .agg(sum("t").as("g"), count(lit(1)).as("k")).head()
    val (g, k) = (2.0 * kRow.getDouble(0), kRow.getLong(1).toDouble)
    val p = 1.0 - new org.apache.commons.math3.distribution.ChiSquaredDistribution(k - 1)
      .cumulativeProbability(g)
    counts1.sparkSession.createDataFrame(Seq((g, p))).toDF("g_stat", "p_value")
  }

  // ---------------------------------------------------------------------
  // DBSCAN (DbscanEvaluator — commons-math3 DBSCANClusterer), distributed:
  // eps-grid bucketing bounds the neighbor search to the 3^d adjacent
  // cells (standard grid-partitioned DBSCAN), core detection is one keyed
  // count, clusters are connected components over core-core edges
  // (Dedup.connectedComponents — O(log n) pointer-jumping rounds).
  // ---------------------------------------------------------------------

  /** Returns (id, cluster) with cluster = min point-id among the cluster's
    * CORE points; noise rows are absent (commons-math3 likewise returns
    * noise in no Cluster). Border points join their minimum core
    * neighbor's cluster — the reference attaches them to whichever
    * cluster's expansion reaches them first (insertion-order dependent);
    * min-label is the deterministic canonicalization of the same
    * reachability. Core rule matches the reference: ≥ minPts neighbors
    * within eps EXCLUDING the point itself.
    *
    * Scale shape: every shuffle is keyed (cell, then id); a grid cell is
    * the natural bucket, so a pathological corpus with millions of
    * coincident points concentrates one cell — the same skew caveat as
    * Dedup's LSH buckets (salt or pre-dedup coincident points upstream). */
  def dbscan(df: DataFrame, idCol: String, vecCol: String, eps: Double,
             minPts: Int): DataFrame = {
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val dims = pts.select(size(col("vec"))).head().getInt(0)
    val cellOf = (0 until dims).map(i =>
      floor(element_at(col("vec"), i + 1) / lit(eps)).cast("long"))
    // 3^d probe offsets; each true pair is found exactly once (a's probe
    // cell meets b's unique home cell), so no pair-dedup is needed
    val offsets = (0 until dims).foldLeft(Seq(Seq.empty[Int])) {
      (acc, _) => acc.flatMap(s => Seq(-1, 0, 1).map(s :+ _))
    }
    val home = pts.withColumn("cell", concat_ws(":", cellOf: _*))
    val probes = pts.withColumn("cell", explode(array(offsets.map { off =>
      concat_ws(":", cellOf.zip(off).map { case (c, o) => c + lit(o) }: _*)
    }: _*)))
    val neigh = probes.as("a").join(home.as("b"), "cell")
      .filter(col("a.id") =!= col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        aggregate(zip_with(col("a.vec"), col("b.vec"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (s, e) => s + e).as("d2"))
      .filter(col("d2") <= lit(eps * eps))
      .select("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val core = neigh.groupBy("src").agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= minPts).select(col("src").as("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val coreEdges = neigh
      .join(core.select(col("id").as("src")), "src")
      .join(core.select(col("id").as("dst")), "dst")
    val comps = Dedup.connectedComponents(coreEdges, "src", "dst")
    // singleton-core clusters (no core neighbor) label themselves
    val coreLabels = core.join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
    val borderLabels = neigh
      .join(coreLabels.select(col("id").as("src"), col("cluster")), "src")
      .join(core.select(col("id").as("dst")), Seq("dst"), "left_anti")
      .groupBy(col("dst").as("id")).agg(min("cluster").as("cluster"))
    // neigh/core stay persisted until the caller materializes the result
    // (each feeds 2-3 downstream joins); freed on context GC — the
    // packCounted lifecycle
    coreLabels.unionByName(borderLabels)
  }

  // ---------------------------------------------------------------------
  // Geometry (ConvexHullEvaluator / EnclosingDiskEvaluator — commons-math3
  // MonotoneChain / WelzlEncloser), distributed: hull(∪ points) =
  // hull(∪ per-partition hulls), so each partition reduces to its own
  // (tiny) hull and only hull vertices reach the driver. The enclosing
  // disk is determined by hull points alone, so it reuses the same
  // reduction. Worst case (all points ON a circle) degenerates to
  // collecting every point — same caveat as the reference's driver-side
  // evaluator, but here only for adversarial inputs.
  // ---------------------------------------------------------------------

  /** ConvexHullEvaluator: hull vertices (x, y), counter-clockwise as
    * MonotoneChain emits them. */
  def convexHull(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.commons.math3.geometry.euclidean.twod.Vector2D
    import org.apache.commons.math3.geometry.euclidean.twod.hull.MonotoneChain
    import scala.jdk.CollectionConverters._
    def hullOf(pts: Iterable[(Double, Double)]): Seq[(Double, Double)] = {
      val vs = pts.map { case (x, y) => new Vector2D(x, y) }.toSeq
      if (vs.size < 3) vs.map(v => (v.getX, v.getY))
      else new MonotoneChain().generate(vs.asJava).getVertices
        .map(v => (v.getX, v.getY)).toSeq
    }
    val partial = df.select(col(xCol).cast("double"), col(yCol).cast("double"))
      .as[(Double, Double)]
      .mapPartitions(it => hullOf(it.toSeq).iterator)
      .collect()
    val finalHull = hullOf(partial.distinct.toSeq)
    spark.createDataFrame(finalHull).toDF("x", "y")
  }

  /** EnclosingDiskEvaluator: minimal enclosing disk via WelzlEncloser
    * over the distributed hull's vertices → (center_x, center_y, radius). */
  def enclosingDisk(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.commons.math3.geometry.euclidean.twod.{DiskGenerator, Vector2D}
    import org.apache.commons.math3.geometry.enclosing.WelzlEncloser
    import scala.jdk.CollectionConverters._
    val hull = convexHull(df, xCol, yCol).collect()
      .map(r => new Vector2D(r.getDouble(0), r.getDouble(1))).toSeq
    val ball = new WelzlEncloser[org.apache.commons.math3.geometry.euclidean.twod.Euclidean2D, Vector2D](
      1e-10, new DiskGenerator()).enclose(hull.asJava)
    df.sparkSession.createDataFrame(Seq(
      (ball.getCenter.getX, ball.getCenter.getY, ball.getRadius)))
      .toDF("center_x", "center_y", "radius")
  }

  // ---------------------------------------------------------------------
  // Matrix ops over COO (row, col, value) frames — the distributed form of
  // Matrix.java / MatrixMultiplyEvaluator / TransposeEvaluator /
  // CorrelationEvaluator(matrix mode) / CovarianceEvaluator.
  // ---------------------------------------------------------------------

  /** MatrixMultiplyEvaluator: C = A·B with A, B as COO frames. The
    * contraction is a keyed equi-join on A.col = B.row followed by a
    * grouped sum — both shuffles are on the contraction key, the standard
    * distributed sparse matmul (scales to matrices that never fit on one
    * node; zero driver materialization). */
  def matMul(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.select(col("i").as("ai"), col("j").as("k"), col("v").as("av"))
    val r = b.select(col("i").as("k"), col("j").as("bj"), col("v").as("bv"))
    l.join(r, "k")
      .groupBy(col("ai").as("i"), col("bj").as("j"))
      .agg(sum(col("av") * col("bv")).as("v"))
  }

  /** TransposeEvaluator over COO: swap the indices (pure projection). */
  def transpose(a: DataFrame): DataFrame =
    a.select(col("j").as("i"), col("i").as("j"), col("v"))

  /** SumRowsEvaluator / SumColumnsEvaluator / GrandSumEvaluator. */
  def sumRows(a: DataFrame): DataFrame = a.groupBy("i").agg(sum("v").as("v"))
  def sumColumns(a: DataFrame): DataFrame = a.groupBy("j").agg(sum("v").as("v"))
  def grandSum(a: DataFrame): DataFrame = a.agg(sum("v").as("v"))

  /** CorrelationEvaluator matrix mode: all pairwise Pearson correlations
    * of `cols` in ONE aggregation pass (k² agg expressions over one scan —
    * no per-pair passes). */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exprs = for (a <- cols; b <- cols) yield corr(col(a), col(b)).as(s"${a}__$b")
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    val out = for {
      (a, ia) <- cols.zipWithIndex
      (b, ib) <- cols.zipWithIndex
    } yield (a, b, row.getDouble(ia * cols.size + ib))
    df.sparkSession.createDataFrame(out).toDF("c1", "c2", "corr")
  }

  /** CovarianceEvaluator matrix mode (sample covariance). */
  def covMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val exprs = for (a <- cols; b <- cols) yield covar_samp(col(a), col(b)).as(s"${a}__$b")
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    val out = for {
      (a, ia) <- cols.zipWithIndex
      (b, ib) <- cols.zipWithIndex
    } yield (a, b, row.getDouble(ia * cols.size + ib))
    df.sparkSession.createDataFrame(out).toDF("c1", "c2", "cov")
  }

  // ---------------------------------------------------------------------
  // Regressions beyond the q47 OLS built-ins.
  // ---------------------------------------------------------------------

  /** OLSRegressionEvaluator (multivariate, commons-math3
    * OLSMultipleLinearRegression semantics), computed at scale: the
    * normal equations' X'X (k×k) and X'y (k) are ONE distributed
    * aggregation; only the k×k solve runs on the driver. `ridgeLambda`
    * adds λI for ridge regularization (λ=0 ⇒ plain OLS). With intercept. */
  def olsRegress(df: DataFrame, yCol: String, xCols: Seq[String],
                 ridgeLambda: Double = 0.0): Array[Double] = {
    val k = xCols.size + 1 // intercept first
    val xs = lit(1.0) +: xCols.map(c => col(c).cast("double"))
    val gram = for (i <- 0 until k; j <- i until k)
      yield sum(xs(i) * xs(j)).as(s"g_${i}_$j")
    val xy = (0 until k).map(i => sum(xs(i) * col(yCol).cast("double")).as(s"b_$i"))
    val row = df.agg((gram ++ xy).head, (gram ++ xy).tail: _*).head()
    val m = Array.ofDim[Double](k, k)
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      m(i)(j) = row.getDouble(idx); m(j)(i) = m(i)(j); idx += 1
    }
    // ridge: don't penalize the intercept (standard convention)
    for (i <- 1 until k) m(i)(i) += ridgeLambda
    val rhs = Array.tabulate(k)(i => row.getDouble(idx + i))
    val lu = new org.apache.commons.math3.linear.LUDecomposition(
      new org.apache.commons.math3.linear.Array2DRowRealMatrix(m))
    lu.getSolver.solve(new org.apache.commons.math3.linear.ArrayRealVector(rhs))
      .toArray
  }

  /** KnnRegressionEvaluator: predict each test point as the mean `yCol`
    * of its k nearest training rows by |xCol − q| (1-d form). Distributed:
    * broadcast the (small) test frame against the training table, rank
    * with a per-test-point window, average the top k. Deterministic
    * tie-break on (distance, then tieCols). */
  def knnRegress(train: DataFrame, test: DataFrame, xCol: String, yCol: String,
                 k: Int, tieCols: Seq[String]): DataFrame = {
    val t = broadcast(test.select(col(xCol).as("q")))
    val joined = train.join(t)
      .withColumn("d", abs(col(xCol) - col("q")))
    val w = Window.partitionBy(col("q"))
      .orderBy(col("d") +: tieCols.map(col): _*)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("q"))
      .agg(avg(yCol).as("pred"))
  }

  // ---------------------------------------------------------------------
  // kmeans (KmeansEvaluator — commons-math3 KMeansPlusPlusClusterer with
  // euclidean distance), distributed: Lloyd's iterations over a typed
  // aggregation (constant k×d driver state per round), deterministic
  // farthest-point init (no RNG — resumable / replayable).
  // ---------------------------------------------------------------------

  /** Returns (assignments: (id, cluster), centroids[k][d]). Each Lloyd's
    * round is one aggregation job; nothing larger than k×d doubles ever
    * reaches the driver. Farthest-point init: c0 = vector of the smallest
    * id; c_{i+1} = argmax over rows of min distance to chosen centroids
    * (one agg per seed — k is small). */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
             initRank: Int = 0): (DataFrame, Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec")).cache()
    var centroids = farthestInit(pts, k, initRank)
    // ---- Lloyd's
    var it = 0
    var assign: DataFrame = null
    while (it < iters) {
      val dists = centroids.zipWithIndex.map { case (c, i) =>
        struct(dist2(col("vec"), c).as("d"), lit(i).as("c"))
      }
      assign = pts.withColumn("cluster", least(dists.toIndexedSeq: _*).getField("c"))
      val upd = assign.select(col("cluster"), col("vec"))
        .as[(Int, Seq[Double])]
        .groupByKey(_._1)
        .agg(new VecMean(centroids(0).length).toColumn)
        .collect()
      upd.foreach { case (c, mean) => centroids(c) = mean.toArray }
      it += 1
    }
    val out = pts.withColumn("cluster",
      least(centroids.zipWithIndex.map { case (c, i) =>
        struct(dist2(col("vec"), c).as("d"), lit(i).as("c"))
      }.toIndexedSeq: _*).getField("c"))
      .select(col("id"), col("cluster"))
    pts.unpersist(blocking = false)
    (out, centroids)
  }

  /** Squared euclidean distance of an array column to a constant centroid
    * — pure codegen aggregate (shared by the clustering family). */
  private def dist2(a: Column, cent: Array[Double]): Column = {
    val c = array(cent.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(a, c, (x, y) => (x - y) * (x - y)), lit(0.0), (s, e) => s + e)
  }

  /** Deterministic farthest-point init: c0 = vector of the `initRank`-th
    * smallest id; c_{i+1} = argmax of min distance to chosen centroids
    * (ties -> smaller id). No RNG — replayable/resumable; `initRank`
    * varies the start for [[multiKmeans]] restarts. */
  private def farthestInit(pts: DataFrame, k: Int, initRank: Int): Array[Array[Double]] = {
    val first = pts.orderBy(col("id")).limit(initRank + 1)
      .collect().last.getSeq[Double](1).toArray
    val cents = scala.collection.mutable.ArrayBuffer[Array[Double]](first)
    while (cents.size < k) {
      val minD = cents.map(c => dist2(col("vec"), c)).reduce(least(_, _))
      val far = pts.withColumn("md", minD)
        .orderBy(col("md").desc, col("id")).select("vec").head().getSeq[Double](0).toArray
      cents += far
    }
    cents.toArray
  }

  /** MultiKmeansEvaluator: `restarts` kmeans runs from different
    * deterministic starts, keeping the lowest within-cluster sum of
    * squares (the reference re-rolls its RNG per trial; rotating the
    * farthest-point anchor is the replayable analogue). */
  def multiKmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
                  iters: Int, restarts: Int): (DataFrame, Array[Array[Double]], Double) = {
    require(restarts >= 1)
    val runs = (0 until restarts).map { r =>
      val (assign, cents) = kmeans(df, idCol, vecCol, k, iters, initRank = r)
      val pts = df.select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("vec"))
      val wcss = pts.select(least(cents.toIndexedSeq.map(c =>
          dist2(col("vec"), c)): _*).as("d2"))
        .agg(sum("d2")).head().getDouble(0)
      (assign, cents, wcss)
    }
    runs.minBy(_._3)
  }

  /** Fuzzy c-means memberships of one point against fixed centroids:
    * u_c = d_c^(−2/(m−1)) / Σ_k d_k^(−2/(m−1)); a zero distance gets
    * membership 1 (commons-math3 FuzzyKMeansClusterer's rule). */
  private[operators] def memberships(cents: Array[Array[Double]], m: Double,
                                     v: Seq[Double]): Array[Double] = {
    val k = cents.length
    val d = new Array[Double](k)
    var zero = -1
    var c = 0
    while (c < k) {
      var s = 0.0; var i = 0
      while (i < cents(c).length) { val t = v(i) - cents(c)(i); s += t * t; i += 1 }
      d(c) = math.sqrt(s)
      if (d(c) == 0.0 && zero < 0) zero = c
      c += 1
    }
    val u = new Array[Double](k)
    if (zero >= 0) { u(zero) = 1.0; u }
    else {
      val e = 2.0 / (m - 1.0)
      var tot = 0.0
      c = 0
      while (c < k) { u(c) = math.pow(d(c), -e); tot += u(c); c += 1 }
      c = 0
      while (c < k) { u(c) /= tot; c += 1 }
      u
    }
  }

  /** FuzzyKmeansEvaluator (commons-math3 FuzzyKMeansClusterer semantics,
    * fuzziness m > 1): centroids are the u^m-weighted means; each round is
    * ONE typed aggregation producing k×(d+1) doubles on the driver.
    * Deterministic farthest-point init replaces the reference's RNG seed
    * (same fixed point on separated data, replayable). Returns
    * (id, cluster = argmax membership, membership) + centroids. */
  def fuzzyKmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
                  m: Double, iters: Int): (DataFrame, Array[Array[Double]]) = {
    require(m > 1.0, "fuzziness must be > 1")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("vec")).cache()
    var centroids = farthestInit(pts, k, 0)
    val dims = centroids(0).length
    var it = 0
    while (it < iters) {
      val sums = pts.select(col("vec")).as[Seq[Double]]
        .select(new FuzzyAgg(centroids, m).toColumn)
        .head()
      centroids = Array.tabulate(k) { c =>
        val off = c * (dims + 1)
        val w = math.max(sums(off + dims), Double.MinPositiveValue)
        Array.tabulate(dims)(i => sums(off + i) / w)
      }
      it += 1
    }
    val centsFinal = centroids
    val mFinal = m
    val assignUdf = udf((v: Seq[Double]) => {
      val u = memberships(centsFinal, mFinal, v)
      val c = u.indices.maxBy(u) // first max -> deterministic
      (c, u(c))
    })
    val out = pts.withColumn("__a", assignUdf(col("vec")))
      .select(col("id"), col("__a._1").as("cluster"), col("__a._2").as("membership"))
    pts.unpersist(blocking = false)
    (out, centroids)
  }

  /** Typed u^m-weighted sum aggregator for [[fuzzyKmeans]]: buffer =
    * k×(sums ++ weight) — constant plan size at any (k, dim). */
  private final class FuzzyAgg(cents: Array[Array[Double]], m: Double)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[Double], Array[Double], Seq[Double]] {
    private val k = cents.length
    private val dims = cents(0).length
    def zero: Array[Double] = new Array[Double](k * (dims + 1))
    def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      val u = memberships(cents, m, v)
      var c = 0
      while (c < k) {
        val w = math.pow(u(c), m)
        val off = c * (dims + 1)
        var i = 0
        while (i < dims) { b(off + i) += w * v(i); i += 1 }
        b(off + dims) += w
        c += 1
      }
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Double]): Seq[Double] = r.toSeq
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Typed mean-vector aggregator: buffer = sums ++ count (the
    * Similarity.VecSumCount pattern — constant plan size at any dim). */
  private final class VecMean(dims: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Int, Seq[Double]), Array[Double], Seq[Double]] {
    def zero: Array[Double] = new Array[Double](dims + 1)
    def reduce(b: Array[Double], a: (Int, Seq[Double])): Array[Double] = {
      var i = 0
      while (i < dims) { b(i) += a._2(i); i += 1 }
      b(dims) += 1
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i <= dims) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Double]): Seq[Double] = {
      val n = math.max(r(dims), 1.0)
      (0 until dims).map(i => r(i) / n)
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  // ---------------------------------------------------------------------
  // Vector norms / distances (L1NormEvaluator, LInfNormEvaluator,
  // ManhattanEvaluator, EuclideanDistanceEvaluator, ChebyshevDistance-
  // Evaluator, CanberraEvaluator, MinMaxScaleEvaluator) — pure Column
  // higher-order-function arithmetic, fully codegen, no UDF.
  // ---------------------------------------------------------------------

  def l1Norm(a: Column): Column =
    aggregate(a, lit(0.0), (s, x) => s + abs(x))

  def lInfNorm(a: Column): Column = array_max(transform(a, abs(_)))

  def manhattan(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), (s, e) => s + e)

  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, e) => s + e))

  def chebyshev(a: Column, b: Column): Column =
    array_max(zip_with(a, b, (x, y) => abs(x - y)))

  /** CanberraEvaluator (commons-math3 CanberraDistance: 0/0 terms are 0). */
  def canberra(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      when(abs(x) + abs(y) === 0, lit(0.0)).otherwise(abs(x - y) / (abs(x) + abs(y)))),
      lit(0.0), (s, e) => s + e)

  /** FrequencyTableEvaluator (commons-math3 Frequency): per-value count
    * and percentage — one grouped aggregation + a broadcast total. */
  def frequencyTable(df: DataFrame, valCol: String): DataFrame = {
    val counts = df.groupBy(col(valCol).as("value")).agg(count(lit(1)).as("cnt"))
    val total = broadcast(counts.agg(sum("cnt").as("__total")))
    counts.crossJoin(total)
      .select(col("value"), col("cnt"),
        (col("cnt") / col("__total")).as("pct"))
  }

  /** ModeEvaluator: the most frequent value; ties canonicalized to the
    * SMALLEST value (StatUtils.mode returns all tied modes — this is its
    * deterministic single-value projection). */
  def mode(df: DataFrame, valCol: String): DataFrame =
    df.groupBy(col(valCol).cast("double").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("value"))
      .limit(1)
      .select(col("value").as("mode"))

  /** HistogramEvaluator: `bins` equal-width bins over [min, max] (the
    * commons-math3 EmpiricalDistribution binning the reference wraps);
    * the max value clamps into the last bin. */
  def histogram(df: DataFrame, valCol: String, bins: Int): DataFrame = {
    val mm = df.agg(min(col(valCol).cast("double")).as("lo"),
      max(col(valCol).cast("double")).as("hi")).head()
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = (hi - lo) / bins
    df.select(least(floor((col(valCol) - lit(lo)) / lit(width)).cast("int"),
        lit(bins - 1)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** OutliersEvaluator: rows whose cdf falls below `low` or above `hi`
    * under the supplied distribution cdf column. */
  def outliers(df: DataFrame, valCol: String, cdf: Column => Column,
               low: Double, hi: Double): DataFrame = {
    val c = cdf(col(valCol).cast("double"))
    df.withColumn("cdf", c).filter(col("cdf") < low || col("cdf") > hi)
  }

  /** MinMaxScaleEvaluator: scale a series to [0,1] (per-series, narrow). */
  def minMaxScale(a: Column): Column = {
    val lo = array_min(a)
    val hi = array_max(a)
    transform(a, x => (x - lo) / (hi - lo))
  }

  /** NormalizeSumEvaluator: scale a series to sum to 1. */
  def normalizeSum(a: Column): Column = {
    val s = aggregate(a, lit(0.0), (acc, x) => acc + x)
    transform(a, x => x / s)
  }

  // ---------------------------------------------------------------------
  // Array-column UDF forms of the per-series kernels (narrow transforms).
  // ---------------------------------------------------------------------

  val movingAvgUdf = udf((xs: Seq[Double], w: Int) => movingAvg(xs.toArray, w).toSeq)
  val movingMadUdf = udf((xs: Seq[Double], w: Int) => movingMad(xs.toArray, w).toSeq)
  val findDelayUdf = udf((a: Seq[Double], b: Seq[Double]) => findDelay(a.toArray, b.toArray))
  val movingMedianUdf = udf((xs: Seq[Double], w: Int) => movingMedian(xs.toArray, w).toSeq)
  val expMovingAvgUdf = udf((xs: Seq[Double], w: Int) => expMovingAvg(xs.toArray, w).toSeq)
  val timeDiffUdf = udf((xs: Seq[Double], lag: Int) => timeDiff(xs.toArray, lag).toSeq)
  val fftMagUdf = udf((xs: Seq[Double]) => {
    val (re, im) = fft(xs.toArray)
    re.indices.map(i => math.sqrt(re(i) * re(i) + im(i) * im(i))).toSeq
  })
  val convolveUdf = udf((a: Seq[Double], b: Seq[Double]) =>
    convolve(a.toArray, b.toArray).toSeq)
  val polyFitUdf = udf((x: Seq[Double], y: Seq[Double], deg: Int) =>
    polyFit(x.toArray, y.toArray, deg).toSeq)
  val polyFitPredictUdf = udf((x: Seq[Double], y: Seq[Double], deg: Int) => {
    val c = polyFit(x.toArray, y.toArray, deg)
    x.map(polyEval(c, _))
  })
  val splineDerivUdf = udf((x: Seq[Double], y: Seq[Double]) =>
    splineDerivative(x.toArray, y.toArray).toSeq)
  val integrateUdf = udf((x: Seq[Double], y: Seq[Double], lo: Double, hi: Double) =>
    integrateSpline(x.toArray, y.toArray, lo, hi))
  val loessUdf = udf((x: Seq[Double], y: Seq[Double], bw: Double) =>
    loess(x.toArray, y.toArray, bw).toSeq)
  val gaussFitUdf = udf((x: Seq[Double], y: Seq[Double]) =>
    gaussFit(x.toArray, y.toArray)._2.toSeq)
  val harmonicFitUdf = udf((x: Seq[Double], y: Seq[Double]) =>
    harmonicFit(x.toArray, y.toArray)._2.toSeq)
}
