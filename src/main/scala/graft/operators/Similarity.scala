package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (ARRAY<FLOAT>): brute-force
 * cosine top-k as the exact baseline, and a random-hyperplane (sign-LSH)
 * bucketed variant as the scale path — candidates only within matching
 * sketch buckets, so the join is keyed, never all-pairs.
 *
 * All arithmetic is double-accumulated in array order (zip_with + aggregate,
 * codegen'd) — deterministic across partitionings.
 */
object Similarity extends Serializable {

  /** dot(a,b) accumulated in double, in element order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm2(a) * norm2(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Shared exact-rescore tail: cosine vs a literal query vector, bounded
    * heap top-k with (cos DESC, id ASC) tie-break. */
  private def rescoreTopK(candidates: DataFrame, idCol: String, vecCol: String,
                          query: Array[Float], k: Int): DataFrame = {
    val q = array(query.toIndexedSeq.map(v => lit(v)): _*)
    candidates.select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Driver-side cosine over raw arrays (ragged-tolerant: min length). */
  private def cosineArr(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /**
   * Brute-force cosine top-k against one query vector: broadcast the query
   * in the plan (it is a literal array), score every row, bounded-heap
   * top-k (TakeOrderedAndProject). Exact baseline for ANN recall tests.
   */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame =
    rescoreTopK(embs, idCol, vecCol, query, k)

  /** All-rows cosine against one query vector (no top-k; oracle-friendly). */
  def cosineAll(embs: DataFrame, idCol: String, vecCol: String,
                query: Array[Float]): DataFrame = {
    val q = array(query.toIndexedSeq.map(v => lit(v)): _*)
    embs.select(col(idCol), round(cosine(col(vecCol), q), 5).as("cos"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 mapped to [-1, 1). Pure column arithmetic, no RNG state. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (xxhash64(lit(plane), dim).cast("double") / lit(Long.MaxValue.toDouble))

  /**
   * Sign sketch: `planes` bits, bit p = sign(v · h_p) for pseudo-random
   * hyperplane h_p. Docs with equal sketches are cosine-similar candidates.
   */
  def withSignSketch(embs: DataFrame, vecCol: String, planes: Int): DataFrame = {
    // the sketch is packed into ONE long — 65+ planes would silently shift
    // past bit 63 and produce a wrong (aliased) sketch
    require(planes >= 1 && planes <= 64,
      s"sign sketch packs bits into a single long: planes must be in [1, 64], got $planes")
    val sketchBits = (0 until planes).map { p =>
      val proj = aggregate(
        zip_with(col(vecCol), sequence(lit(0), size(col(vecCol)) - 1),
          (v, i) => v.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    embs.withColumn("sketch", sketchBits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /**
   * Persisted sign-sketch ANN index: the sketch column computed ONCE and
   * cached/persistable — the scale path. At 100 TB this DataFrame is a
   * written table partitioned/bucketed by `sketch`, so each query's probe
   * reads only matching buckets instead of re-sketching the whole corpus
   * per query (which [[annTopK]] used to do).
   */
  /** Memo: (canonicalized source plan, idCol, vecCol, planes) -> persisted
    * index. Without it every call would persist() a NEW cached RDD and leak
    * executor memory across repeated builds in one session (the DfCache
    * pattern; a written bucketed table plays this role on a cluster). */
  private val signIndexMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, String, Int), DataFrame]

  def signIndex(embs: DataFrame, idCol: String, vecCol: String, planes: Int): DataFrame =
    signIndexMemo.getOrElseUpdate(
      (embs.queryExecution.analyzed.canonicalized, idCol, vecCol, planes),
      withSignSketch(embs, vecCol, planes)
        .select(col(idCol), col(vecCol), col("sketch"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** ANN top-k against a prebuilt [[signIndex]]: probe the query's bucket
    * plus all buckets at hamming distance 1, rescore exactly. */
  def annTopKIndexed(sketched: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], planes: Int, k: Int): DataFrame = {
    // compute the query's sketch with the SAME column arithmetic to avoid
    // any driver/executor hash divergence: single-row DataFrame
    val spark = sketched.sparkSession
    import spark.implicits._
    val qDf = Seq(Tuple1(query)).toDF(vecCol)
    val qRow = withSignSketch(qDf, vecCol, planes).select("sketch").head().getLong(0)
    val probeBuckets = qRow +: (0 until planes).map(p => qRow ^ (1L << p))
    rescoreTopK(sketched.filter(col("sketch").isin(probeBuckets: _*)),
      idCol, vecCol, query, k)
  }

  /**
   * ANN top-k via sign-LSH with multi-probe fallback — one-shot convenience
   * over [[signIndex]] + [[annTopKIndexed]]. Callers issuing many queries
   * should build the index once and reuse it.
   */
  def annTopK(embs: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], planes: Int, k: Int): DataFrame =
    annTopKIndexed(withSignSketch(embs, vecCol, planes), idCol, vecCol, query, planes, k)

  /**
   * IVF (inverted-file) ANN index: k-means-lite centroids (deterministic
   * seeded init from existing vectors, `iters` Lloyd rounds as DataFrame
   * aggregations), every vector assigned to its nearest centroid. At query
   * time only the `nprobe` nearest centroid lists are scanned and rescored
   * exactly — the classic IVF-Flat scale path (candidate scan is keyed by
   * centroid id, never all-rows).
   *
   * Returns (assignments DataFrame with `centroid` column, centroid array).
   */
  def ivfIndex(embs: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int = 2): (DataFrame, Array[Array[Double]]) = {
    val spark = embs.sparkSession
    import spark.implicits._
    // deterministic init without collecting all ids: k smallest by a seeded
    // hash of the id — only k rows ever reach the driver
    var centroids: Array[Array[Double]] = embs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(k)
      .select("v").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    if (centroids.isEmpty)
      return (embs.select(col(idCol), lit(0).as("centroid"), col(vecCol)).limit(0), Array.empty)

    def nearestCentroid(vec: Seq[Float], cs: Array[Array[Double]]): Int = {
      val varr = new Array[Double](vec.length)
      var i = 0
      while (i < vec.length) { varr(i) = vec(i).toDouble; i += 1 }
      var best = 0; var bestSim = Double.MinValue
      var c = 0
      while (c < cs.length) {
        val sim = cosineArr(varr, cs(c))
        if (sim > bestSim) { bestSim = sim; best = c }
        c += 1
      }
      best
    }

    for (_ <- 0 until iters) {
      val cs = centroids
      val dims = cs(0).length
      // new centroid = mean of member vectors, via ONE typed vector-sum
      // aggregator (buffer = dims+1 doubles, last slot the member count):
      // a per-dimension sum() column would generate `dims` catalyst
      // expressions — codegen-hostile and driver-plan bloat at 512-1536-d.
      // Quantized to 1e-6 so partial-sum order (partitioning-dependent for
      // double addition) cannot flip assignments except exactly at a
      // quantization boundary.
      val sums = embs.select(col(vecCol))
        .as[Seq[Float]]
        .map { v => (nearestCentroid(v, cs), v) }
        .groupByKey(_._1)
        .agg(new VecSumCount(dims).toColumn.name("s"))
        .collect()
      val next = cs.clone()
      sums.foreach { case (c, s) =>
        val cnt = s(dims)
        if (cnt > 0)
          next(c) = Array.tabulate(dims)(i => math.rint(s(i) / cnt * 1e6) / 1e6)
      }
      centroids = next
    }
    val cs = centroids
    // persisted: this IS the IVF index — without it every query would
    // recompute the full assignment scan, defeating the keyed probe
    val assignments = embs.select(col(idCol), col(vecCol))
      .as[(Long, Seq[Float])]
      .map { case (id, v) => (id, nearestCentroid(v, cs), v.toArray) }
      .toDF(idCol, "centroid", vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (assignments, centroids)
  }

  /** IVF query: probe the `nprobe` centroids nearest to the query, exact
    * cosine rescoring of their member lists, bounded top-k. */
  def ivfTopK(assignments: DataFrame, centroids: Array[Array[Double]],
              idCol: String, vecCol: String,
              query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val qarr = query.map(_.toDouble)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (i, cosineArr(qarr, c)) }
      .sortBy(-_._2).take(nprobe).map(_._1)
    rescoreTopK(assignments.filter(col("centroid").isin(probes.toIndexedSeq: _*)),
      idCol, vecCol, query, k)
  }

  /** Element-wise vector sum + count in one buffer (dims+1 doubles): the
    * scale-safe centroid-update aggregate — map-side combinable, constant
    * plan size regardless of dimensionality. */
  private final class VecSumCount(dims: Int)
      extends org.apache.spark.sql.expressions.Aggregator[(Int, Seq[Float]), Array[Double], Seq[Double]] {
    def zero: Array[Double] = new Array[Double](dims + 1)
    def reduce(b: Array[Double], a: (Int, Seq[Float])): Array[Double] = {
      val v = a._2
      var i = 0
      val n = math.min(dims, v.length)
      while (i < n) { b(i) += v(i); i += 1 }
      b(dims) += 1
      b
    }
    def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i <= dims) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Double]): Seq[Double] = r.toIndexedSeq
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Pairwise cosine for co-bucketed pairs (see Dedup.embeddingNearDup). */
  def bucketedPairs(embs: DataFrame, idCol: String, vecCol: String,
                    planes: Int): DataFrame = {
    val sk = withSignSketch(embs, vecCol, planes)
    sk.as("a").join(sk.as("b"),
        col("a.sketch") === col("b.sketch") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), 5).as("cos"))
  }
}
