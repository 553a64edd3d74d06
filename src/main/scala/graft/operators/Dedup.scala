package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines: exact,
 * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
 *
 * Scale design: every method is a pure DataFrame pipeline whose only
 * shuffles are keyed groupBys/joins on content-derived keys (hash buckets),
 * so candidate generation is O(n) + a co-partitioned self-join per bucket —
 * never an all-pairs cross join. At 100 TB the bucket join is the standard
 * MinHash-LSH band-bucket pattern; skewed buckets (boilerplate docs) are
 * bounded by `maxBucketSize` sampling.
 */
object Dedup {

  /** Exact dedup: keep the first doc (by `order`) of each identical-content
    * group, content keyed by md5 of the lowercased text. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    docs.withColumn("content_hash", md5(lower(col(textCol))))
      .withColumn("group_size", count("*").over(Window.partitionBy(col("content_hash"))))
      .withColumn("rn", row_number().over(w))
      .withColumn("is_kept", col("rn") === 1)
      .select(col(idCol), col("content_hash"), col("group_size"), col("is_kept"))
  }

  /** Character n-gram shingle set of a string column (distinct, sorted). */
  def charShingles(s: Column, n: Int): Column =
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (n - 1), lit(0))),
      i => s.substr(i, lit(n)))))

  /** n-gram Jaccard similarity between two string columns (char shingles). */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = charShingles(a, n)
    val sb = charShingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0, lit(1.0)).otherwise(inter / union)
  }

  /**
   * MinHash signatures over token sets. Each of `numHashes` permutations is
   * xxhash64(tok, seed) minimized over the doc's distinct tokens — one
   * narrow pass, no shuffle. Signature column: ARRAY<BIGINT>[numHashes].
   */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int): DataFrame = {
    val toks = array_distinct(TextOps.tokensOf(textCol))
    val sig = array((0 until numHashes).map { seed =>
      array_min(transform(toks, t => xxhash64(t, lit(seed))))
    }: _*)
    docs.select(col(idCol), sig.as("minhash"))
  }

  /**
   * MinHash-LSH candidate pairs: band the signature (bands × rowsPerBand =
   * numHashes), bucket-join docs sharing any band hash, then verify with the
   * estimated Jaccard (fraction of agreeing minhash components).
   * Returns (idA, idB, est_jaccard) with idA < idB, est >= threshold.
   */
  def minHashCandidates(sigs: DataFrame, idCol: String, bands: Int,
                        rowsPerBand: Int, threshold: Double): DataFrame = {
    val banded = sigs.select(
      col(idCol), col("minhash"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(slice(col("minhash"), b * rowsPerBand + 1, rowsPerBand))
      }: _*)).as(Seq("band", "bucket")))
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.minhash").as("mh_a"), col("b.minhash").as("mh_b"))
      .distinct()
    pairs.withColumn("est_jaccard",
        size(filter(zip_with(col("mh_a"), col("mh_b"), (x, y) => x === y), b => b))
          .cast("double") / size(col("mh_a")))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /**
   * SimHash (64-bit) over tokens weighted by tf: sign-sum of per-token
   * xxhash64 bits. Near-dups = pairs within `maxHamming` — candidates found
   * by banding the 64 bits into 4×16-bit chunks (pigeonhole: hamming<=3
   * pairs share at least one exact chunk).
   */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = TextOps.termFreqs(docs, idCol, textCol)
    val withHash = tf.withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"b$i")
    }
    val agg = withHash.groupBy(idCol).agg(bitCols.head, bitCols.tail: _*)
    val sh = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col(idCol), sh.as("simhash"))
  }

  /** Hamming distance between two long columns. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs via 16-bit chunk banding (exact for hamming<=3). */
  def simHashCandidates(hashes: DataFrame, idCol: String, maxHamming: Int): DataFrame = {
    val chunked = hashes.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map { c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)
      }: _*)).as(Seq("chunk", "ck")))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        hamming64(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: pairs with cosine >= threshold among LSH candidates
    * (random-hyperplane signs bucketed). See [[Similarity.cosine]]. */
  def embeddingNearDup(embs: DataFrame, idCol: String, vecCol: String,
                       planes: Int, threshold: Double): DataFrame = {
    val sketched = Similarity.withSignSketch(embs, vecCol, planes)
    val pairs = sketched.as("a").join(sketched.as("b"),
        col("a.sketch") === col("b.sketch") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        Similarity.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos"))
    pairs.filter(col("cos") >= threshold)
  }
}
