package graft.query

import graft.codec.SmallFloat

/**
 * Pluggable similarity surface — the reference's `search/similarities`
 * package (Similarity.scorer() → SimScorer.score(freq, norm)), which lets
 * one index serve BM25, classic TF-IDF, or language-model ranking without
 * re-indexing: norms encode the doc length the same way for all of them
 * (`SimilarityBase.java:177-189` shares BM25's `SmallFloat.intToByte4`
 * encoding, which is exactly what the index's `normByte` column stores).
 *
 * A [[SimScorer]] is the per-term scoring kernel: immutable, a few hundred
 * bytes, built once on the driver from broadcast stats and shipped inside
 * task closures (the Spark analogue of Lucene building a Weight up front).
 * Every engine path — exhaustive top-k, WAND block bounds, theta pruning —
 * consumes only `score(freq, normByte)`, so any monotone-in-freq /
 * antitone-in-length similarity plugs into all of them.
 */
trait SimScorer extends Serializable {
  /** Score one (term, doc) hit from its term frequency and norm byte. */
  def score(freq: Float, normByte: Byte): Float
}

/** Factory for per-term scorers (reference Similarity.scorer()). */
trait Similarity extends Serializable {
  def scorer(boost: Float, docFreq: Long, totalTermFreq: Long,
             docCount: Long, sumTotalTermFreq: Long): SimScorer

  /** True when [[scorer]] reads `totalTermFreq` — the engine then fetches
    * (df, ttf) for query terms instead of the df-only cached lookup. */
  def needsTtf: Boolean = false
}

/** BM25 (the default — exact Lucene BM25Similarity arithmetic, [[BM25]]). */
final case class Bm25Sim(k1: Float = BM25.DefaultK1,
                         b: Float = BM25.DefaultB) extends Similarity {
  def scorer(boost: Float, docFreq: Long, totalTermFreq: Long,
             docCount: Long, sumTotalTermFreq: Long): SimScorer =
    BM25.termScorer(boost, k1, b, docFreq, docCount, sumTotalTermFreq)
}

/**
 * ClassicSimilarity — Lucene's TF-IDF
 * (`ClassicSimilarity.java:39-63`, `TFIDFSimilarity.java:516-526,543-549`):
 *
 *   idf          = (float)(ln((docCount+1)/(docFreq+1)) + 1)
 *   queryWeight  = boost * idf                       // idf applied ONCE
 *   tf(freq)     = (float) sqrt(freq)
 *   normTable(i) = (float)(1/sqrt(byte4ToInt(i)))    // i in 1..255
 *   normTable(0) = 1 / normTable(255)                // reference quirk
 *   score        = tf(freq) * queryWeight * normTable(normByte)
 */
case object ClassicSim extends Similarity {
  private val NormTable: Array[Float] = {
    val t = new Array[Float](256)
    var i = 1
    while (i < 256) {
      t(i) = (1.0 / Math.sqrt(SmallFloat.byte4ToInt(i.toByte).toDouble)).toFloat
      i += 1
    }
    t(0) = 1f / t(255)
    t
  }

  private final case class Scorer(queryWeight: Float) extends SimScorer {
    def score(freq: Float, normByte: Byte): Float = {
      val raw = Math.sqrt(freq.toDouble).toFloat * queryWeight
      raw * NormTable(normByte & 0xFF)
    }
  }

  def scorer(boost: Float, docFreq: Long, totalTermFreq: Long,
             docCount: Long, sumTotalTermFreq: Long): SimScorer = {
    val idf = (Math.log((docCount + 1) / (docFreq + 1).toDouble) + 1.0).toFloat
    Scorer(boost * idf)
  }
}

/** BooleanSimilarity (`BooleanSimilarity.java`): score = boost for every
  * match — tf, norms, and collection stats are all ignored (the "filter
  * scoring" model; Lucene's ConstantScoreQuery cousin at the similarity
  * level). */
case object BooleanSim extends Similarity {
  private final case class Scorer(boost: Float) extends SimScorer {
    def score(freq: Float, normByte: Byte): Float = boost
  }
  def scorer(boost: Float, docFreq: Long, totalTermFreq: Long,
             docCount: Long, sumTotalTermFreq: Long): SimScorer = Scorer(boost)
}

/**
 * LMDirichletSimilarity — Bayesian-smoothed language model
 * (`LMDirichletSimilarity.java:73-78`, collection model
 * `LMSimilarity.java:148-156`, norm decode `SimilarityBase.java:177-229`):
 *
 *   p(w|C)  = (totalTermFreq + 1) / (sumTotalTermFreq + 1)      // double
 *   score   = boost * (ln(1 + freq/(mu*p)) + ln(mu/(dl + mu)))  // double
 *   clipped at 0 BEFORE the float cast; dl = byte4ToInt(normByte)
 */
final case class LMDirichletSim(mu: Float = 2000f) extends Similarity {
  override def needsTtf: Boolean = true

  private final case class Scorer(boost: Float, collProb: Double, mu0: Float)
      extends SimScorer {
    def score(freq: Float, normByte: Byte): Float = {
      val dl = SmallFloat.byte4ToInt(normByte).toDouble
      val s = boost * (Math.log(1 + freq / (mu0 * collProb)) +
        Math.log(mu0 / (dl + mu0)))
      (if (s > 0.0d) s else 0.0d).toFloat
    }
  }

  def scorer(boost: Float, docFreq: Long, totalTermFreq: Long,
             docCount: Long, sumTotalTermFreq: Long): SimScorer =
    Scorer(boost, (totalTermFreq + 1d) / (sumTotalTermFreq + 1d), mu)
}

/**
 * DFRSimilarity with the I(n)·L·H2 combination — the classic "InL2"
 * divergence-from-randomness model (`DFRSimilarity.java:110-114`,
 * `BasicModelIn.java:33-43`, `AfterEffectL.java:32-34`,
 * `NormalizationH2.java:58-60`):
 *
 *   tfn   = freq · log2(1 + c·avgdl/dl)            // H2, c default 1
 *   A     = log2((N+1)/(df+0.5))                   // I(n)
 *   score = boost · A · 1.0 · (1 − 1/(1+tfn))      // L: aeTimes1pTfn = 1
 *
 * avgdl = sumTotalTermFreq/docCount in double (`SimilarityBase.java:112`);
 * dl decodes from the shared norm byte like every SimilarityBase model.
 */
final case class DfrInL2Sim(c: Float = 1f) extends Similarity {
  require(c > 0f, s"H2 normalization needs c > 0, got $c")
  private val Log2 = Math.log(2)

  private final case class Scorer(boost: Float, a: Double, avgdl: Double, c0: Float)
      extends SimScorer {
    def score(freq: Float, normByte: Byte): Float = {
      val dl = SmallFloat.byte4ToInt(normByte).toDouble
      val tfn = freq * (Math.log(1 + c0 * avgdl / dl) / Math.log(2))
      (boost * (a * (1 - 1 / (1 + tfn)))).toFloat
    }
  }

  def scorer(boost: Float, docFreq: Long, totalTermFreq: Long,
             docCount: Long, sumTotalTermFreq: Long): SimScorer = {
    val a = Math.log((docCount + 1) / (docFreq + 0.5)) / Log2
    Scorer(boost, a, sumTotalTermFreq / docCount.toDouble, c)
  }
}

/**
 * LMJelinekMercerSimilarity — linear-interpolation smoothing
 * (`LMJelinekMercerSimilarity.java:63-68`; same collection model and norm
 * decode as Dirichlet):
 *
 *   score = boost * ln(1 + ((1-λ)·freq/dl) / (λ·p(w|C)))    // double
 *
 * always positive (no clip needed); λ≈0.1 suits short queries, ≈0.7 long
 * ones (the reference javadoc's guidance).
 */
final case class LMJelinekMercerSim(lambda: Float = 0.1f) extends Similarity {
  require(lambda > 0f && lambda <= 1f, s"lambda must be in (0,1], got $lambda")
  override def needsTtf: Boolean = true

  private final case class Scorer(boost: Float, collProb: Double, l: Float)
      extends SimScorer {
    def score(freq: Float, normByte: Byte): Float = {
      val dl = SmallFloat.byte4ToInt(normByte).toDouble
      (boost * Math.log(1 + ((1 - l) * freq / dl) / (l * collProb))).toFloat
    }
  }

  def scorer(boost: Float, docFreq: Long, totalTermFreq: Long,
             docCount: Long, sumTotalTermFreq: Long): SimScorer =
    Scorer(boost, (totalTermFreq + 1d) / (sumTotalTermFreq + 1d), lambda)
}
