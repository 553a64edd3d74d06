package graft.query

import graft.index.{BlockRow, CorpusStats}
import graft.codec.PostingsCodec
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One scored posting: `ti` is the query-term index (fixed summation order). */
final case class ScoredPosting(docId: Long, ti: Int, score: Float)

/**
 * BM25 top-k query execution over the packed postings table, mirroring the
 * reference's query lifecycle (SURVEY.md §3.1) Spark-first:
 *
 *  - "rewrite + createWeight" = driver-side: look up per-term stats with a
 *    pushed-down filter on the postings/termstats tables (a few rows), build
 *    [[BM25.TermScorer]]s once, ship them in closures (broadcast stats).
 *  - "per-leaf scorers" = `filter(term IN qs)` on the blocks DataFrame
 *    (Parquet min/max pruning skips non-matching row groups because blocks
 *    are written term-sorted), then a typed mapPartitions decodes blocks to
 *    (docId, termIdx, score).
 *  - "TopScoreDocCollector + TopDocs.merge" = orderBy(score DESC, docId ASC)
 *    .limit(k): Spark's TakeOrderedAndProject runs a bounded per-partition
 *    heap and merges on the driver — the per-executor-heap pattern.
 *  - "block-max WAND" = a rank-identity-safe two-phase prune: phase A scores
 *    the single highest-upper-bound block per term (achieved partial scores
 *    are lower bounds of true doc scores), takes the k-th best as theta;
 *    phase B skips blocks whose upper bound (block max + other terms' global
 *    max) cannot reach theta. Surviving scores are unchanged, so ranks are
 *    identical to the exhaustive path (cf. reference WANDScorer.java:45,
 *    MaxScoreCache.java:61-105 — pruning only skips non-competitive docs).
 *
 * Summation contract for multi-term scores: per-term float scores are summed
 * in query-term order as double, cast to float at the end (the reference's
 * DisjunctionSumScorer sums sub-scorer floats into a double).
 */
object QueryEngine {

  sealed trait Mode
  case object Or extends Mode
  case object And extends Mode

  /** BooleanQuery.maxClauseCount / IndexSearcher default (reference
    * search/IndexSearcher.java getMaxClauseCount). */
  val MaxClauseCount = 1024

  final case class TermInfo(term: String, ti: Int, scorer: SimScorer, globalMaxScore: Float)

  /** Per-index term-dictionary memo: term -> Some(df) | None (term absent).
    * Lucene keeps the term dictionary hot in memory; here each queried
    * term's stats row is fetched once per index and every later query
    * plans WITHOUT a Spark job — the dominant fixed cost of small top-k
    * queries (one lookup job per query otherwise). Bounded by the number
    * of distinct queried terms. */
  type DfCache = scala.collection.concurrent.Map[String, Option[Long]]
  def newDfCache(): DfCache = scala.collection.concurrent.TrieMap.empty

  /** Look up df for the terms, through the memo when one is supplied. */
  def lookupDfs(termstats: DataFrame, terms: Seq[String],
                dfCache: Option[DfCache]): Map[String, Long] = {
    val qs = terms.distinct
    val cached: Map[String, Option[Long]] =
      dfCache.map(c => qs.flatMap(t => c.get(t).map(t -> _)).toMap).getOrElse(Map.empty)
    val missing = qs.filterNot(cached.contains)
    val fetched: Map[String, Long] =
      if (missing.isEmpty) Map.empty
      else termstats.filter(col("term").isin(missing: _*))
        .select("term", "df").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    dfCache.foreach(c => missing.foreach(t => c.update(t, fetched.get(t))))
    cached.collect { case (t, Some(df)) => t -> df } ++ fetched
  }

  /** Look up (df, ttf) for query terms and build scorers. Terms absent from
    * the index are dropped (they match nothing). `sim` picks the scoring
    * model (default BM25); a `needsTtf` similarity (LMDirichlet's collection
    * model) fetches (df, ttf) directly, bypassing the df-only memo. */
  def plan(termstats: DataFrame, stats: CorpusStats, terms: Seq[String],
           k1: Float = BM25.DefaultK1, b: Float = BM25.DefaultB, boost: Float = 1f,
           dfCache: Option[DfCache] = None,
           sim: Similarity = null): Seq[TermInfo] = {
    val similarity = if (sim == null) Bm25Sim(k1, b) else sim
    val qs = terms.distinct
    val found: Map[String, (Long, Long)] =
      if (similarity.needsTtf)
        termstats.filter(col("term").isin(qs: _*))
          .select("term", "df", "ttf").collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      else lookupDfs(termstats, qs, dfCache).map { case (t, df) => t -> (df, 0L) }
    qs.zipWithIndex.collect { case (t, i) if found.contains(t) =>
      val (df, ttf) = found(t)
      val scorer = similarity.scorer(boost, df, ttf, stats.docCount, stats.sumTotalTermFreq)
      // global max score of a term: tf -> inf, shortest doc (norm byte 0..)
      // conservative: score with the best possible impact (freq=Int.Max, norm=0)
      TermInfo(t, i, scorer, scorer.score(Int.MaxValue.toFloat, 0.toByte))
    }
  }

  /** The explain and hot-tier codegen paths read BM25 internals (weight,
    * norm cache) and are wired for the default similarity only. */
  private def asBm25(s: SimScorer): BM25.TermScorer = s match {
    case t: BM25.TermScorer => t
    case other => throw new IllegalArgumentException(
      s"this path supports the BM25 similarity only, got ${other.getClass.getSimpleName}")
  }

  /** Upper bound of any doc's score within a block, from competitive impacts. */
  def blockBound(scorer: SimScorer, impactFreqs: Array[Int], impactNorms: Array[Byte]): Float = {
    var m = 0f
    var i = 0
    while (i < impactFreqs.length) {
      val s = scorer.score(impactFreqs(i).toFloat, impactNorms(i))
      if (s > m) m = s
      i += 1
    }
    m
  }

  /** Decode + score matching blocks into (docId, ti, score) rows.
    * `boundFilter` (bound, term) => keep is applied before decoding. */
  private def scoredPostings(spark: SparkSession, blocks: Dataset[BlockRow], infos: Seq[TermInfo],
                             theta: Float): Dataset[ScoredPosting] = {
    import spark.implicits._
    val byTerm = infos.map(ti => ti.term -> ti).toMap
    // per-term sum of the OTHER terms' maxima, accumulated in double (a
    // float subtraction sumAll - own could round BELOW the true sum of the
    // others, over-pruning a theta-tying block)
    val otherMax: Map[String, Double] = infos.map { i =>
      i.term -> infos.filterNot(_.term == i.term).map(_.globalMaxScore.toDouble).sum
    }.toMap
    // compare against nextDown(theta): a doc whose exact double sum is just
    // under theta can still round UP to exactly theta as a float and enter
    // the heap on the docId tie-break — never prune those
    val thetaGuard = math.nextDown(theta.toDouble)
    blocks
      .filter($"term".isin(infos.map(_.term): _*))
      .mapPartitions { it =>
        it.flatMap { b =>
          val info = byTerm(b.term)
          val bound = blockBound(info.scorer, b.impactFreqs, b.impactNorms)
          // block can contribute to a >= theta doc only if its own bound plus
          // every other term's global max reaches theta
          if (theta > 0f && bound.toDouble + otherMax(b.term) < thetaGuard) Iterator.empty
          else {
            val (docs, tfs) = PostingsCodec.decodeBlock(b.minDoc, b.n, b.wDocs, b.wFreqs, b.docGaps, b.freqs)
            (0 until b.n).iterator.map { i =>
              ScoredPosting(docs(i), info.ti, info.scorer.score(tfs(i).toFloat, b.norms(i)))
            }
          }
        }
      }
  }

  /** Sum per-term float scores in term order as double, cast float. */
  private def combinedScore: Column =
    aggregate(
      sort_array(col("parts")),
      lit(0.0d),
      (acc, x) => acc + x.getField("score").cast("double")
    ).cast("float").as("score")

  /**
   * Top-k BM25. Returns (docId LONG, score FLOAT), ordered
   * (score DESC, docId ASC), exactly k rows or fewer.
   */
  /** `excludeDocs`: live-docs tombstones (Lucene liveDocs semantics —
    * excluded from results, but collection/term stats still count them
    * until a merge reclaims; so surviving docs' scores are UNCHANGED by a
    * delete). Forces the exhaustive path (per-bucket WAND heaps would
    * under-fill k if filtered after the fact). */
  def topK(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame, stats: CorpusStats,
           terms: Seq[String], k: Int, mode: Mode = Or, mustNot: Seq[String] = Nil,
           prune: Boolean = false, wand: Boolean = false,
           excludeDocs: Option[DataFrame] = None,
           dfCache: Option[DfCache] = None,
           sim: Similarity = null): DataFrame = {
    import spark.implicits._
    val infos = plan(termstats, stats, terms, dfCache = dfCache, sim = sim)
    if (infos.isEmpty || (mode == And && infos.size < terms.distinct.size))
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    if (wand && mustNot.isEmpty && excludeDocs.isEmpty)
      return Wand.topK(spark, blocks, infos, k, requireAll = mode == And)

    // single-term fast path: each posting IS the doc's full score, so the
    // per-doc groupBy (a full shuffle of matched postings) is skipped —
    // bit-identical by the summation contract ((0.0 + s) cast float == s).
    // The dominant query class costs one narrow scan + bounded heap.
    if (infos.size == 1 && mustNot.isEmpty) {
      // pruning must also be OFF under tombstones (excludeDocs): theta is
      // estimated over ALL docs including deleted ones, so after the
      // anti-join it could exceed the true live k-th score and prune blocks
      // holding live top-k docs (same hazard the mustNot guard covers below)
      val theta1 = if (prune && excludeDocs.isEmpty) estimateTheta(spark, blocks, infos, k) else 0f
      val scored1 = scoredPostings(spark, blocks, infos, theta1)
        .select($"docId", $"score")
      val live1 = excludeDocs match {
        case Some(dead) => scored1.join(
          dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
        case None => scored1
      }
      return live1.orderBy(desc("score"), asc("docId")).limit(k)
    }

    // pruning must be OFF when mustNot or tombstones are present: theta
    // estimated over all docs includes ones the anti-join later removes, so
    // it could exceed the true post-exclusion k-th score and prune surviving
    // docs' blocks
    val theta = if (prune && mode == Or && mustNot.isEmpty && excludeDocs.isEmpty)
      estimateTheta(spark, blocks, infos, k) else 0f
    val scored = scoredPostings(spark, blocks, infos, theta)

    val grouped = scored
      .groupBy("docId")
      .agg(collect_list(struct($"ti", $"score")).as("parts"))
    val filtered = mode match {
      case Or  => grouped
      case And => grouped.filter(size($"parts") === infos.size)
    }
    val withScore = filtered.select($"docId", combinedScore)

    val excluded = if (mustNot.isEmpty) withScore else {
      val negInfos = plan(termstats, stats, mustNot, dfCache = dfCache)
      if (negInfos.isEmpty) withScore
      else {
        val negDocs = scoredPostings(spark, blocks, negInfos, 0f).select("docId").distinct()
        withScore.join(negDocs, Seq("docId"), "left_anti")
      }
    }
    val live = excludeDocs match {
      case Some(dead) => excluded.join(
        dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
      case None => excluded
    }
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /**
   * BlendedTermQuery (reference lucene/core search/BlendedTermQuery.java:
   * 265-295): score several terms AS IF they shared one document frequency
   * — df = max over the terms' dfs, ttf = sum (:273-281, adjustFrequencies)
   * — so cross-field/synonym variants with rarer spellings aren't
   * over-rewarded by idf. Each term keeps its own boost; sub-scores merge
   * via DisjunctionMax with `tieBreaker` (DISJUNCTION_MAX_REWRITE, the
   * default, tie 0.01) or as a SHOULD boolean sum (BOOLEAN_REWRITE,
   * `dismax = false`). Same plan shape as topK's exhaustive path: one
   * term-pruned postings scan, one per-doc group, bounded heap.
   */
  def blendedTopK(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                  stats: CorpusStats, terms: Seq[(String, Float)], k: Int,
                  tieBreaker: Float = 0.01f, dismax: Boolean = true,
                  dfCache: Option[DfCache] = None,
                  excludeDocs: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val found = lookupDfs(termstats, terms.map(_._1), dfCache)
    val present = terms.filter { case (t, _) => found.getOrElse(t, 0L) > 0L }
    if (present.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    val dfBlend = present.map { case (t, _) => found(t) }.max
    val infos = present.zipWithIndex.map { case ((t, boost), i) =>
      val scorer = Bm25Sim().scorer(boost, dfBlend, 0L, stats.docCount, stats.sumTotalTermFreq)
      TermInfo(t, i, scorer, scorer.score(Int.MaxValue.toFloat, 0.toByte))
    }
    val grouped = scoredPostings(spark, blocks, infos, 0f)
      .groupBy("docId")
      .agg(collect_list(struct($"ti", $"score")).as("parts"))
    val combined =
      if (dismax) {
        // DisjunctionMaxScorer.score: float max, double sum, then
        // (float)(max + (sum - max) * tie)
        val subs = transform(col("parts"), p => p.getField("score"))
        val mx = array_max(subs).cast("double")
        val sm = aggregate(sort_array(col("parts")), lit(0.0d),
          (acc, x) => acc + x.getField("score").cast("double"))
        grouped.select($"docId",
          (mx + (sm - mx) * lit(tieBreaker.toDouble)).cast("float").as("score"))
      } else grouped.select($"docId", combinedScore)
    val live = excludeDocs match {
      case Some(dead) => combined.join(
        dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
      case None => combined
    }
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /**
   * Per-doc combined scores of the FULL match set — the topK grouped-sum
   * path without order/limit. Feeds ranking stages where a second additive
   * clause (e.g. a [[FeatureFunction]] static boost) can promote docs from
   * outside any text-only top-k, so the base scores must not be truncated
   * first. Same float arithmetic as topK's exhaustive path (ti-ordered
   * double accumulation cast float).
   */
  def scoresAll(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                stats: CorpusStats, terms: Seq[String], mode: Mode = Or,
                dfCache: Option[DfCache] = None, sim: Similarity = null): DataFrame = {
    import spark.implicits._
    val infos = plan(termstats, stats, terms, dfCache = dfCache, sim = sim)
    if (infos.isEmpty || (mode == And && infos.size < terms.distinct.size))
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    val grouped = scoredPostings(spark, blocks, infos, 0f)
      .groupBy("docId")
      .agg(collect_list(struct($"ti", $"score")).as("parts"))
    val filtered = mode match {
      case Or  => grouped
      case And => grouped.filter(size($"parts") === infos.size)
    }
    filtered.select($"docId", combinedScore)
  }

  /** Phase A of the prune: fully score the single best block per term; the
    * k-th best achieved partial score is a valid lower bound of the true
    * k-th score (partial <= true). */
  private def estimateTheta(spark: SparkSession, blocks: Dataset[BlockRow],
                            infos: Seq[TermInfo], k: Int): Float = {
    import spark.implicits._
    val byTerm = infos.map(ti => ti.term -> ti).toMap
    // per term, the (minDoc) key of the block with the highest upper bound
    val bounds = blocks
      .filter($"term".isin(infos.map(_.term): _*))
      .select($"term", $"minDoc", $"impactFreqs", $"impactNorms")
      .as[(String, Long, Array[Int], Array[Byte])]
      .map { case (t, minDoc, fs, ns) => (t, minDoc, blockBound(byTerm(t).scorer, fs, ns)) }
      .toDF("term", "minDoc", "bound")
    val bestKeys = bounds.groupBy("term").agg(max_by(col("minDoc"), col("bound")).as("minDoc"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    if (bestKeys.isEmpty) return 0f
    val bestBlocks = blocks.filter($"term".isin(infos.map(_.term): _*))
      .filter(b => bestKeys.contains((b.term, b.minDoc)))
    val partials = scoredPostings(spark, bestBlocks, infos, 0f)
      .groupBy("docId").agg(sum(col("score").cast("double")).cast("float").as("s"))
      .orderBy(desc("s")).limit(k)
      .collect()
    // nextDown: the partial sum's accumulation order (Spark sum(double)) can
    // exceed the canonical ti-ordered sum by an ulp; theta must stay a true
    // lower bound of the k-th score
    if (partials.length < k) 0f else math.nextDown(partials.last.getFloat(1))
  }

  /**
   * Positional paging (IndexSearcher.searchAfter / TopScoreDocCollector
   * paging, reference TopScoreDocCollector.java:95-160): page N+1 = the
   * top-k among docs strictly AFTER the last hit of page N in the global
   * (score DESC, docId ASC) order — i.e. score < after.score, or equal
   * score and docId > after.docId. Pages are disjoint and their
   * concatenation equals one big topK (tested).
   */
  def topKAfter(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                stats: CorpusStats, terms: Seq[String], k: Int,
                afterScore: Float, afterDocId: Long,
                mode: Mode = Or, excludeDocs: Option[DataFrame] = None,
                dfCache: Option[DfCache] = None): DataFrame = {
    import spark.implicits._
    val infos = plan(termstats, stats, terms, dfCache = dfCache)
    if (infos.isEmpty || (mode == And && infos.size < terms.distinct.size))
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    val grouped = scoredPostings(spark, blocks, infos, 0f)
      .groupBy("docId")
      .agg(collect_list(struct($"ti", $"score")).as("parts"))
    val filtered = mode match {
      case Or  => grouped
      case And => grouped.filter(size($"parts") === infos.size)
    }
    // tombstones excluded BEFORE the limit(k): otherwise pages over an index
    // with deletes would return deleted docs / under-fill (same invariant as
    // topK — concatenation of pages must equal one big topK over live docs)
    val live = excludeDocs match {
      case Some(dead) => filtered.join(
        dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
      case None => filtered
    }
    live.select($"docId", combinedScore)
      .filter($"score" < afterScore ||
        ($"score" === afterScore && $"docId" > afterDocId))
      .orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** All matching docs scored with caller-built TermInfos: (docId, score),
    * no order/limit — shared by [[topKWithInfos]] and the single-pass
    * top-k+count used by search-job previews. */
  def scoredDocsWithInfos(spark: SparkSession, blocks: Dataset[BlockRow],
                          infos: Seq[TermInfo],
                          excludeDocs: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val grouped = scoredPostings(spark, blocks, infos, 0f)
      .groupBy("docId")
      .agg(collect_list(struct($"ti", $"score")).as("parts"))
    val live = excludeDocs match {
      case Some(dead) => grouped.join(
        dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
      case None => grouped
    }
    live.select($"docId", combinedScore)
  }

  /** OR top-k with caller-built TermInfos (pre-merged stats — used by the
    * time-bucketed index, where collection stats merge across buckets). */
  def topKWithInfos(spark: SparkSession, blocks: Dataset[BlockRow],
                    infos: Seq[TermInfo], k: Int,
                    excludeDocs: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    if (infos.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    scoredDocsWithInfos(spark, blocks, infos, excludeDocs)
      .orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** Top-k AND total matching-doc count in ONE job (search-job previews
    * need both per bucket; a separate count() job would double per-bucket
    * work): each partition folds its scored docs into a bounded worst-out
    * heap plus a counter, the driver merges the tiny per-partition states.
    * Same (score DESC, docId ASC) order as [[topKWithInfos]]. */
  def topKWithInfosAndCount(spark: SparkSession, blocks: Dataset[BlockRow],
                            infos: Seq[TermInfo], k: Int): (Seq[(Long, Float)], Long) = {
    import spark.implicits._
    if (infos.isEmpty) return (Nil, 0L)
    // worst-first ordering: lowest score, then highest docId dequeues first
    implicit val worstFirst: Ordering[(Long, Float)] =
      Ordering.by { case (id, s) => (-s, id) }
    val partials = scoredDocsWithInfos(spark, blocks, infos, None)
      .as[(Long, Float)]
      .mapPartitions { it =>
        var n = 0L
        val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Float)]
        it.foreach { r =>
          n += 1
          heap.enqueue(r)
          if (heap.size > k) heap.dequeue(): Unit
        }
        Iterator.single((n, heap.toArray))
      }
      .collect()
    val hits = partials.iterator.flatMap(_._2)
      .toArray.sortBy { case (id, s) => (-s, id) }.take(k).toSeq
    (hits, partials.iterator.map(_._1).sum)
  }

  /** Lucene TotalHits (reference search/TotalHits.java): `value` is the
    * exact hit count when `exact`, else a valid lower bound (the
    * GREATER_THAN_OR_EQUAL_TO relation). */
  final case class TotalHits(value: Long, exact: Boolean)

  /**
   * TopScoreDocCollector's totalHitsThreshold contract (reference
   * TopScoreDocCollector.java:49-95,233: hits are counted exactly while
   * the count is within the threshold; beyond it the collector may skip
   * non-competitive docs and the count degrades to a lower bound).
   *
   * The mapping onto block-max pruning decides UP FRONT from dictionary
   * stats: a single term's count is its df (free, from the dictionary);
   * multi-term counts are bounded by Σdf (Or) / min df (And), and when
   * that bound fits the threshold (or threshold is Int.MaxValue) the
   * engine counts exhaustively and reports EXACT. Otherwise the Or path
   * prunes with theta and reports the decoded-doc count as a GTE lower
   * bound. The bound class is always sound; it equals Lucene's whenever
   * the df bound is decisive (it is conservative-GTE where Lucene's
   * per-hit counter could still prove EQ on overlapping multi-term
   * matches).
   */
  def topKWithTotal(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                    stats: CorpusStats, terms: Seq[String], k: Int, mode: Mode = Or,
                    totalHitsThreshold: Int = 1000,
                    dfCache: Option[DfCache] = None): (Seq[(Long, Float)], TotalHits) = {
    import spark.implicits._
    val infos = plan(termstats, stats, terms, dfCache = dfCache)
    if (infos.isEmpty || (mode == And && infos.size < terms.distinct.size))
      return (Nil, TotalHits(0L, exact = true))
    val noLimit = totalHitsThreshold == Int.MaxValue
    val dfs = lookupDfs(termstats, infos.map(_.term), dfCache)
    if (infos.size == 1) {
      val df = dfs(infos.head.term)
      val hits = topK(spark, blocks, termstats, stats, terms, k, mode,
        prune = !noLimit && df > totalHitsThreshold, dfCache = dfCache)
        .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
      // the dictionary df IS the exact count; the bound class still follows
      // the reference rule (EQ iff the count fits the threshold)
      return (hits, TotalHits(df, exact = noLimit || df <= totalHitsThreshold))
    }
    val dfBound = mode match {
      case Or  => infos.map(i => dfs(i.term)).sum
      case And => infos.map(i => dfs(i.term)).min
    }
    val exhaustive = noLimit || dfBound <= totalHitsThreshold
    val theta = if (!exhaustive && mode == Or) estimateTheta(spark, blocks, infos, k) else 0f
    val scored = scoredPostings(spark, blocks, infos, theta)
    val grouped = scored.groupBy("docId")
      .agg(collect_list(struct($"ti", $"score")).as("parts"))
    val filtered = mode match {
      case Or  => grouped
      case And => grouped.filter(size($"parts") === infos.size)
    }
    implicit val worstFirst: Ordering[(Long, Float)] =
      Ordering.by { case (id, s) => (-s, id) }
    val partials = filtered.select($"docId", combinedScore).as[(Long, Float)]
      .mapPartitions { it =>
        var n = 0L
        val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Float)]
        it.foreach { r =>
          n += 1
          heap.enqueue(r)
          if (heap.size > k) heap.dequeue(): Unit
        }
        Iterator.single((n, heap.toArray))
      }
      .collect()
    val hits = partials.iterator.flatMap(_._2)
      .toArray.sortBy { case (id, s) => (-s, id) }.take(k).toSeq
    val n = partials.iterator.map(_._1).sum
    // theta == 0 means nothing was skipped: the count is exact even on the
    // not-provably-small path (And mode, or an Or whose estimate was 0)
    (hits, TotalHits(n, exact = theta == 0f && (noLimit || n <= totalHitsThreshold)))
  }

  /** Single-term BM25 scores over all matching docs (no limit): the leaf
    * frame of composed boolean evaluation ([[Searcher]]). (docId, score). */
  def termScores(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                 stats: CorpusStats, term: String,
                 dfCache: Option[DfCache] = None): DataFrame = {
    import spark.implicits._
    val infos = plan(termstats, stats, Seq(term), dfCache = dfCache)
    if (infos.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    scoredPostings(spark, blocks, infos, 0f).select($"docId", $"score")
  }

  /** Dictionary-expanded matching docIds (no limit, no order): the
    * constant-score rewrite core shared by multiTermTopK and the parser's
    * prefix/wildcard/fuzzy/range leaves. Expansion capped at
    * [[MaxClauseCount]] highest-df terms. */
  def multiTermDocs(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                    termPred: Column): DataFrame = {
    import spark.implicits._
    val expanded = termstats.filter(termPred)
      .orderBy(desc("df"), asc("term")).limit(MaxClauseCount)
      .select("term").as[String].collect().toSeq
    if (expanded.isEmpty)
      return spark.range(0).select($"id".as("docId"))
    blocks.filter($"term".isin(expanded: _*))
      .mapPartitions { it =>
        it.flatMap { b =>
          val (docs, _) = PostingsCodec.decodeBlock(b.minDoc, b.n, b.wDocs, b.wFreqs, b.docGaps, b.freqs)
          docs.iterator.take(b.n)
        }
      }
      .toDF("docId").distinct()
  }

  /** Per-doc phrase frequency (number of consecutive-match start positions)
    * over the positions tier; slot i matches any of its terms.
    *
    * ONE shuffle regardless of phrase length: the positions of ALL slots'
    * terms are read in one pruned scan, each occurrence is tagged with the
    * slots its term serves (a tiny broadcast (term, slot) table — a term
    * can serve several slots), and a single groupBy(docId) builds every
    * slot's adjusted-position list as a conditional collect_list. The old
    * shape (per-slot groupBy + N-way join) cost one shuffle per slot —
    * a 5-term phrase on common terms was 5 shuffles + 4 joins. */
  def phraseFreqs(positions: DataFrame, slots: Seq[Seq[String]]): DataFrame = {
    require(slots.nonEmpty && slots.forall(_.nonEmpty))
    val spark = positions.sparkSession
    import spark.implicits._
    val termSlots = slots.zipWithIndex
      .flatMap { case (ts, i) => ts.distinct.map(t => (t, i)) }
    val lookup = broadcast(termSlots.toDF("term", "__slot"))
    val allTerms = termSlots.map(_._1).distinct
    val occ = positions.filter(col("term").isin(allTerms: _*))
      .join(lookup, "term")
      .select(col("docId"), col("__slot"), explode(col("poss")).as("__p"))
    val slotLists = slots.indices.map(i =>
      collect_list(when(col("__slot") === i, col("__p") - i)).as(s"p$i"))
    val joined = occ.groupBy("docId").agg(slotLists.head, slotLists.tail: _*)
      .filter(slots.indices.map(i => size(col(s"p$i")) > 0).reduce(_ && _))
    val starts = (1 until slots.length).foldLeft(col("p0")) { (acc, i) =>
      array_intersect(acc, col(s"p$i"))
    }
    joined.select(col("docId"), size(starts).as("freq")).filter(col("freq") > 0)
  }

  /** docIds matching the terms (Or = any, And = all) as a constant-score
    * filter — the match-only half of a query, used by field-sorted top-k
    * (the "filter query + sort by doc values" shape). */
  def matchingDocs(spark: SparkSession, blocks: Dataset[BlockRow],
                   terms: Seq[String], mode: Mode = Or): DataFrame = {
    import spark.implicits._
    val qs = terms.distinct
    val rows = blocks.filter($"term".isin(qs: _*))
      .mapPartitions { it =>
        it.flatMap { b =>
          val (docs, _) = PostingsCodec.decodeBlock(b.minDoc, b.n, b.wDocs, b.wFreqs, b.docGaps, b.freqs)
          docs.iterator.take(b.n).map(d => (b.term, d))
        }
      }.toDF("term", "docId")
    mode match {
      case Or  => rows.select("docId").distinct()
      case And => rows.distinct().groupBy("docId").agg(count("*").as("__nt"))
        .filter(col("__nt") === qs.size).select("docId")
    }
  }

  /**
   * SynonymQuery top-k (reference search/SynonymQuery.java:50-55,203-217):
   * the synonym terms are scored as ONE pseudo-term — a doc matches if it
   * contains ANY of them, the similarity is invoked a single time on the
   * SUMMED term frequency, and the pseudo-term stats merge as
   * df = max(df_i) (ttf summed — unused by BM25). Per-doc summed tf is an
   * exact integer; the norm byte is per-doc, identical across member terms.
   * Returns (docId, syn_tf, score) ordered (score DESC, docId ASC).
   */
  def synonymTopK(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                  stats: CorpusStats, synonyms: Seq[String], k: Int,
                  boost: Float = 1f, excludeDocs: Option[DataFrame] = None,
                  dfCache: Option[DfCache] = None): DataFrame = {
    import spark.implicits._
    val qs = synonyms.distinct
    val found = lookupDfs(termstats, qs, dfCache)
    if (found.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0).as("syn_tf"), lit(0f).as("score"))
    val scorer = BM25.termScorer(boost, BM25.DefaultK1, BM25.DefaultB,
      found.values.max, stats.docCount, stats.sumTotalTermFreq)
    val rows = blocks.filter($"term".isin(found.keys.toSeq: _*))
      .mapPartitions { it =>
        it.flatMap { b =>
          val (docs, tfs) = PostingsCodec.decodeBlock(b.minDoc, b.n, b.wDocs, b.wFreqs, b.docGaps, b.freqs)
          (0 until b.n).iterator.map(i => (docs(i), tfs(i), b.norms(i)))
        }
      }.toDF("docId", "tf", "normByte")
    val grouped = rows.groupBy("docId")
      .agg(sum($"tf").cast("int").as("syn_tf"), first($"normByte").as("normByte"))
    // tombstones excluded before the limit (liveDocs; stats unchanged)
    val live = excludeDocs match {
      case Some(dead) => grouped.join(
        dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
      case None => grouped
    }
    live.select($"docId", $"syn_tf",
        graft.functions.Bm25Score($"syn_tf", $"normByte".cast("byte"),
          scorer.weight, scorer.cache).as("score"))
      .orderBy(desc("score"), asc("docId")).limit(k)
  }

  /**
   * DisjunctionMax top-k over real per-clause BM25 scores (reference
   * search/DisjunctionMaxScorer.java:58-70): score = max sub score +
   * tieBreaker * (double) sum of the other sub scores, iterated in
   * query-term (ti) order, cast float. Returns (docId, score) ordered
   * (score DESC, docId ASC).
   */
  def disMaxTopK(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                 stats: CorpusStats, terms: Seq[String], tiebreak: Float,
                 k: Int, excludeDocs: Option[DataFrame] = None,
                 dfCache: Option[DfCache] = None): DataFrame = {
    import spark.implicits._
    val infos = plan(termstats, stats, terms, dfCache = dfCache)
    if (infos.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    val scored = scoredPostings(spark, blocks, infos, 0f)
      .groupByKey(_.docId)
      .mapGroups { (doc, it) =>
        val parts = it.toArray.sortBy(_.ti)
        // exact DisjunctionMaxScorer.score loop: running float max, the
        // displaced max and non-max subs accumulate into a double sum
        var scoreMax = 0f
        var otherSum = 0.0
        parts.foreach { p =>
          if (p.score >= scoreMax) { otherSum += scoreMax; scoreMax = p.score }
          else otherSum += p.score
        }
        (doc, (scoreMax + otherSum * tiebreak).toFloat)
      }
      .toDF("docId", "score")
    val live = excludeDocs match {
      case Some(dead) => scored.join(
        dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
      case None => scored
    }
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /**
   * Score explanation (IndexSearcher.explain / BM25Similarity.explain
   * analogue, reference search/IndexSearcher.java explain +
   * BM25Similarity.java explainScore): one row per query term matching
   * `docId`, carrying every scoring component with the exact arithmetic of
   * the scoring path — so sum(term_score) double-accumulated in ti order,
   * cast float, equals the topK score bit-for-bit (tested).
   */
  def explain(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
              stats: CorpusStats, terms: Seq[String], docId: Long): DataFrame = {
    import spark.implicits._
    val infos = plan(termstats, stats, terms)
    val byTerm = infos.map(i => i.term -> i).toMap
    val k1 = BM25.DefaultK1
    val b = BM25.DefaultB
    blocks
      .filter($"term".isin(infos.map(_.term): _*) &&
        $"minDoc" <= docId && $"maxDoc" >= docId)
      .flatMap { blk =>
        val (docs, tfs) = PostingsCodec.decodeBlock(blk.minDoc, blk.n, blk.wDocs, blk.wFreqs, blk.docGaps, blk.freqs)
        val i = java.util.Arrays.binarySearch(docs, 0, blk.n, docId)
        if (i < 0) Iterator.empty
        else {
          val info = byTerm(blk.term)
          val nb = blk.norms(i)
          Iterator.single((blk.term, info.ti, tfs(i), nb.toInt & 0xFF,
            graft.codec.SmallFloat.byte4ToInt(nb),
            asBm25(info.scorer).weight, k1, b,
            info.scorer.score(tfs(i).toFloat, nb)))
        }
      }
      .toDF("term", "ti", "tf", "norm_byte", "dl_quantized", "weight", "k1", "b", "term_score")
      .orderBy("ti")
  }

  /**
   * Multi-term query rewrite (PrefixQuery / WildcardQuery / RegexpQuery /
   * FuzzyQuery / TermInSetQuery — SURVEY §2.3): expand a term predicate
   * against the dictionary (a pushed-down filter on the small termstats
   * table), cap at [[MaxClauseCount]] keeping the highest-df expansions
   * (TopTermsRewrite keeps top terms; overflow past the cap raises in the
   * reference — here the cap is applied deterministically), then run a
   * CONSTANT-SCORE union: score = boost for every doc matching ANY
   * expansion (MultiTermQuery CONSTANT_SCORE rewrite). Ordered docId ASC.
   */
  def multiTermTopK(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                    termPred: Column, k: Int, boost: Float = 1f,
                    excludeDocs: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val expanded = termstats.filter(termPred)
      .orderBy(desc("df"), asc("term")).limit(MaxClauseCount)
      .select("term").as[String].collect().toSeq
    if (expanded.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(boost).as("score"))
    val matched = blocks.filter($"term".isin(expanded: _*))
      .mapPartitions { it =>
        it.flatMap { b =>
          val (docs, _) = PostingsCodec.decodeBlock(b.minDoc, b.n, b.wDocs, b.wFreqs, b.docGaps, b.freqs)
          docs.iterator.take(b.n)
        }
      }
      .toDF("docId").distinct()
    // tombstones excluded BEFORE limit(k): filtering after would under-fill
    // k whenever deleted docs rank among the k lowest matching docIds
    val live = excludeDocs match {
      case Some(dead) => matched.join(
        dead.select(col(dead.columns.head).cast("long").as("docId")), Seq("docId"), "left_anti")
      case None => matched
    }
    live.orderBy(asc("docId")).limit(k)
      .withColumn("score", lit(boost))
  }

  /**
   * Federated top-k over the packed main index PLUS un-packed HOT posting
   * rows from the streaming sink (IVrixDB's HOT->WARM->COLD search order,
   * reference MultipleBucketsSearchStream — search results are independent
   * of arrival order). Collection stats (N, avgdl, df) are merged across
   * both tiers before scorer construction, so scores are bit-identical to
   * a from-scratch build over the combined corpus (asserted in tests).
   *
   * `hot` schema: (term, docId, tf, normByte, dl) — StreamOps.hotIndexSink.
   */
  def topKWithHot(spark: SparkSession, blocks: Dataset[BlockRow], termstats: DataFrame,
                  stats: CorpusStats, hot: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    import spark.implicits._
    val qs = terms.distinct
    // merged collection stats: hot docs counted once each
    val hotDocs = hot.select("docId", "dl").distinct()
    val hr = hotDocs.agg(count("*"), sum(col("dl").cast("long"))).head()
    val mergedStats = CorpusStats(
      stats.docCount + hr.getLong(0),
      stats.sumTotalTermFreq + (if (hr.isNullAt(1)) 0L else hr.getLong(1)))
    // merged per-term df
    val mainDf = termstats.filter(col("term").isin(qs: _*))
      .select("term", "df").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hotDf = hot.filter(col("term").isin(qs: _*))
      .groupBy("term").agg(count("*").as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val infos = qs.zipWithIndex.collect {
      case (t, i) if mainDf.contains(t) || hotDf.contains(t) =>
        val df = mainDf.getOrElse(t, 0L) + hotDf.getOrElse(t, 0L)
        val scorer = BM25.termScorer(1f, BM25.DefaultK1, BM25.DefaultB,
          df, mergedStats.docCount, mergedStats.sumTotalTermFreq)
        TermInfo(t, i, scorer, scorer.score(Int.MaxValue.toFloat, 0.toByte))
    }
    if (infos.isEmpty)
      return spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
    val mainScored = scoredPostings(spark, blocks, infos, 0f)
    // HOT rows are already columnar -> score with the codegen Bm25Score
    // expression (whole-stage codegen; the term filter pushes to the scan)
    val hotScored = infos.map { info =>
      hot.filter(col("term") === info.term)
        .select(col("docId").cast("long").as("docId"), lit(info.ti).as("ti"),
          graft.functions.Bm25Score(col("tf").cast("int"), col("normByte").cast("byte"),
            asBm25(info.scorer).weight, asBm25(info.scorer).cache).as("score"))
    }.reduce(_.unionByName(_)).as[ScoredPosting]
    mainScored.union(hotScored)
      .groupBy("docId")
      .agg(collect_list(struct($"ti", $"score")).as("parts"))
      .select($"docId", combinedScore)
      .orderBy(desc("score"), asc("docId")).limit(k)
  }

  /**
   * Exact-phrase match over a positions table (docId, term, poss ARRAY<INT>):
   * docs where the terms occur at consecutive positions. Returns docIds.
   * (Reference semantics: ExactPhraseMatcher — SURVEY.md §2.3.)
   */
  def phraseMatch(positions: DataFrame, terms: Seq[String]): DataFrame =
    multiPhraseMatch(positions, terms.map(Seq(_)))

  /**
   * MultiPhraseQuery over the positions table (reference
   * search/MultiPhraseQuery.java:56): slot i matches ANY of its terms, so
   * its candidate positions are the union of the member terms' position
   * arrays (flattened per doc — a position holds one term, no duplicates).
   * Returns docIds with >= 1 consecutive match.
   */
  def multiPhraseMatch(positions: DataFrame, slots: Seq[Seq[String]]): DataFrame =
    phraseFreqs(positions, slots).select("docId")
}
