package graft.query

import graft.index.IndexStore.OpenIndex
import graft.operators.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Query-string execution against an [[OpenIndex]]: parse with
 * [[QueryParser]], map each AST node to the matching engine path, compose
 * booleans with deterministic score arithmetic. The reference analogue is
 * IndexSearcher.search(QueryParser.parse(...)) (SURVEY.md §3.1).
 *
 * Scoring contract (documented, asserted in SearcherSpec):
 *  - Term leaf: the engine's exact Lucene-arithmetic BM25 per-term score.
 *  - Exact phrase: BM25 with tf = phrase frequency and weight = double sum
 *    of the distinct member terms' idfs cast float (PhraseWeight passes all
 *    member term statistics; BM25Similarity sums their idfs).
 *  - Sloppy phrase / prefix / wildcard / fuzzy / range: constant score 1
 *    (MultiTermQuery CONSTANT_SCORE rewrite; sloppy kept constant-score).
 *  - Boolean: score = matching clauses' scores summed as double in clause
 *    order, cast float — identical arithmetic to QueryEngine.topK, so a
 *    pure-term query string scores bit-identically to the topK path.
 */
object Searcher {

  import QueryParser._

  /** Parse + rank: top-k (docId, score) with tombstones excluded before
    * the limit. */
  /** CommonTermsQuery over the index (reference lucene/queries/
    * CommonTermsQuery.java): df-split via the termstats dictionary (a
    * cached O(#terms) lookup, no corpus pass), then low-frequency terms
    * required / high-frequency optional through the boolean AST — exactly
    * the reference's rewrite into a +low / high boolean. */
  def commonTerms(idx: OpenIndex, terms: Seq[String], k: Int,
                  maxTermFrequency: Double): DataFrame = {
    val qs = terms.distinct
    require(qs.forall(_.matches("[^\\s+\\-\"(){}\\[\\]^~*?:\\\\]+")),
      "commonTerms takes analyzed terms, not query syntax")
    val dfs = QueryEngine.lookupDfs(idx.termstats, qs, Some(idx.dfCache))
    val cutoff = maxTermFrequency * idx.stats.docCount
    val (high, low) = qs.partition(t => dfs.getOrElse(t, 0L) > cutoff)
    search(idx, (low.map("+" + _) ++ high).mkString(" "), k)
  }

  def search(idx: OpenIndex, query: String, k: Int): DataFrame = {
    val scored = eval(idx, QueryParser.parse(query))
    val live = idx.deletes.fold(scored)(d => scored.join(d, Seq("docId"), "left_anti"))
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** MaxScoreQParser rewrite (reference solr/core/src/java/org/apache/solr/
    * search/MaxScoreQParser.java:34-78): parse exactly like the classic
    * parser, then delegate all top-level SHOULD clauses to ONE
    * DisjunctionMaxQuery with the given tie — only the best optional clause
    * contributes fully, the rest scaled by `tie`. MUST / MUST_NOT clauses
    * pass through as separate boolean clauses (always contribute), and a
    * top-level boost re-wraps the rewritten query. Non-boolean queries are
    * returned unchanged. */
  def maxScoreRewrite(q: Query, tie: Float): Query = q match {
    case BoostQ(b, inner) => BoostQ(b, maxScoreRewrite(inner, tie))
    case BoolQ(must, should, mustNot) if should.nonEmpty =>
      BoolQ(must, Seq(DisMaxQ(should, tie)), mustNot)
    case other => other
  }

  /** Parse + rank under the MaxScore rewrite (Solr `{!maxscore tie=...}`). */
  def searchMaxScore(idx: OpenIndex, query: String, k: Int, tie: Float = 0f): DataFrame = {
    val scored = eval(idx, maxScoreRewrite(QueryParser.parse(query), tie))
    val live = idx.deletes.fold(scored)(d => scored.join(d, Seq("docId"), "left_anti"))
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** GraphTermsQParser (reference solr/core/src/java/org/apache/solr/search/
    * GraphTermsQParserPlugin.java:73-155): constant-score disjunction over
    * the given terms, SKIPPING every term whose document frequency exceeds
    * `maxDocFreq` — the graph-traversal frontier query that refuses to
    * expand through super-nodes. The df probe is a cached termstats lookup
    * (O(#terms), no corpus pass); the surviving terms ride the same pushed
    * dictionary-predicate scan as every multi-term query. */
  def graphTerms(idx: OpenIndex, terms: Seq[String], maxDocFreq: Long): DataFrame = {
    val dfs = QueryEngine.lookupDfs(idx.termstats, terms, Some(idx.dfCache))
    val keep = terms.distinct.filter(t => dfs.get(t).exists(_ <= maxDocFreq))
    if (keep.isEmpty) emptyScored(idx.spark)
    else constScore(idx, col("term").isin(keep: _*))
  }

  /** XML query (CoreParser dialect) search: parse via [[XmlParser]] and
    * rank like [[search]]. Span-rooted documents are rejected here — they
    * evaluate over a text column via [[graft.operators.Spans]]. */
  def searchXml(idx: OpenIndex, xml: String, k: Int): DataFrame = {
    val scored = eval(idx, XmlParser.parseScored(xml))
    val live = idx.deletes.fold(scored)(d => scored.join(d, Seq("docId"), "left_anti"))
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** [[SimpleQueryParser]] dialect search — the lenient end-user surface
    * (never throws on malformed syntax). */
  def searchSimple(idx: OpenIndex, query: String, k: Int,
                   flags: Int = SimpleQueryParser.AllOperators,
                   defaultOperator: String = "should"): DataFrame = {
    val scored = eval(idx, SimpleQueryParser.parse(query, flags, defaultOperator))
    val live = idx.deletes.fold(scored)(d => scored.join(d, Seq("docId"), "left_anti"))
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /**
   * Multi-field search (Lucene per-field inverted indexes): `field:`-scoped
   * clauses route to that field's index; unscoped clauses hit
   * `defaultField`; an unknown field matches nothing (exactly Lucene —
   * a term in an absent field has no postings). docIds are shared across
   * the per-field indexes (same corpus), so boolean composition and
   * scoring work unchanged.
   */
  def searchFielded(idxs: Map[String, OpenIndex], defaultField: String,
                    query: String, k: Int): DataFrame =
    searchFieldedAst(idxs, defaultField, QueryParser.parse(query), k)

  /** [[searchFielded]] over an already-built AST (the local-params
    * dispatcher resolves its own syntax before ranking). */
  def searchFieldedAst(idxs: Map[String, OpenIndex], defaultField: String,
                       ast: Query, k: Int): DataFrame = {
    val default = idxs.getOrElse(defaultField,
      throw new IllegalArgumentException(s"no index for default field '$defaultField'"))
    def ev(q: Query): DataFrame = q match {
      case FieldQ(f, inner) =>
        idxs.get(f).map(eval(_, inner)).getOrElse(emptyScored(default.spark))
      case BoostQ(b, inner) => ev(inner)
        .select(col("docId"), (col("score") * lit(b)).cast("float").as("score"))
      case BoolQ(m, sh, n) => evalBool(default.spark, ev, m, sh, n)
      case DisMaxQ(cs, tie) => evalDisMax(ev, cs, tie)
      case ConstQ(inner) =>
        ev(inner).select(col("docId")).distinct().withColumn("score", lit(1f))
      case leaf => eval(default, leaf)
    }
    val scored = ev(ast)
    val live = default.deletes.fold(scored)(d => scored.join(d, Seq("docId"), "left_anti"))
    live.orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** All matching docs of the parsed query: (docId LONG, score FLOAT). */
  def eval(idx: OpenIndex, q: Query): DataFrame = q match {
    // single-index search: a field prefix can only mean the one field
    case FieldQ(_, inner) => eval(idx, inner)
    // boost multiplies the child's float scores (classic setBoost)
    case BoostQ(b, inner) => eval(idx, inner)
      .select(col("docId"), (col("score") * lit(b)).cast("float").as("score"))
    case MatchAllQ =>
      idx.docstats.select(col("docId")).withColumn("score", lit(1f))
    case TermQ(t) =>
      QueryEngine.termScores(idx.spark, idx.blocks, idx.termstats, idx.stats, t,
        dfCache = Some(idx.dfCache))
    case PhraseQ(terms, 0) => phraseScores(idx, terms)
    case PhraseQ(terms, slop) => sloppyDocs(idx, terms, slop)
    case PrefixQ(p) =>
      constScore(idx, col("term").startsWith(p))
    case WildcardQ(glob) =>
      constScore(idx, col("term").rlike(TextOps.wildcardToRegex(glob)))
    case FuzzyQ(t, maxEdits) =>
      // gram-pruned expansion (FuzzyTermsEnum analogue): the dictionary
      // probe touches only the word's bigram buckets, never the full vocab
      val expanded = idx.fuzzyExpand(t, maxEdits)
      if (expanded.isEmpty) emptyScored(idx.spark)
      else constScore(idx, col("term").isin(expanded: _*))
    case RangeQ(lo, hi, inclusive) =>
      constScore(idx, if (inclusive) col("term") >= lo && col("term") <= hi
                      else col("term") > lo && col("term") < hi)
    case BoolQ(must, should, mustNot) =>
      evalBool(idx.spark, eval(idx, _), must, should, mustNot)
    case DisMaxQ(clauses, tie) => evalDisMax(eval(idx, _), clauses, tie)
    case ConstQ(inner) =>
      eval(idx, inner).select(col("docId")).distinct().withColumn("score", lit(1f))
  }

  /** DisjunctionMaxQuery combine: per-doc max + tie · (sum − max) over the
    * clause frames (reference search/DisjunctionMaxQuery.java). */
  private def evalDisMax(ev: Query => DataFrame, clauses: Seq[Query],
                         tie: Float): DataFrame = {
    require(clauses.nonEmpty, "DisMaxQ needs >= 1 clause")
    clauses.map(q => ev(q).select(col("docId"), col("score").cast("double").as("s")))
      .reduce(_.unionByName(_))
      .groupBy("docId")
      .agg(max("s").as("mx"), sum("s").as("sm"))
      .select(col("docId"),
        (col("mx") + lit(tie.toDouble) * (col("sm") - col("mx"))).cast("float").as("score"))
  }

  private def emptyScored(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.range(0).select($"id".as("docId"), lit(0f).as("score"))
  }

  private def constScore(idx: OpenIndex, termPred: org.apache.spark.sql.Column): DataFrame =
    QueryEngine.multiTermDocs(idx.spark, idx.blocks, idx.termstats, termPred)
      .withColumn("score", lit(1f))

  /** Exact phrase, BM25-scored with tf = phrase freq; weight = (float) sum
    * of distinct member-term idfs (double accumulation in first-occurrence
    * order). A member term absent from the dictionary -> no match. */
  private def phraseScores(idx: OpenIndex, terms: Seq[String]): DataFrame = {
    val qs = terms.distinct
    val found = idx.termstats.filter(col("term").isin(qs: _*))
      .select("term", "df").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (found.size < qs.size) return emptyScored(idx.spark)
    var w = 0.0
    qs.foreach(t => w += BM25.idf(found(t), idx.stats.docCount).toDouble)
    val scorer = BM25.TermScorer(w.toFloat,
      BM25.normCache(BM25.DefaultK1, BM25.DefaultB,
        BM25.avgFieldLength(idx.stats.sumTotalTermFreq, idx.stats.docCount)))
    QueryEngine.phraseFreqs(idx.positions, terms.map(Seq(_)))
      .join(idx.docstats.select(col("docId"), col("normByte")), "docId")
      .select(col("docId"),
        graft.functions.Bm25Score(col("freq").cast("int"), col("normByte").cast("byte"),
          scorer.weight, scorer.cache).as("score"))
  }

  /** Sloppy phrase over the positions tier (constant score): per doc, one
    * sorted adjusted-position list per slot; the shared min-range kernels
    * (sweep / repeats-aware DFS) decide the match. */
  private def sloppyDocs(idx: OpenIndex, phrase: Seq[String], slop: Int): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    val termIds = phrase.distinct.zipWithIndex.toMap
    val termOfSlot = phrase.map(termIds).toArray
    val hasRepeats = phrase.distinct.size != phrase.size
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      idx.positions.filter(col("term") === t)
        .select(col("docId"), transform(col("poss"), p => p - i).as(s"q$i"))
    }
    val joined = parts.reduceLeft((a, b) => a.join(b, "docId"))
    joined.select(col("docId"),
        array(phrase.indices.map(i => col(s"q$i")): _*).as("qs"))
      .as[(Long, Seq[Seq[Int]])]
      .flatMap { case (docId, lists) =>
        val best =
          if (!hasRepeats) TextOps.minRangeSweep(lists)
          else TextOps.minRangeWithRepeats(lists, termOfSlot, slop)
        if (best <= slop) Iterator.single((docId, 1f)) else Iterator.empty
      }
      .toDF("docId", "score")
  }

  /**
   * Boolean combination. Matching set: all `must` clauses AND (when must is
   * empty) at least one `should`; minus `mustNot`. Score: must clauses
   * joined in clause order (double adds), should contributions summed in
   * clause order via a sorted-struct aggregate, added when present.
   */
  private def evalBool(spark: SparkSession, ev: Query => DataFrame,
                       must: Seq[Query], should: Seq[Query],
                       mustNot: Seq[Query]): DataFrame = {
    if (must.isEmpty && should.isEmpty) return emptyScored(spark)
    // should-side: union of clauses, per-doc sum in clause (ci) order
    val shouldSum: Option[DataFrame] = if (should.isEmpty) None else Some {
      should.zipWithIndex.map { case (q, ci) =>
        ev(q).select(col("docId"), lit(ci).as("ci"), col("score"))
      }.reduce(_.unionByName(_))
        .groupBy("docId")
        .agg(collect_list(struct(col("ci"), col("score"))).as("parts"))
        .select(col("docId"),
          aggregate(sort_array(col("parts")), lit(0.0d),
            (acc, x) => acc + x.getField("score").cast("double")).as("s"))
    }
    val core: DataFrame =
      if (must.nonEmpty) {
        // inner-join chain in clause order; double accumulation
        val first = ev(must.head)
          .select(col("docId"), col("score").cast("double").as("s"))
        val joinedMust = must.tail.zipWithIndex.foldLeft(first) { case (acc, (q, i)) =>
          acc.join(ev(q).select(col("docId"), col("score").as(s"__m$i")), "docId")
            .select(col("docId"), (col("s") + col(s"__m$i").cast("double")).as("s"))
        }
        shouldSum match {
          case None => joinedMust
          case Some(ss) =>
            joinedMust.join(ss.withColumnRenamed("s", "__ss"), Seq("docId"), "left_outer")
              .select(col("docId"), (col("s") + coalesce(col("__ss"), lit(0.0d))).as("s"))
        }
      } else shouldSum.get
    val anti = mustNot.foldLeft(core) { (acc, q) =>
      acc.join(ev(q).select("docId"), Seq("docId"), "left_anti")
    }
    anti.select(col("docId"), col("s").cast("float").as("score"))
  }
}
