package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Phrase identification — Solr's PhrasesIdentificationComponent (reference
 * solr/core/src/java/org/apache/solr/handler/component/
 * PhrasesIdentificationComponent.java): heuristically score every
 * contiguous window of the query (length ≤ maxQueryPositionLength) as a
 * candidate "phrase", using corpus shingle statistics for windows short
 * enough to be indexed (length ≤ maxIndexedPositionLength), via the
 * component's bayesian model (computeFieldScore, reference lines 950-1047):
 *
 *   for each largest indexed sub-phrase `words` of the input:
 *     P(words|phrase)     = words_ttf / min(word_ttf)
 *     P(words|not phrase) = words_ttf / max(word_ttf)
 *     P(phrase)           = conj(input) / conj(words)  − max wrapper prob
 *     score += P(w|p)·P(p) − P(w|¬p)·(1 − P(p))
 *   score /= (1 + maxQuery − maxIndexed)
 *   score *= conj(input) / max(conj of sub-phrases, conj(input))
 *
 * then greedily keep positive-score phrases that don't overlap a
 * higher-scoring one, and mark them in a summary string.
 *
 * Spark-first shape: ALL corpus statistics (term ttf, shingle ttf/df,
 * per-candidate conjunction doc counts) come from ONE narrow partition
 * pass emitting a fixed-size counter array per partition (the candidate
 * set is O(query-length · maxQuery), tiny); scoring and selection are
 * driver-side arithmetic over those counters, exactly like the
 * reference's single searcher pass + in-memory scoring.
 */
object Phrases {

  /** One candidate window: positions [start, start+len) of the query. */
  final case class Candidate(start: Int, len: Int, terms: IndexedSeq[String]) {
    def termSet: Set[String] = terms.toSet
    def shingle: String = terms.mkString(" ")
    def containsWindow(o: Candidate): Boolean =
      start <= o.start && o.start + o.len <= start + len
  }

  final case class Scored(start: Int, len: Int, phrase: String, score: Double)

  final case class Result(all: Seq[Scored], selected: Seq[Scored], summary: String)

  private val TokenRe = java.util.regex.Pattern.compile(TextOps.TokenPattern)

  private def tokenize(s: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    val m = TokenRe.matcher(s.toLowerCase)
    while (m.find()) out += m.group()
    out.result()
  }

  /** All contiguous windows of lengths 1..maxLen. */
  def candidates(toks: IndexedSeq[String], maxLen: Int): Seq[Candidate] =
    for {
      s <- toks.indices
      l <- 1 to math.min(maxLen, toks.length - s)
    } yield Candidate(s, l, toks.slice(s, s + l))

  /**
   * Corpus statistics for the candidate set, in one narrow pass:
   *  - ttf of every distinct query term
   *  - ttf and df of every indexed shingle (len 2..maxIndexed)
   *  - conjunction doc count of every candidate's term set
   */
  def gatherStats(docs: DataFrame, textCol: String, cands: Seq[Candidate],
                  maxIndexed: Int): (Map[String, Long], Map[String, (Long, Long)], Map[Set[String], Long]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms: IndexedSeq[String] = cands.flatMap(_.terms).distinct.toIndexedSeq
    val shingles: IndexedSeq[IndexedSeq[String]] =
      cands.filter(c => c.len >= 2 && c.len <= maxIndexed).map(_.terms).distinct.toIndexedSeq
    val conjSets: IndexedSeq[Set[String]] = cands.map(_.termSet).distinct.toIndexedSeq
    val nTerm = terms.length
    val nShingle = shingles.length
    val nConj = conjSets.length
    val termIdx = terms.zipWithIndex.toMap
    // counter layout: [term ttf][shingle ttf][shingle df][conj dc]
    val width = nTerm + 2 * nShingle + nConj
    val totals = docs.select(org.apache.spark.sql.functions
        .lower(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col(textCol),
          org.apache.spark.sql.functions.lit(""))))
      .as[String]
      .mapPartitions { it =>
        val acc = new Array[Long](width)
        val shingleArrs = shingles.map(_.toArray).toArray
        val conjArrs = conjSets.map(s => s.map(termIdx).toArray).toArray
        it.foreach { text =>
          val toks = {
            val b = scala.collection.mutable.ArrayBuffer[String]()
            val m = TokenRe.matcher(text)
            while (m.find()) b += m.group()
            b
          }
          val present = new Array[Boolean](nTerm)
          toks.foreach { t =>
            termIdx.get(t).foreach { i => acc(i) += 1; present(i) = true }
          }
          var si = 0
          while (si < shingleArrs.length) {
            val sh = shingleArrs(si)
            var occ = 0L
            var i = 0
            while (i + sh.length <= toks.length) {
              var j = 0
              var ok = true
              while (ok && j < sh.length) { ok = toks(i + j) == sh(j); j += 1 }
              if (ok) occ += 1
              i += 1
            }
            if (occ > 0) {
              acc(nTerm + si) += occ
              acc(nTerm + nShingle + si) += 1
            }
            si += 1
          }
          var ci = 0
          while (ci < conjArrs.length) {
            if (conjArrs(ci).forall(present)) acc(nTerm + 2 * nShingle + ci) += 1
            ci += 1
          }
        }
        Iterator.single(acc)
      }
      .reduce { (a, b) =>
        val out = new Array[Long](width)
        var i = 0
        while (i < width) { out(i) = a(i) + b(i); i += 1 }
        out
      }
    val termTtf = terms.zipWithIndex.map { case (t, i) => t -> totals(i) }.toMap
    val shingleStats = shingles.zipWithIndex.map { case (s, i) =>
      s.mkString(" ") -> (totals(nTerm + i), totals(nTerm + nShingle + i))
    }.toMap
    val conj = conjSets.zipWithIndex.map { case (s, i) =>
      s -> totals(nTerm + 2 * nShingle + i)
    }.toMap
    (termTtf, shingleStats, conj)
  }

  /** The reference computeFieldScore arithmetic for one candidate. */
  private def fieldScore(input: Candidate, cands: Seq[Candidate],
                         termTtf: Map[String, Long],
                         shingleStats: Map[String, (Long, Long)],
                         conj: Map[Set[String], Long],
                         maxIndexed: Int, maxQuery: Int): Double = {
    val inputConj = conj(input.termSet)
    if (inputConj <= 0) return -1.0
    if (input.len <= 1) return 0.0
    // largest indexed sub-phrases: all windows of length maxIndexed, or
    // the input itself when it is shorter than maxIndexed
    val words: Seq[Candidate] =
      if (input.len < maxIndexed) Seq(input)
      else cands.filter(w => w.len == maxIndexed && input.containsWindow(w))
    var score = 0.0
    var maxSubConj = inputConj
    words.foreach { w =>
      val wConj = conj(w.termSet)
      maxSubConj = math.max(maxSubConj, wConj)
      // indexed super phrases of w: indexed candidates strictly containing w
      val maxWrapperProb = cands.iterator
        .filter(p => p.len <= maxIndexed && p.containsWindow(w) &&
          !(p.start == w.start && p.len == w.len))
        .map { p =>
          val pConj = conj(p.termSet)
          if (pConj <= 0) 0.0
          else shingleStats(p.shingle)._2.toDouble / pConj
        }
        .foldLeft(0.0)(math.max)
      val ttfs = w.terms.map(termTtf)
      val wTtf = shingleStats(w.shingle)._1
      val phraseProb = inputConj.toDouble / wConj
      val pWordsPhrase = wTtf / ttfs.min.toDouble
      val pWordsNotPhrase = wTtf / ttfs.max.toDouble
      val phraseScore = pWordsPhrase * (phraseProb - maxWrapperProb)
      val notPhraseScore = pWordsNotPhrase * (1 - (phraseProb - maxWrapperProb))
      score += phraseScore - notPhraseScore
    }
    score *= 1.0 / (1 + maxQuery - maxIndexed)
    score *= inputConj.toDouble / maxSubConj
    score
  }

  /** Run the full component: score, select (greedy positive non-overlap in
    * descending score order), summarize with `pre`/`post` markers. */
  def identify(docs: DataFrame, textCol: String, input: String,
               maxIndexed: Int = 2, maxQuery: Int = 3,
               pre: String = "{", post: String = "}"): Result = {
    require(maxIndexed <= maxQuery, "maxIndexed must be <= maxQuery")
    val toks = tokenize(input)
    if (toks.isEmpty) return Result(Nil, Nil, input)
    val cands = candidates(toks, maxQuery)
    val (termTtf, shingleStats, conj) = gatherStats(docs, textCol, cands, maxIndexed)
    val all = cands.map { c =>
      Scored(c.start, c.len, c.shingle,
        fieldScore(c, cands, termTtf, shingleStats, conj, maxIndexed, maxQuery))
    }
    // extraction order is (start asc, len asc); Java's stable sort keeps it
    // among score ties
    val valid = all.filter(_.score > 0.0).sortBy(s => -s.score)
    val covered = scala.collection.mutable.BitSet()
    val selected = valid.filter { s =>
      val ps = s.start until (s.start + s.len)
      if (ps.exists(covered)) false
      else { covered ++= ps; true }
    }
    // summary: mark each selected phrase in the tokenized input, position
    // order (the reference splices at char offsets of the original input;
    // this engine's analyzer offsets ARE the token positions of the regex
    // tokenizer, so the summary re-joins marked tokens)
    val byStart = selected.sortBy(_.start)
    val sb = new StringBuilder
    var pos = 0
    byStart.foreach { s =>
      while (pos < s.start) { sb.append(toks(pos)); sb.append(' '); pos += 1 }
      sb.append(pre)
      sb.append(toks.slice(s.start, s.start + s.len).mkString(" "))
      sb.append(post)
      pos = s.start + s.len
      if (pos < toks.length) sb.append(' ')
    }
    while (pos < toks.length) {
      sb.append(toks(pos))
      if (pos + 1 < toks.length) sb.append(' ')
      pos += 1
    }
    Result(all, selected, sb.result())
  }

  /** All-candidate scores as a DataFrame (position_start, position_end,
    * phrase, score) — the driver-oracle surface; selection/summary are
    * deterministic driver-side steps covered by PhrasesSpec. */
  def scoresDf(spark: SparkSession, docs: DataFrame, textCol: String,
               input: String, maxIndexed: Int = 2, maxQuery: Int = 3): DataFrame = {
    import spark.implicits._
    val r = identify(docs, textCol, input, maxIndexed, maxQuery)
    r.all.map(s => (s.start, s.start + s.len, s.phrase,
        BigDecimal(s.score).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("position_start", "position_end", "phrase", "score")
  }
}
