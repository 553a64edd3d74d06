package graft.analysis

/**
 * Pluggable index-time analysis chain — the reference's
 * Analyzer/TokenFilter surface (lucene/core/src/java/org/apache/lucene/
 * analysis/Analyzer.java createComponents: a tokenizer followed by a
 * filter pipeline), re-expressed as pure functions over the token stream.
 *
 * Position semantics follow the reference exactly:
 *  - StopFilter (analysis/StopFilter.java:28 + FilteringTokenFilter):
 *    removed tokens leave POSITION HOLES — the next surviving token keeps
 *    its absolute position (posIncrement accumulates over removals), so
 *    phrase queries still see the gap.
 *  - SynonymFilter (analysis/synonym/SynonymGraphFilter.java single-token
 *    case): injected synonyms share the original token's position
 *    (posIncrement 0) and are marked as overlaps.
 *  - Doc length for norms counts non-overlap tokens only —
 *    BM25Similarity's default discountOverlaps=true
 *    (search/similarities/BM25Similarity.java:72, setDiscountOverlaps).
 */
trait TokenFilter extends Serializable {
  /** `overlap(i)` marks injected (posIncrement==0) tokens; filters must
    * return the matching overlap flags alongside the tokens. */
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean])
}

/** Drop stop words; surviving tokens keep their absolute positions
  * (position holes where stop words sat — StopFilter semantics). */
final case class StopFilter(stopwords: Set[String]) extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val keep = tokens.indices.filterNot(i => stopwords.contains(tokens(i).term))
    (keep.map(tokens), keep.map(overlaps))
  }
}

/** Stem every term with the Porter algorithm; positions unchanged
  * (PorterStemFilter semantics). */
case object PorterStemFilter extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = Porter.stem(t.term))), overlaps)
}

/** Index-time single-token synonym injection: for a term with mapped
  * synonyms, emit the original PLUS each synonym at the SAME position,
  * marked as overlaps (posIncrement 0). */
final case class SynonymFilter(synonyms: Map[String, Seq[String]]) extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Seq.newBuilder[Token]
    val outO = Seq.newBuilder[Boolean]
    tokens.indices.foreach { i =>
      val t = tokens(i)
      outT += t; outO += overlaps(i)
      synonyms.getOrElse(t.term, Nil).foreach { s =>
        outT += Token(s, t.pos); outO += true
      }
    }
    (outT.result(), outO.result())
  }
}

/**
 * The analysis chain: the standard tokenizer ([[Analyzer]]: UAX#29 subset
 * + lowercase) followed by the configured filters. `AnalyzerChain(Nil)`
 * is bit-compatible with the bare [[Analyzer]] (the round-1/2 default).
 */
final case class AnalyzerChain(filters: Seq[TokenFilter]) extends Serializable {

  /** Tokens (with positions) after the whole chain. */
  def analyze(text: String): Seq[Token] = analyzeWithOverlaps(text)._1

  def analyzeWithOverlaps(text: String): (Seq[Token], Seq[Boolean]) = {
    val base = Analyzer.analyze(text)
    filters.foldLeft((base, base.map(_ => false))) { case ((ts, os), f) => f(ts, os) }
  }

  def terms(text: String): Seq[String] = analyze(text).map(_.term)

  /** Per-doc (term -> tf, docLength) through the chain. dl counts
    * non-overlap tokens only (discountOverlaps=true); tf counts every
    * occurrence including injected synonyms (they are real postings). */
  def termFreqs(text: String): (scala.collection.Map[String, Int], Int) = {
    if (filters.isEmpty) return Analyzer.termFreqs(text) // allocation-light hot path
    val (tokens, overlaps) = analyzeWithOverlaps(text)
    val m = new java.util.HashMap[String, Int](64)
    var dl = 0
    var i = 0
    while (i < tokens.length) {
      if (!overlaps(i)) dl += 1
      m.merge(tokens(i).term, 1, (a, b) => a + b)
      i += 1
    }
    (scala.jdk.CollectionConverters.MapHasAsScala(m).asScala, dl)
  }
}

object AnalyzerChain {
  /** StandardAnalyzer default: empty stop set, no stemming. */
  val standard: AnalyzerChain = AnalyzerChain(Nil)

  /** EnglishAnalyzer-style: stop + Porter stem (the common configured
    * chain; reference analysis/en/EnglishAnalyzer.java). */
  def english(stopwords: Set[String]): AnalyzerChain =
    AnalyzerChain(Seq(StopFilter(stopwords), PorterStemFilter))

  /** Persistable config (the index's self-describing schema analogue —
    * queries must analyze through the SAME chain the index was built
    * with). Restricted to analyzed-token vocabulary: no JSON escaping. */
  def toJson(chain: AnalyzerChain): String = {
    def word(w: String): String = {
      require(!w.exists(c => c == '"' || c == '\\'), s"unserializable token: $w")
      "\"" + w + "\""
    }
    val fs = chain.filters.map {
      case StopFilter(sw) =>
        s"""{"type":"stop","words":[${sw.toSeq.sorted.map(word).mkString(",")}]}"""
      case PorterStemFilter => """{"type":"porter"}"""
      case SynonymFilter(m) =>
        val entries = m.toSeq.sortBy(_._1).map { case (k, vs) =>
          s"${word(k)}:[${vs.map(word).mkString(",")}]"
        }
        s"""{"type":"synonym","map":{${entries.mkString(",")}}}"""
    }
    s"""{"filters":[${fs.mkString(",")}]}"""
  }

  def fromJson(json: String): AnalyzerChain = {
    val filterRe = """\{"type":"(stop|porter|synonym)"[^}]*(?:\{[^}]*\})?[^}]*\}""".r
    val wordsRe = """"([^"]+)"""".r
    val filters = filterRe.findAllMatchIn(json).map { m =>
      val body = m.matched
      m.group(1) match {
        case "porter" => PorterStemFilter
        case "stop" =>
          val arr = body.substring(body.indexOf('['), body.indexOf(']') + 1)
          StopFilter(wordsRe.findAllMatchIn(arr).map(_.group(1)).toSet)
        case "synonym" =>
          val mapBody = body.substring(body.indexOf("\"map\":{") + 7, body.lastIndexOf('}'))
          val entryRe = """"([^"]+)":\[([^\]]*)\]""".r
          SynonymFilter(entryRe.findAllMatchIn(mapBody).map { e =>
            e.group(1) -> wordsRe.findAllMatchIn(e.group(2)).map(_.group(1)).toSeq
          }.toMap)
      }
    }.toSeq
    AnalyzerChain(filters)
  }
}
