package graft.analysis

/**
 * Per-language analyzer presets mirroring the reference's XXAnalyzer
 * compositions (lucene/analysis/common/.../XX/XXAnalyzer.java
 * createComponents): tokenizer → (elision) → lowercase → stopwords →
 * (normalizer) → stemmer — all built from the chain's validated filters
 * and the reference's own stopword lists (re-encoded word-per-line under
 * resources/graft/stopwords).
 *
 * Documented divergences from the reference stacks (each minor and
 * inherent to the single-tokenizer chain): the tokenizer lowercases with
 * Character.toLowerCase before filters run, so Turkish dotted/dotless I
 * and Irish nEisce-style pre-lowercase rules fold the standard way; the
 * ckb and el presets run their stop list against raw lowercased tokens
 * because normalization and stemming are fused in their filters (the
 * shipped stop lists are already in normalized lowercase form).
 */
object Analyzers {

  /** The reference's per-language default stop set. */
  def stopwords(lang: String): Set[String] = {
    val in = getClass.getResourceAsStream(s"/graft/stopwords/$lang.txt")
    require(in != null, s"no stopword list for language: $lang")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toSet finally src.close()
  }

  val languages: Seq[String] = Seq("ar", "bg", "bn", "br", "ca", "cjk", "ckb",
    "cz", "da", "de", "el", "en", "es", "et", "eu", "fa", "fi", "fr", "ga",
    "gl", "hi", "hu", "hy", "id", "it", "ja", "ko", "lt", "lv", "nl", "no",
    "pt", "ro", "ru", "sv", "th", "tr", "zh")

  /** The reference XXAnalyzer stack for a language code. */
  def forLanguage(lang: String): AnalyzerChain = {
    val stop = StopFilter(stopwords(lang))
    lang match {
      case "ar" => AnalyzerChain(Seq(stop, LightStemFilter("ar_light")))
      case "bg" => AnalyzerChain(Seq(stop, LightStemFilter("bg")))
      case "bn" => AnalyzerChain(Seq(stop, LightStemFilter("bn")))
      case "br" => AnalyzerChain(Seq(stop, LightStemFilter("br")))
      case "ca" => AnalyzerChain(Seq(ElisionFilter(ElisionFilter.catalan),
        stop, SnowballStemFilter("catalan")))
      case "cjk" => AnalyzerChain(Seq(CJKWidthFilter, CJKBigramFilter(), stop))
      // morphological Japanese (the kuromoji JapaneseAnalyzer position):
      // width fold -> lattice word segmentation -> particle/aux stop list
      case "ja" => AnalyzerChain(Seq(CJKWidthFilter, MorphSegmentFilter(), stop))
      // morphological Korean (the nori KoreanAnalyzer position): width fold
      // -> lattice segmentation with compound DECOMPOUND (nori's default
      // DISCARD mode) and POS-stop of particles/suffixes/copulas/endings
      // (KoreanPartOfSpeechStopFilter) -> word stop list
      case "ko" => AnalyzerChain(Seq(CJKWidthFilter,
        MorphSegmentFilter("ko_demo", Set("J", "X", "C", "E"), "discard"), stop))
      // Chinese word segmentation (the smartcn SmartChineseAnalyzer
      // position): width fold -> lattice max-matching segmentation -> stop
      // list of function words (smartcn ships the same shape: HHMM
      // segmenter + bundled stopword list)
      case "zh" => AnalyzerChain(Seq(CJKWidthFilter,
        MorphSegmentFilter("zh_demo"), stop))
      case "ckb" => AnalyzerChain(Seq(stop, LightStemFilter("ckb")))
      case "cz" => AnalyzerChain(Seq(stop, LightStemFilter("cz")))
      case "da" => AnalyzerChain(Seq(stop, SnowballStemFilter("danish")))
      case "de" => AnalyzerChain(Seq(stop, GermanNormalizationFilter,
        LightStemFilter("de_light")))
      case "el" => AnalyzerChain(Seq(stop, LightStemFilter("el")))
      case "en" => AnalyzerChain(Seq(EnglishPossessiveFilter, stop,
        PorterStemFilter))
      case "es" => AnalyzerChain(Seq(stop, SnowballStemFilter("spanish")))
      case "et" => AnalyzerChain(Seq(stop, SnowballStemFilter("estonian")))
      case "eu" => AnalyzerChain(Seq(stop, SnowballStemFilter("basque")))
      case "fa" => AnalyzerChain(Seq(ArabicNormFilter, PersianNormFilter, stop))
      case "fi" => AnalyzerChain(Seq(stop, SnowballStemFilter("finnish")))
      case "fr" => AnalyzerChain(Seq(ElisionFilter(), stop,
        SnowballStemFilter("french")))
      case "ga" => AnalyzerChain(Seq(ElisionFilter(ElisionFilter.irish),
        stop, SnowballStemFilter("irish")))
      case "gl" => AnalyzerChain(Seq(stop, LightStemFilter("gl")))
      case "hi" => AnalyzerChain(Seq(stop, LightStemFilter("hi")))
      case "hu" => AnalyzerChain(Seq(stop, SnowballStemFilter("hungarian")))
      case "hy" => AnalyzerChain(Seq(stop, SnowballStemFilter("armenian")))
      case "id" => AnalyzerChain(Seq(stop, LightStemFilter("id")))
      case "it" => AnalyzerChain(Seq(ElisionFilter(ElisionFilter.italian),
        stop, SnowballStemFilter("italian")))
      case "lt" => AnalyzerChain(Seq(stop, SnowballStemFilter("lithuanian")))
      case "lv" => AnalyzerChain(Seq(stop, LightStemFilter("lv")))
      case "nl" => AnalyzerChain(Seq(stop, SnowballStemFilter("dutch")))
      case "no" => AnalyzerChain(Seq(stop, SnowballStemFilter("norwegian")))
      case "pt" => AnalyzerChain(Seq(stop, LightStemFilter("pt_rslp")))
      case "ro" => AnalyzerChain(Seq(stop, SnowballStemFilter("romanian")))
      case "ru" => AnalyzerChain(Seq(stop, SnowballStemFilter("russian")))
      case "sv" => AnalyzerChain(Seq(stop, SnowballStemFilter("swedish")))
      case "th" => AnalyzerChain(Seq(ThaiWordFilter, stop))
      case "tr" => AnalyzerChain(Seq(stop, SnowballStemFilter("turkish")))
      case other => throw new IllegalArgumentException(s"no analyzer preset: $other")
    }
  }
}

/** Thai word segmentation (the capability of th/ThaiTokenizer.java, which
  * delegates to a Thai-aware BreakIterator — the JDK ships the same
  * dictionary-driven Thai break data): the standard tokenizer emits Thai
  * letter RUNS as single tokens; this filter re-segments each run into
  * dictionary words at consecutive positions (downstream tokens shift,
  * like WordDelimiterFilter). Validated against the reference
  * TestThaiAnalyzer golden segmentations. */
case object ThaiWordFilter extends TokenFilter {
  @inline private def isThai(c: Char): Boolean = c >= '฀' && c <= '๿'

  private[analysis] def segment(term: String): Seq[String] = {
    val bi = java.text.BreakIterator.getWordInstance(new java.util.Locale("th"))
    bi.setText(term)
    val out = Seq.newBuilder[String]
    var start = bi.first()
    var end = bi.next()
    while (end != java.text.BreakIterator.DONE) {
      val w = term.substring(start, end).trim
      if (w.nonEmpty) out += w
      start = end; end = bi.next()
    }
    out.result()
  }

  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    var shift = 0
    tokens.indices.foreach { i =>
      val t = tokens(i)
      if (t.term.exists(isThai) && !overlaps(i)) {
        val parts = segment(t.term)
        if (parts.length <= 1) { outT += t.copy(pos = t.pos + shift); outO += false }
        else {
          parts.indices.foreach { p =>
            outT += Token(parts(p), t.pos + shift + p); outO += false
          }
          shift += parts.length - 1
        }
      } else {
        outT += t.copy(pos = t.pos + shift); outO += overlaps(i)
      }
    }
    (outT.result(), outO.result())
  }
}

/** German umlaut/e-deletion normalization (de/GermanNormalizationFilter
  * .java FSM: ä/ö/ü fold; 'e' after an umlaut-state vowel deletes;
  * ß becomes ss). Runs before GermanLightStemmer in the de preset. */
case object GermanNormalizationFilter extends TokenFilter {
  private final val N = 0; private final val V = 1; private final val U = 2
  private[analysis] def normalize(w: String): String = {
    val sb = new StringBuilder(w.length + 4)
    var state = N
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      c match {
        case 'a' | 'o' => sb += c; state = U
        case 'u' => sb += c; state = if (state == N) U else V
        case 'e' =>
          if (state != U) sb += c // e after umlaut-state deletes
          state = V
        case 'i' | 'q' | 'y' => sb += c; state = V
        case 'ä' => sb += 'a'; state = V
        case 'ö' => sb += 'o'; state = V
        case 'ü' => sb += 'u'; state = V
        case 'ß' => sb ++= "ss"; state = N
        case other => sb += other; state = N
      }
      i += 1
    }
    sb.toString
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = normalize(t.term))), overlaps)
}

/** Trailing 's (en/EnglishPossessiveFilter.java — apostrophe or its
  * typographic variants + s). */
case object EnglishPossessiveFilter extends TokenFilter {
  private def strip(w: String): String = {
    val n = w.length
    if (n >= 2 && (w.charAt(n - 1) == 's' || w.charAt(n - 1) == 'S') &&
      (w.charAt(n - 2) == '\'' || w.charAt(n - 2) == '’' ||
        w.charAt(n - 2) == '‘')) w.substring(0, n - 2)
    else w
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = strip(t.term))), overlaps)
}

/** Arabic normalization as a standalone chain filter (the fa/ar preset
  * stage; delegates to [[IndicStemmers.ArabicNormalizer]]). */
case object ArabicNormFilter extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = IndicStemmers.ArabicNormalizer.normalize(t.term))),
      overlaps)
}

/** Persian normalization as a standalone chain filter. */
case object PersianNormFilter extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = IndicStemmers.PersianNormalizer.normalize(t.term))),
      overlaps)
}
