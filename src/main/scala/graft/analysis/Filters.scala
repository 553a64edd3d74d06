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

/** Snowball stemming for a configured language (the reference's
  * SnowballFilter over the generated org.tartarus stemmers — here the
  * re-derived [[Snowball]] algorithms, vocabulary-validated). Positions
  * unchanged. */
final case class SnowballStemFilter(lang: String) extends TokenFilter {
  private[analysis] def stemmerFn: String => String = stemmer
  private val stemmer: String => String = lang match {
    case "german"     => Snowball.German.stem
    case "german2"    => Snowball.German2.stem
    case "spanish"    => Snowball.Spanish.stem
    case "french"     => Snowball.French.stem
    case "italian"    => Snowball.Italian.stem
    case "portuguese" => Snowball.Portuguese.stem
    case "danish"     => Snowball.Danish.stem
    case "norwegian"  => Snowball.Norwegian.stem
    case "swedish"    => Snowball.Swedish.stem
    case "dutch"      => Snowball.Dutch.stem
    case "russian"    => Snowball.Russian.stem
    case "romanian"   => Snowball.Romanian.stem
    case "finnish"    => Snowball.Finnish.stem
    case "hungarian"  => Snowball.Hungarian.stem
    case "turkish"    => Snowball.Turkish.stem
    case "arabic"     => Snowball.Arabic.stem
    case "lovins"     => Snowball.Lovins.stem
    case "kp"         => Snowball.KraaijPohlmann.stem
    case "irish"      => Snowball.Irish.stem
    case "armenian"   => Snowball.Armenian.stem
    case "lithuanian" => Snowball.Lithuanian.stem
    case "basque"     => Snowball.Basque.stem
    case "catalan"    => Snowball.Catalan.stem
    case "estonian"   => Snowball.Estonian.stem
    // SnowballFilter("English") is Porter2; the classic 1980 Porter stays
    // behind PorterStemFilter (Lucene's PorterStemFilter)
    case "english"    => Snowball.English.stem
    case other => throw new IllegalArgumentException(s"unsupported snowball language: $other")
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = stemmer(t.term))), overlaps)
}

/** Krovetz dictionary-validated stemming (en/KStemFilter.java over the
  * re-derived [[KStem]]); positions unchanged. */
case object KStemFilter extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = KStem.stem(t.term))), overlaps)
}

/** Hunspell affix-dictionary stemming (hunspell/HunspellStemFilter.java:49
  * over the re-derived [[Hunspell]] engine). Every dictionary stem of a
  * token is emitted: the first replaces the token and the rest are
  * injected at the same position (posIncrement 0, matching the
  * reference's buffered-stem emission); words the dictionary doesn't
  * know pass through unchanged. `dedup` keeps unique stems only (and is
  * ignored under `longestOnly`, like the reference ctor); `longestOnly`
  * keeps just the longest stem (reference lengthComparator: length
  * descending, ties broken reverse-lexicographically). The aff/dic file
  * text rides inside the filter — it is broadcast once with the
  * serialized chain and the parsed dictionary is built lazily per
  * executor, so the hot path stays pure per-token CPU with no driver
  * round-trips; a cluster deploy of a many-MB national dictionary would
  * swap the inline text for a shared artifact path. */
final case class HunspellStemFilter(aff: String, dic: String,
    ignoreCase: Boolean = false, dedup: Boolean = true,
    longestOnly: Boolean = false) extends TokenFilter {
  @transient private lazy val stemmer =
    new Hunspell.Stemmer(Hunspell.load(aff, dic, ignoreCase))
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Seq.newBuilder[Token]
    val outO = Seq.newBuilder[Boolean]
    tokens.indices.foreach { i =>
      val t = tokens(i)
      val stems0 =
        if (dedup && !longestOnly) stemmer.uniqueStems(t.term)
        else stemmer.stem(t.term)
      if (stems0.isEmpty) { outT += t; outO += overlaps(i) }
      else {
        val stems =
          if (longestOnly && stems0.length > 1)
            Seq(stems0.sortWith((a, b) =>
              if (a.length != b.length) a.length > b.length else a > b).head)
          else stems0
        outT += t.copy(term = stems.head); outO += overlaps(i)
        stems.tail.foreach { s => outT += t.copy(term = s); outO += true }
      }
    }
    (outT.result(), outO.result())
  }
}

/** CLEF light/minimal stemming for a configured language (the reference's
  * *LightStemFilter / *MinimalStemFilter family over the published Savoy /
  * UniNE / RSLP / Sorani rule sets — here the re-derived [[LightStemmers]]
  * and [[Rslp]] algorithms, vocabulary-validated). `ckb` runs the Sorani
  * normalizer before its stemmer, as SoraniAnalyzer does. Positions
  * unchanged. */
final case class LightStemFilter(lang: String) extends TokenFilter {
  private val stemmer: String => String = LightStemFilter.stemmer(lang)
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = stemmer(t.term))), overlaps)
}

object LightStemFilter {
  val languages: Seq[String] = Seq("de_light", "de_minimal", "fr_light",
    "fr_minimal", "es_light", "it_light", "pt_light", "pt_minimal", "pt_rslp",
    "gl", "gl_minimal", "ru_light", "sv_light", "fi_light", "hu_light",
    "no_light", "no_minimal", "nn_light", "nn_minimal", "ckb")

  /** Second wave: the reference's per-language stemmers/normalizers with
    * inline golden tests instead of vocabulary archives. */
  val languages2: Seq[String] = Seq("lv", "cz", "bg", "id", "hi", "bn",
    "ar_light", "fa_norm", "el", "br")
  def stemmer(lang: String): String => String = lang match {
    case "de_light"   => LightStemmers.GermanLight.stem
    case "de_minimal" => LightStemmers.GermanMinimal.stem
    case "fr_light"   => LightStemmers.FrenchLight.stem
    case "fr_minimal" => LightStemmers.FrenchMinimal.stem
    case "es_light"   => LightStemmers.SpanishLight.stem
    case "it_light"   => LightStemmers.ItalianLight.stem
    case "pt_light"   => LightStemmers.PortugueseLight.stem
    case "pt_minimal" => Rslp.PortugueseMinimal.stem
    case "pt_rslp"    => Rslp.Portuguese.stem
    case "gl"         => Rslp.Galician.stem
    case "gl_minimal" => Rslp.GalicianMinimal.stem
    case "ru_light"   => LightStemmers.RussianLight.stem
    case "sv_light"   => LightStemmers.SwedishLight.stem
    case "fi_light"   => LightStemmers.FinnishLight.stem
    case "hu_light"   => LightStemmers.HungarianLight.stem
    case "no_light"   => LightStemmers.norwegianLightNb.stem
    case "no_minimal" => LightStemmers.norwegianMinimalNb.stem
    case "nn_light"   => LightStemmers.norwegianLightNn.stem
    case "nn_minimal" => LightStemmers.norwegianMinimalNn.stem
    case "ckb"        => LightStemmers.SoraniStem.stemNormalized
    case "lv"         => LightStemmers.LatvianLight.stem
    case "cz"         => LightStemmers.CzechLight.stem
    case "bg"         => LightStemmers.BulgarianLight.stem
    case "id"         => LightStemmers.Indonesian.stem
    case "hi"         => IndicStemmers.HindiStem.stemNormalized
    case "bn"         => IndicStemmers.BengaliStem.stemNormalized
    case "ar_light"   => IndicStemmers.ArabicLight.stemNormalized
    case "fa_norm"    => IndicStemmers.PersianNormalizer.normalize
    case "el"         => GreekStemmers.stemLowercased
    case "br"         => Brazilian.stem
    case other => throw new IllegalArgumentException(s"unsupported light-stem language: $other")
  }
}

/** Protected / overridden stemming — the fused semantics of the
  * reference's KeywordMarkerFilter (analysis/miscellaneous/
  * SetKeywordMarkerFilter.java: keyword-marked terms skip stemming),
  * StemmerOverrideFilter (analysis/miscellaneous/StemmerOverrideFilter
  * .java:63-77: dictionary stem replaces the term AND sets the keyword
  * attribute), and PorterStemFilter. The keyword attribute's only effect
  * in the standard chain is "don't stem", so the three-filter stack
  * [StemmerOverride, KeywordMarker, PorterStem] is exactly this one pure
  * function: override wins, protected words pass unchanged, everything
  * else Porter-stems. Positions unchanged. */
final case class KeywordStemFilter(protectedWords: Set[String],
                                   overrides: Map[String, String]) extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map { t =>
      overrides.get(t.term) match {
        case Some(stem) => t.copy(term = stem)
        case None if protectedWords.contains(t.term) => t
        case None => t.copy(term = Porter.stem(t.term))
      }
    }, overlaps)
}

/** Index-time single-token synonym injection: for a term with mapped
  * synonyms, emit the original PLUS each synonym at the SAME position,
  * marked as overlaps (posIncrement 0). */
final case class SynonymFilter(synonyms: Map[String, Seq[String]]) extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
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

/** Fold accented Latin characters to their ASCII base form
  * (analysis/miscellaneous/ASCIIFoldingFilter.java — here the NFD
  * decomposition + combining-mark strip subset, plus the common
  * non-decomposable ligatures/letters; positions unchanged). */
case object AsciiFoldingFilter extends TokenFilter {
  private[analysis] val special = Map(
    'ß' -> "ss", 'æ' -> "ae", 'œ' -> "oe", 'ø' -> "o", 'đ' -> "d",
    'þ' -> "th", 'ð' -> "d", 'ł' -> "l", 'ħ' -> "h", 'ı' -> "i")
  private[analysis] def fold(s: String): String = {
    // fast path: pure ASCII stays identity with zero allocation
    var i = 0; var ascii = true
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val pre = s.flatMap(c => special.getOrElse(c, c.toString))
    java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFD)
      .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = fold(t.term))), overlaps)
}

/** Drop tokens with length outside [min, max]; position holes remain
  * (analysis/miscellaneous/LengthFilter.java / FilteringTokenFilter). */
final case class LengthFilter(min: Int, max: Int) extends TokenFilter {
  require(min >= 1 && max >= min, s"bad length bounds [$min,$max]")
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val keep = tokens.indices.filter { i =>
      val l = tokens(i).term.length; l >= min && l <= max
    }
    (keep.map(tokens), keep.map(overlaps))
  }
}

/** Word-ngram shingles of ADJACENT positions joined by a single space
  * (analysis/shingle/ShingleFilter.java with the default " " separator):
  * each n-gram (n in [2, maxShingleSize]) is emitted at its first token's
  * position as an overlap; unigrams kept when outputUnigrams. Skips over
  * position holes (a stop-worded gap breaks the shingle window, matching
  * the reference's filler-token behavior of not joining across _ holes
  * when fillerToken is disabled). */
final case class ShingleFilter(maxShingleSize: Int = 2,
                               outputUnigrams: Boolean = true) extends TokenFilter {
  require(maxShingleSize >= 2, "maxShingleSize must be >= 2")
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    // only non-overlap tokens form the shingle backbone (injected synonyms
    // would otherwise multiply shingles combinatorially)
    val base = tokens.indices.filterNot(overlaps)
    tokens.indices.foreach { i =>
      if (outputUnigrams || overlaps(i)) { outT += tokens(i); outO += overlaps(i) }
    }
    base.indices.foreach { bi =>
      var n = 2
      while (n <= maxShingleSize && bi + n - 1 < base.size) {
        val window = (0 until n).map(k => tokens(base(bi + k)))
        // adjacency check: consecutive positions only (no joins across holes)
        if (window.sliding(2).forall { case Seq(a, b) => b.pos == a.pos + 1 }) {
          outT += Token(window.map(_.term).mkString(" "), window.head.pos)
          outO += true
        }
        n += 1
      }
    }
    (outT.result(), outO.result())
  }
}

/** Edge n-grams of each token: prefixes of length [min, max] at the same
  * position as overlaps, original kept when preserveOriginal
  * (analysis/ngram/EdgeNGramTokenFilter.java) — the autocomplete /
  * search-as-you-type index-time filter. */
final case class EdgeNGramFilter(minGram: Int, maxGram: Int,
                                 preserveOriginal: Boolean = true) extends TokenFilter {
  require(minGram >= 1 && maxGram >= minGram, s"bad gram bounds [$minGram,$maxGram]")
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    tokens.indices.foreach { i =>
      val t = tokens(i)
      var emittedOriginal = false
      var g = minGram
      while (g <= math.min(maxGram, t.term.length)) {
        val isWhole = g == t.term.length
        outT += Token(t.term.substring(0, g), t.pos)
        // first gram of a token is its "real" slot; the rest stack on it
        outO += (overlaps(i) || g != minGram)
        if (isWhole) emittedOriginal = true
        g += 1
      }
      if (preserveOriginal && !emittedOriginal && t.term.length > 0) {
        outT += t
        outO += (overlaps(i) || t.term.length > minGram)
      }
    }
    (outT.result(), outO.result())
  }
}

/**
 * Word-delimiter splitting (analysis/miscellaneous/
 * WordDelimiterGraphFilter.java, default flags GENERATE_WORD_PARTS |
 * GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS |
 * STEM_ENGLISH_POSSESSIVE): each token splits into subwords at
 * non-alphanumeric characters (dropped), letter↔digit boundaries,
 * lower→Upper transitions, and before the last upper of an acronym run
 * followed by lowercase ("HTTPServer" → HTTP, Server). The critical
 * deployment detail — and why this is a dedicated [[AnalyzerChain]] slot,
 * not an ordinary list entry — is that it must see the RAW-case token
 * stream (Solr schema ordering tokenizer → WDGF → LowerCaseFilter); the
 * chain's other filters run post-lowercase. For source-code corpora this
 * is the camelCase-identifier splitter ("parseConfig" → parse, config).
 *
 * Position semantics: parts occupy consecutive positions starting at the
 * original token's (shifted) position — downstream tokens shift right, as
 * in the reference's graph. With `preserveOriginal` the whole token is
 * ALSO emitted at the first part's position as an overlap (posInc 0).
 * A token with no alphanumerics at all (emoji cluster, symbol run)
 * passes through unsplit; one that is ALL delimiters never occurs here
 * (the tokenizer never emits such tokens).
 */
final case class WordDelimiterFilter(preserveOriginal: Boolean = true,
                                     stemPossessive: Boolean = true) extends TokenFilter {

  /** Subword char categories. */
  @inline private def cat(c: Char): Int =
    if (Character.isDigit(c)) 3
    else if (Character.isLetter(c)) { if (Character.isUpperCase(c) || Character.isTitleCase(c)) 2 else 1 }
    else 0

  private[analysis] def parts(term0: String): Seq[String] = {
    if (!term0.exists(c => cat(c) != 0)) return Seq(term0) // emoji/symbol pass-through
    // STEM_ENGLISH_POSSESSIVE: trailing 's goes before any splitting
    val term = if (stemPossessive && term0.length > 2 &&
      term0.charAt(term0.length - 2) == '\'' &&
      (term0.last == 's' || term0.last == 'S')) term0.dropRight(2) else term0
    val out = Seq.newBuilder[String]
    val sb = new java.lang.StringBuilder(term.length)
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      val t = cat(c)
      if (t == 0) { if (sb.length > 0) { out += sb.toString; sb.setLength(0) } }
      else {
        if (sb.length > 0) {
          val p = cat(sb.charAt(sb.length - 1))
          val caseSplit = p == 1 && t == 2
          val acronymEnd = p == 2 && t == 2 && i + 1 < term.length && cat(term.charAt(i + 1)) == 1
          val alnumSplit = (p == 3) != (t == 3)
          if (caseSplit || acronymEnd || alnumSplit) { out += sb.toString; sb.setLength(0) }
        }
        sb.append(c)
      }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    var shift = 0
    tokens.indices.foreach { i =>
      val t = tokens(i)
      val ps = parts(t.term)
      val base = t.pos + shift
      if (ps.length == 1 && ps.head == t.term) {
        outT += t.copy(pos = base); outO += overlaps(i)
      } else {
        if (preserveOriginal) { outT += t.copy(pos = base); outO += true }
        ps.indices.foreach { j =>
          outT += Token(ps(j), base + j); outO += overlaps(i)
        }
        shift += ps.length - 1
      }
    }
    (outT.result(), outO.result())
  }
}

/** Width folding for CJK text (analysis/cjk/CJKWidthFilter.java): fullwidth
  * ASCII variants (U+FF01-FF5E) fold to basic Latin, halfwidth Katakana
  * variants (U+FF61-FF9F) fold to standard Katakana with the halfwidth
  * voiced/semi-voiced sound marks (U+FF9E/FF9F) composed onto the preceding
  * kana (the reference's explicit KANA_NORM/KANA_COMBINE_* tables are the
  * width-form slice of NFKC + canonical composition, which is what runs
  * here — spliced per width-form run so no other compatibility characters
  * in the token are touched). Positions unchanged. */
case object CJKWidthFilter extends TokenFilter {
  @inline private def isWidthForm(c: Char): Boolean = c >= 0xFF00 && c <= 0xFFEF
  private[analysis] def fold(s: String): String = {
    if (!s.exists(isWidthForm)) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (isWidthForm(s.charAt(i))) {
        var j = i + 1
        while (j < s.length && isWidthForm(s.charAt(j))) j += 1
        // a leading voice mark composes onto the PRECEDING (already-standard)
        // kana: pull the emitted kana back into the normalization window
        if ((s.charAt(i) == 0xFF9E.toChar || s.charAt(i) == 0xFF9F.toChar) && sb.length > 0) {
          val prev = sb.charAt(sb.length - 1)
          sb.setLength(sb.length - 1)
          sb.append(java.text.Normalizer.normalize(prev.toString + s.substring(i, j),
            java.text.Normalizer.Form.NFKC))
        } else {
          sb.append(java.text.Normalizer.normalize(s.substring(i, j),
            java.text.Normalizer.Form.NFKC))
        }
        i = j
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = fold(t.term))), overlaps)
}

/**
 * CJK bigram formation (analysis/cjk/CJKBigramFilter.java with all four
 * scripts enabled — the CJKAnalyzer configuration): maximal runs of
 * adjacent Han / Hiragana / Katakana / Hangul characters are re-emitted as
 * overlapping character bigrams ("多くの" → 多く, くの); a lone CJK
 * character with no neighbor stays a unigram (the reference's SINGLE
 * fallback). With `outputUnigrams` every character is ALSO emitted as a
 * unigram and the bigrams stack on them as overlaps (posInc 0) — the
 * combined unigram+bigram recall/precision mode.
 *
 * Adjacency on this chain's position-only stream: characters inside one
 * token are adjacent by construction; ACROSS a token boundary the run
 * continues only when the positions are consecutive AND one side is a
 * single-character Han or Hiragana token. The tokenizer emits Han and
 * Hiragana one-char-per-token (so 中国 and これ arrive as tokens that must
 * re-join) but keeps Katakana and Hangul as letter RUNS — a boundary
 * between two run tokens therefore implies a real separator in the text
 * and breaks the bigram window, mirroring the reference's
 * offset-contiguity rule (CJKBigramFilter.java:304-310, lastEndOffset);
 * for Korean, where whitespace separates real words, runs never join
 * across it. The one documented divergence: whitespace BETWEEN two Han or
 * Hiragana characters does not break the run here (offsets are not
 * carried through the chain; Japanese/Chinese text does not use
 * intra-word whitespace). Non-CJK tokens pass through unmodified; mixed
 * CJK/non-CJK tokens pass through whole, as the reference does for
 * mixed-script ALPHANUM tokens (CJKBigramFilter.java:49-56 scaladoc).
 *
 * Positions shift like [[WordDelimiterFilter]]: a run of n chars occupies
 * n-1 positions (bigram mode), n positions (unigram+bigram mode), or 1
 * (lone char); downstream tokens slide to stay dense.
 */
final case class CJKBigramFilter(outputUnigrams: Boolean = false) extends TokenFilter {
  @inline private def isCjkCp(cp: Int): Boolean =
    Character.isIdeographic(cp) ||
    (cp >= 0x3040 && cp <= 0x30FF) || // hiragana + katakana (incl. ー U+30FC)
    (cp >= 0x31F0 && cp <= 0x31FF) || // katakana phonetic extensions
    (cp >= 0xAC00 && cp <= 0xD7AF) || // hangul syllables
    (cp >= 0x1100 && cp <= 0x11FF)    // hangul jamo
  private def isCjkToken(term: String): Boolean = {
    var i = 0
    while (i < term.length) {
      val cp = term.codePointAt(i)
      if (!isCjkCp(cp)) return false
      i += Character.charCount(cp)
    }
    term.nonEmpty
  }
  /** Single Han/Hiragana char — the token shapes the tokenizer emits
    * per-character, whose boundaries carry no separator information. */
  @inline private def joinableSingle(term: String): Boolean =
    term.codePointCount(0, term.length) == 1 && {
      val cp = term.codePointAt(0)
      Character.isIdeographic(cp) || (cp >= 0x3041 && cp <= 0x309E)
    }

  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    var shift = 0
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (!isCjkToken(t.term) || overlaps(i)) {
        // pass-through (injected overlaps never join a bigram run — they are
        // synonyms of whole tokens, not adjacent text)
        outT += t.copy(pos = t.pos + shift); outO += overlaps(i)
        i += 1
      } else {
        // collect the maximal run
        val runStart = i
        val cps = new ArrayBufferInt
        var k = i
        while ({
          var c = 0
          while (c < tokens(k).term.length) {
            val cp = tokens(k).term.codePointAt(c)
            cps += cp; c += Character.charCount(cp)
          }
          val next = k + 1
          val joins = next < tokens.length && !overlaps(next) &&
            tokens(next).pos == tokens(k).pos + 1 && isCjkToken(tokens(next).term) &&
            (joinableSingle(tokens(k).term) || joinableSingle(tokens(next).term))
          if (joins) { k = next; true } else false
        }) ()
        val m = cps.length
        val base = t.pos + shift
        val consumed = tokens(k).pos - t.pos + 1 // input positions used by the run
        var emitted = 0
        if (m == 1) {
          outT += Token(new String(Character.toChars(cps(0))), base); outO += false
          emitted = 1
        } else if (outputUnigrams) {
          var u = 0
          while (u < m) {
            outT += Token(new String(Character.toChars(cps(u))), base + u); outO += false
            if (u < m - 1) {
              outT += Token(new String(Character.toChars(cps(u))) +
                new String(Character.toChars(cps(u + 1))), base + u)
              outO += true // bigram overlaps its first char's unigram
            }
            u += 1
          }
          emitted = m
        } else {
          var u = 0
          while (u < m - 1) {
            outT += Token(new String(Character.toChars(cps(u))) +
              new String(Character.toChars(cps(u + 1))), base + u)
            outO += false
            u += 1
          }
          emitted = m - 1
        }
        shift += emitted - consumed
        i = k + 1
      }
    }
    (outT.result(), outO.result())
  }
}

/** Tiny growable int buffer (avoids boxing in the bigram hot path). */
private[analysis] final class ArrayBufferInt {
  private var a = new Array[Int](16)
  private var n = 0
  def +=(v: Int): Unit = {
    if (n == a.length) { val b = new Array[Int](n * 2); System.arraycopy(a, 0, b, 0, n); a = b }
    a(n) = v; n += 1
  }
  def apply(i: Int): Int = a(i)
  def length: Int = n
}

/** Strip a leading elided article + apostrophe (util/ElisionFilter.java:
  * the first ' or ’ in the token; if the prefix before it is one of the
  * articles, the prefix and apostrophe drop). Default articles are the
  * FrenchAnalyzer set (fr/FrenchAnalyzer.java:61-63). Positions
  * unchanged. */
final case class ElisionFilter(articles: Set[String] = ElisionFilter.french)
    extends TokenFilter {
  private def strip(term: String): String = {
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c == '\'' || c == '’') {
        if (articles.contains(term.substring(0, i))) return term.substring(i + 1)
        return term
      }
      i += 1
    }
    term
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = strip(t.term))), overlaps)
}

object ElisionFilter {
  /** The reference FrenchAnalyzer's DEFAULT_ARTICLES. */
  val french: Set[String] = Set("l", "m", "t", "qu", "n", "s", "j", "d", "c",
    "jusqu", "quoiqu", "lorsqu", "puisqu")
  /** CatalanAnalyzer / ItalianAnalyzer / IrishAnalyzer article sets. */
  val catalan: Set[String] = Set("d", "l", "m", "n", "s", "t")
  val italian: Set[String] = Set("c", "l", "all", "dall", "dell", "nell",
    "sull", "coll", "pell", "gl", "agl", "dagl", "degl", "negl", "sugl",
    "un", "m", "t", "s", "v", "d")
  val irish: Set[String] = Set("d", "m", "b")
}

/** Common-word bigrams (commongrams/CommonGramsFilter.java): between each
  * pair of stream-adjacent tokens where either side is a common word, a
  * "first_second" gram is emitted at the FIRST token's position as an
  * overlap (posInc 0 — test positions {1,0,1}). Unigrams always remain;
  * phrase queries over stop-heavy text then match the precomposed grams
  * instead of position holes. */
final case class CommonGramsFilter(commonWords: Set[String]) extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    // grams form over the non-overlap backbone, like the reference stream
    val backbone = tokens.indices.filterNot(overlaps)
    val gramAfter = backbone.indices.dropRight(1).filter { bi =>
      commonWords.contains(tokens(backbone(bi)).term) ||
        commonWords.contains(tokens(backbone(bi + 1)).term)
    }.toSet
    var b = 0
    tokens.indices.foreach { i =>
      outT += tokens(i); outO += overlaps(i)
      if (!overlaps(i)) {
        if (gramAfter.contains(b)) {
          val next = tokens(backbone(b + 1))
          outT += Token(tokens(i).term + "_" + next.term, tokens(i).pos)
          outO += true
        }
        b += 1
      }
    }
    (outT.result(), outO.result())
  }
}

/** Dictionary compound decomposition (compound/
  * DictionaryCompoundWordTokenFilter.java): tokens of >= minWordSize
  * chars scan every start offset for dictionary subwords of length
  * [minSubwordSize, maxSubwordSize]; each hit (or only the longest per
  * start, with onlyLongestMatch) is emitted at the SAME position as an
  * overlap. The original token always survives. The German-compound
  * splitter ("donaudampfschiff" -> donau, dampf, schiff). */
final case class DictionaryCompoundFilter(dictionary: Set[String],
                                          minWordSize: Int = 5,
                                          minSubwordSize: Int = 2,
                                          maxSubwordSize: Int = 15,
                                          onlyLongestMatch: Boolean = false)
    extends TokenFilter {
  private def subwords(term: String): Seq[String] = {
    if (term.length < minWordSize) return Nil
    val out = Seq.newBuilder[String]
    var i = 0
    while (i <= term.length - minSubwordSize) {
      var longest: String = null
      var j = minSubwordSize
      while (j <= maxSubwordSize && i + j <= term.length) {
        val cand = term.substring(i, i + j)
        if (dictionary.contains(cand)) {
          if (onlyLongestMatch) {
            if (longest == null || longest.length < j) longest = cand
          } else out += cand
        }
        j += 1
      }
      if (onlyLongestMatch && longest != null) out += longest
      i += 1
    }
    out.result()
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    tokens.indices.foreach { i =>
      val t = tokens(i)
      outT += t; outO += overlaps(i)
      subwords(t.term).foreach { sw => outT += Token(sw, t.pos); outO += true }
    }
    (outT.result(), outO.result())
  }
}

/** Keep only listed words (miscellaneous/KeepWordFilter.java — the
  * inverse of a stop filter); position holes remain. */
final case class KeepWordFilter(keep: Set[String]) extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val idx = tokens.indices.filter(i => keep.contains(tokens(i).term))
    (idx.map(tokens), idx.map(overlaps))
  }
}

/** Truncate every token to a fixed prefix length (miscellaneous/
  * TruncateTokenFilter.java). */
final case class TruncateFilter(length: Int) extends TokenFilter {
  require(length >= 1, "truncate length must be >= 1")
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t =>
      if (t.term.length > length) t.copy(term = t.term.substring(0, length)) else t),
      overlaps)
}

/** Reverse every token (reverse/ReverseStringFilter.java — the
  * leading-wildcard acceleration trick: index reversed terms, rewrite
  * *suffix into a reversed prefix scan). */
case object ReverseStringFilter extends TokenFilter {
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = t.term.reverse)), overlaps)
}

/** Regex replacement on each token (pattern/PatternReplaceFilter.java);
  * replaceAll vs first-occurrence per the reference's `all` flag. Tokens
  * that become empty are REMOVED (the factory's usual stop-after
  * configuration keeps streams clean; position holes remain). */
final case class PatternReplaceFilter(pattern: String, replacement: String,
                                      all: Boolean = true) extends TokenFilter {
  @transient private lazy val re = java.util.regex.Pattern.compile(pattern)
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val replaced = tokens.map { t =>
      val m = re.matcher(t.term)
      t.copy(term = if (all) m.replaceAll(replacement) else m.replaceFirst(replacement))
    }
    val idx = replaced.indices.filter(i => replaced(i).term.nonEmpty)
    (idx.map(replaced), idx.map(overlaps))
  }
}

/** Unicode folding (the capability of the reference's icu module
  * ICUFoldingFilter, approximated with the JDK: NFKC compatibility
  * normalization, combining-mark removal via NFD, and full lowercasing —
  * accents, width forms, ligatures, and case fold across scripts in one
  * filter). A documented subset: ICU's custom foldings beyond NFKC+strip
  * (e.g. Hangul jamo conflation) are out of scope. */
case object UnicodeFoldingFilter extends TokenFilter {
  private[analysis] def fold(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s // already-lowercase ASCII fast path (chain lowercases)
    // case-fold FIRST so uppercase forms of the special ligature letters
    // (ẞ -> ß -> ss) reach the special map — folding last would leave
    // capital-ẞ as ß while ß itself folds to ss (non-idempotent)
    val lower = s.toLowerCase
    // ICU's case-fold maps the non-decomposable ligature letters (ß -> ss,
    // æ -> ae, ...) that NFKC leaves alone — the AsciiFolding special set
    val pre = lower.flatMap(c => AsciiFoldingFilter.special.getOrElse(c, c.toString))
    val kc = java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFKC)
    val d = java.text.Normalizer.normalize(kc, java.text.Normalizer.Form.NFD)
      .filterNot(c => Character.getType(c) == Character.NON_SPACING_MARK)
    java.text.Normalizer.normalize(d, java.text.Normalizer.Form.NFC).toLowerCase
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.map(t => t.copy(term = fold(t.term))), overlaps)
}

/** KeywordRepeat + stemmer + RemoveDuplicates as one fused filter (the
  * reference stack miscellaneous/KeywordRepeatFilter -> stem ->
  * RemoveDuplicatesTokenFilter): every token is emitted stemmed, with the
  * ORIGINAL stacked at the same position as an overlap when the stem
  * changed it — exact-form and stemmed-form queries both match. */
final case class RepeatStemFilter(kind: String, lang: String = "") extends TokenFilter {
  private val stem: String => String = kind match {
    case "porter"   => Porter.stem
    case "snowball" => SnowballStemFilter(lang).stemmerFn
    case "light"    => LightStemFilter.stemmer(lang)
    case other => throw new IllegalArgumentException(s"unsupported repeat-stem kind: $other")
  }
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val outT = Vector.newBuilder[Token] // Vector: downstream filters index into the stream
    val outO = Vector.newBuilder[Boolean]
    tokens.indices.foreach { i =>
      val t = tokens(i)
      val st = stem(t.term)
      outT += t.copy(term = st); outO += overlaps(i)
      if (st != t.term) { outT += t; outO += true }
    }
    (outT.result(), outO.result())
  }
}

/** Keep only the first N stream tokens (miscellaneous/
  * LimitTokenCountFilter.java — index-size guard for huge docs). */
final case class LimitTokenCountFilter(maxTokens: Int) extends TokenFilter {
  require(maxTokens >= 1, "maxTokens must be >= 1")
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) =
    (tokens.take(maxTokens), overlaps.take(maxTokens))
}

/** Codepoint-count bounds (miscellaneous/CodepointCountFilter.java —
  * LengthFilter for supplementary-plane text). */
final case class CodepointCountFilter(min: Int, max: Int) extends TokenFilter {
  require(min >= 1 && max >= min, s"bad codepoint bounds [$min,$max]")
  def apply(tokens: Seq[Token], overlaps: Seq[Boolean]): (Seq[Token], Seq[Boolean]) = {
    val keep = tokens.indices.filter { i =>
      val n = tokens(i).term.codePointCount(0, tokens(i).term.length)
      n >= min && n <= max
    }
    (keep.map(tokens), keep.map(overlaps))
  }
}

/**
 * The analysis chain: the standard tokenizer ([[Analyzer]]: UAX#29 subset
 * + lowercase) followed by the configured filters. `AnalyzerChain(Nil)`
 * is bit-compatible with the bare [[Analyzer]] (the round-1/2 default).
 * `wordDelimiter`, when set, runs between segmentation and lowercasing
 * (it needs the raw case — see [[WordDelimiterFilter]]); `filters` run
 * after lowercasing as before.
 */
final case class AnalyzerChain(filters: Seq[TokenFilter],
                               wordDelimiter: Option[WordDelimiterFilter] = None,
                               charFilters: Seq[CharFilter] = Nil)
    extends Serializable {
  require(!filters.exists(_.isInstanceOf[WordDelimiterFilter]),
    "WordDelimiterFilter goes in the wordDelimiter slot (it must run on " +
      "the raw-case stream, before lowercasing), not in filters")

  /** Tokens (with positions) after the whole chain. */
  def analyze(text: String): Seq[Token] = analyzeWithOverlaps(text)._1

  def analyzeWithOverlaps(text0: String): (Seq[Token], Seq[Boolean]) = {
    // char filters rewrite the raw text before segmentation (the
    // reference's CharFilter stage)
    val text = charFilters.foldLeft(text0)((t, f) => f(t))
    val base = wordDelimiter match {
      case Some(wdf) =>
        val seg = Analyzer.segment(text)
        val (ts, os) = wdf(seg, seg.map(_ => false))
        (ts.map(t => t.copy(term = Analyzer.lowercase(t.term))), os)
      case None =>
        val b = Analyzer.analyze(text)
        (b, b.map(_ => false))
    }
    filters.foldLeft(base) { case ((ts, os), f) => f(ts, os) }
  }

  def terms(text: String): Seq[String] = analyze(text).map(_.term)

  /** Per-doc (term -> tf, docLength) through the chain. dl counts
    * non-overlap tokens only (discountOverlaps=true); tf counts every
    * occurrence including injected synonyms (they are real postings). */
  def termFreqs(text: String): (scala.collection.Map[String, Int], Int) = {
    if (filters.isEmpty && wordDelimiter.isEmpty && charFilters.isEmpty)
      return Analyzer.termFreqs(text) // allocation-light hot path
    val (tokens, overlaps) = analyzeWithOverlaps(text)
    val m = new java.util.HashMap[String, Int](64)
    var dl = 0
    // iterator walk, never Seq.apply(i): filter outputs may be Lists, and
    // an indexed loop over a List is O(n^2) per doc (observed as a
    // build-time hang on long documents)
    val it = tokens.iterator
    val io = overlaps.iterator
    while (it.hasNext) {
      if (!io.next()) dl += 1
      m.merge(it.next().term, 1, (a, b) => a + b)
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
      case KStemFilter => """{"type":"kstem"}"""
      case HunspellStemFilter(aff, dic, ic, dd, lo) =>
        // aff/dic ride base64 so arbitrary dictionary text stays json-lite
        s"""{"type":"hunspell","ignorecase":$ic,"dedup":$dd,"longest":$lo,""" +
          s""""aff":${word(b64e(aff))},"dic":${word(b64e(dic))}}"""
      case SnowballStemFilter(lang) => s"""{"type":"snowball","lang":${word(lang)}}"""
      case LightStemFilter(lang) => s"""{"type":"lightstem","lang":${word(lang)}}"""
      case SynonymFilter(m) =>
        val entries = m.toSeq.sortBy(_._1).map { case (k, vs) =>
          s"${word(k)}:[${vs.map(word).mkString(",")}]"
        }
        s"""{"type":"synonym","map":{${entries.mkString(",")}}}"""
      case AsciiFoldingFilter => """{"type":"ascii"}"""
      case LengthFilter(mn, mx) => s"""{"type":"length","min":$mn,"max":$mx}"""
      case ShingleFilter(mx, uni) =>
        s"""{"type":"shingle","max":$mx,"unigrams":$uni}"""
      case EdgeNGramFilter(mn, mx, orig) =>
        s"""{"type":"edgengram","min":$mn,"max":$mx,"original":$orig}"""
      case PhoneticFilter(inj, enc) =>
        s"""{"type":"phonetic","inject":$inj,"encoder":${word(enc)}}"""
      case CJKWidthFilter => """{"type":"cjkwidth"}"""
      case CJKBigramFilter(uni) => s"""{"type":"cjkbigram","unigrams":$uni}"""
      case KeywordStemFilter(prot, ov) =>
        val entries = ov.toSeq.sortBy(_._1).map { case (k, v) => s"${word(k)}:${word(v)}" }
        s"""{"type":"kwstem","protected":[${prot.toSeq.sorted.map(word).mkString(",")}],""" +
          s""""overrides":{${entries.mkString(",")}}}"""
      case ElisionFilter(arts) =>
        s"""{"type":"elision","articles":[${arts.toSeq.sorted.map(word).mkString(",")}]}"""
      case CommonGramsFilter(ws) =>
        s"""{"type":"commongrams","words":[${ws.toSeq.sorted.map(word).mkString(",")}]}"""
      case DictionaryCompoundFilter(dict, mw, mns, mxs, lng) =>
        s"""{"type":"compound","minword":$mw,"minsub":$mns,"maxsub":$mxs,""" +
          s""""longest":$lng,"dict":[${dict.toSeq.sorted.map(word).mkString(",")}]}"""
      case KeepWordFilter(ws) =>
        s"""{"type":"keepword","words":[${ws.toSeq.sorted.map(word).mkString(",")}]}"""
      case TruncateFilter(n) => s"""{"type":"truncate","len":$n}"""
      case ReverseStringFilter => """{"type":"reverse"}"""
      case PatternReplaceFilter(p, r, all) =>
        // base64 dodges regex metachars in the json-lite encoding
        s"""{"type":"patreplace","pattern":${word(b64e(p))},""" +
          s""""replacement":${word(b64e(r))},"all":$all}"""
      case UnicodeFoldingFilter => """{"type":"ufold"}"""
      case GermanNormalizationFilter => """{"type":"denorm"}"""
      case EnglishPossessiveFilter => """{"type":"enposs"}"""
      case ArabicNormFilter => """{"type":"arnorm"}"""
      case PersianNormFilter => """{"type":"fanorm"}"""
      case ThaiWordFilter => """{"type":"thai"}"""
      case RepeatStemFilter(kind, lang) =>
        s"""{"type":"repeatstem","kind":${word(kind)},"lang":${word(lang)}}"""
      case MorphSegmentFilter(dict, stop, dec) =>
        val stopArr = stop.toSeq.sorted.map(word).mkString("[", ",", "]")
        s"""{"type":"morph","dict":${word(dict)},"stop":$stopArr,"decomp":${word(dec)}}"""
      case LimitTokenCountFilter(n) => s"""{"type":"limitcount","max":$n}"""
      case CodepointCountFilter(mn, mx) =>
        s"""{"type":"cpcount","min":$mn,"max":$mx}"""
    }
    val cfs = chain.charFilters.map {
      case HtmlStripCharFilter => """{"type":"htmlstrip"}"""
      case HyphenJoinCharFilter => """{"type":"hyphenjoin"}"""
      case MappingCharFilter(m) =>
        val entries = m.toSeq.sortBy(_._1).map { case (k, v) =>
          s"${word(b64e(k))}:${word(b64e(v))}"
        }
        s"""{"type":"mapping","map":{${entries.mkString(",")}}}"""
    }
    val wd = chain.wordDelimiter.map(w =>
      s"""{"type":"worddelim","original":${w.preserveOriginal},"possessive":${w.stemPossessive}}""").toSeq
    val cfPart = if (cfs.isEmpty) "" else s""","charfilters":[${cfs.mkString(",")}]"""
    s"""{"filters":[${(wd ++ fs).mkString(",")}]$cfPart}"""
  }

  private def b64e(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def b64d(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  def fromJson(json0: String): AnalyzerChain = {
    // char filters live in their own section so the filter scan below
    // never sees them
    val cfStart = json0.indexOf(""","charfilters":[""")
    val (json, cfJson) =
      if (cfStart < 0) (json0, "")
      else (json0.substring(0, cfStart), json0.substring(cfStart))
    val filterRe =
      """\{"type":"(stop|porter|kstem|hunspell|snowball|lightstem|synonym|ascii|length|shingle|edgengram|phonetic|worddelim|kwstem|cjkwidth|cjkbigram|elision|commongrams|compound|keepword|truncate|reverse|patreplace|ufold|denorm|enposs|arnorm|fanorm|thai|repeatstem|limitcount|cpcount|morph)"[^}]*(?:\{[^}]*\})?[^}]*\}""".r
    val wordsRe = """"([^"]+)"""".r
    def intField(body: String, k: String): Int =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(body).get.group(1).toInt
    def boolField(body: String, k: String): Boolean =
      s""""$k":(true|false)""".r.findFirstMatchIn(body).get.group(1).toBoolean
    val filters = filterRe.findAllMatchIn(json).map { m =>
      val body = m.matched
      m.group(1) match {
        case "porter" => PorterStemFilter
        case "kstem" => KStemFilter
        case "hunspell" =>
          HunspellStemFilter(
            b64d(""""aff":"([^"]+)"""".r.findFirstMatchIn(body).get.group(1)),
            b64d(""""dic":"([^"]+)"""".r.findFirstMatchIn(body).get.group(1)),
            boolField(body, "ignorecase"), boolField(body, "dedup"),
            boolField(body, "longest"))
        case "snowball" =>
          SnowballStemFilter(""""lang":"([^"]+)"""".r.findFirstMatchIn(body).get.group(1))
        case "lightstem" =>
          LightStemFilter(""""lang":"([^"]+)"""".r.findFirstMatchIn(body).get.group(1))
        case "ascii"  => AsciiFoldingFilter
        case "length" => LengthFilter(intField(body, "min"), intField(body, "max"))
        case "shingle" =>
          ShingleFilter(intField(body, "max"), boolField(body, "unigrams"))
        case "edgengram" =>
          EdgeNGramFilter(intField(body, "min"), intField(body, "max"),
            boolField(body, "original"))
        case "phonetic" =>
          // encoder is optional for pre-existing persisted chains (soundex)
          val enc = """"encoder":"([^"]+)"""".r.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse("soundex")
          PhoneticFilter(boolField(body, "inject"), enc)
        case "cjkwidth" => CJKWidthFilter
        case "cjkbigram" => CJKBigramFilter(boolField(body, "unigrams"))
        case "worddelim" =>
          WordDelimiterFilter(boolField(body, "original"), boolField(body, "possessive"))
        case "stop" =>
          val arr = body.substring(body.indexOf('['), body.indexOf(']') + 1)
          StopFilter(wordsRe.findAllMatchIn(arr).map(_.group(1)).toSet)
        case "elision" =>
          val arr = body.substring(body.indexOf('['), body.indexOf(']') + 1)
          ElisionFilter(wordsRe.findAllMatchIn(arr).map(_.group(1)).toSet)
        case "commongrams" =>
          val arr = body.substring(body.indexOf('['), body.indexOf(']') + 1)
          CommonGramsFilter(wordsRe.findAllMatchIn(arr).map(_.group(1)).toSet)
        case "keepword" =>
          val arr = body.substring(body.indexOf('['), body.indexOf(']') + 1)
          KeepWordFilter(wordsRe.findAllMatchIn(arr).map(_.group(1)).toSet)
        case "compound" =>
          val arr = body.substring(body.indexOf('['), body.indexOf(']') + 1)
          DictionaryCompoundFilter(
            wordsRe.findAllMatchIn(arr).map(_.group(1)).toSet,
            intField(body, "minword"), intField(body, "minsub"),
            intField(body, "maxsub"), boolField(body, "longest"))
        case "truncate" => TruncateFilter(intField(body, "len"))
        case "reverse" => ReverseStringFilter
        case "ufold" => UnicodeFoldingFilter
        case "denorm" => GermanNormalizationFilter
        case "enposs" => EnglishPossessiveFilter
        case "arnorm" => ArabicNormFilter
        case "fanorm" => PersianNormFilter
        case "thai" => ThaiWordFilter
        case "morph" =>
          // pre-round-5 manifests carry only {"dict":...} — default the rest
          val stop = """"stop":\[([^\]]*)\]""".r.findFirstMatchIn(body)
            .map(m => wordsRe.findAllMatchIn(m.group(1)).map(_.group(1)).toSet)
            .getOrElse(Set.empty[String])
          val dec = """"decomp":"([^"]+)"""".r.findFirstMatchIn(body)
            .map(_.group(1)).getOrElse("none")
          MorphSegmentFilter(
            """"dict":"([^"]+)"""".r.findFirstMatchIn(body).get.group(1), stop, dec)
        case "repeatstem" =>
          def strField(k: String): String =
            s""""$k":"([^"]*)"""".r.findFirstMatchIn(body).get.group(1)
          RepeatStemFilter(strField("kind"), strField("lang"))
        case "limitcount" => LimitTokenCountFilter(intField(body, "max"))
        case "cpcount" => CodepointCountFilter(intField(body, "min"), intField(body, "max"))
        case "patreplace" =>
          def strField(k: String): String =
            s""""$k":"([^"]*)"""".r.findFirstMatchIn(body).get.group(1)
          PatternReplaceFilter(b64d(strField("pattern")),
            b64d(strField("replacement")), boolField(body, "all"))
        case "kwstem" =>
          val protArr = body.substring(body.indexOf('['), body.indexOf(']') + 1)
          val ovBody = body.substring(body.indexOf("\"overrides\":{") + 13, body.lastIndexOf('}'))
          val pairRe = """"([^"]+)":"([^"]+)"""".r
          KeywordStemFilter(
            wordsRe.findAllMatchIn(protArr).map(_.group(1)).toSet,
            pairRe.findAllMatchIn(ovBody).map(e => e.group(1) -> e.group(2)).toMap)
        case "synonym" =>
          val mapBody = body.substring(body.indexOf("\"map\":{") + 7, body.lastIndexOf('}'))
          val entryRe = """"([^"]+)":\[([^\]]*)\]""".r
          SynonymFilter(entryRe.findAllMatchIn(mapBody).map { e =>
            e.group(1) -> wordsRe.findAllMatchIn(e.group(2)).map(_.group(1)).toSeq
          }.toMap)
      }
    }.toSeq
    // worddelim routes to its dedicated pre-lowercase slot, not the list
    val (wds, rest) = filters.partition(_.isInstanceOf[WordDelimiterFilter])
    val cfRe = """\{"type":"(htmlstrip|hyphenjoin|mapping)"[^}]*(?:\{[^}]*\})?[^}]*\}""".r
    val charFilters: Seq[CharFilter] = cfRe.findAllMatchIn(cfJson).map { m =>
      m.group(1) match {
        case "htmlstrip" => HtmlStripCharFilter
        case "hyphenjoin" => HyphenJoinCharFilter
        case "mapping" =>
          val mapBody = m.matched.substring(
            m.matched.indexOf("\"map\":{") + 7, m.matched.lastIndexOf('}'))
          val pairRe = """"([^"]+)":"([^"]*)"""".r
          MappingCharFilter(pairRe.findAllMatchIn(mapBody)
            .map(e => b64d(e.group(1)) -> b64d(e.group(2))).toMap)
      }
    }.toSeq
    AnalyzerChain(rest, wds.headOption.map(_.asInstanceOf[WordDelimiterFilter]),
      charFilters)
  }
}
