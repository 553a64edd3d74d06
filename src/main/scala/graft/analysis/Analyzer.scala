package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** A token with its position (position = index in the token stream). */
final case class Token(term: String, pos: Int)

/** A token with position AND character offsets into the ORIGINAL text
  * (Lucene OffsetAttribute: startOffset inclusive, endOffset exclusive). */
final case class OffsetToken(term: String, pos: Int, start: Int, end: Int)

/**
 * StandardAnalyzer-equivalent analysis chain: UAX#29-style word
 * segmentation + full-Unicode lowercasing + empty stop set, with the
 * 255-char max-token chop.
 *
 * Reference behavior being matched (not ported):
 *  - lucene/core/src/java/org/apache/lucene/analysis/standard/
 *    StandardTokenizer.java:39,80-97,154-164 — UAX#29 word break; tokens
 *    longer than maxTokenLength (255) are chopped into <=255-char chunks
 *    by the scanner buffer.
 *  - LowerCaseFilter.java:27,42 — Character.toLowerCase-based lowering.
 *  - StandardAnalyzer.java:50-53 — default stop set is EMPTY.
 *
 * This is a documented UAX#29 *subset* faithful for source-code/ASCII
 * corpora (SURVEY.md §7.4.2): word chars are Unicode letters/digits;
 * '_' (ExtendNumLet) joins words; MidLetter/MidNumLet/MidNum characters
 * ('.', ':', '\'' between letters; '.'/',' between digits) join when
 * flanked by word chars on both sides; CJK ideographs emit one token per
 * character (StandardTokenizer IDEOGRAPHIC type — UAX#29 gives Han no
 * joining rule; Katakana/Hangul remain letter runs). Emoji clusters emit
 * ONE token per cluster (StandardTokenizer <EMOJI> type): a pictographic
 * base plus its variation selector / skin-tone modifiers, ZWJ-joined
 * sequences, and regional-indicator PAIRS (flags). The pictographic set is
 * a documented block-range approximation of Extended_Pictographic (the
 * main emoji blocks; keycap sequences and text-presentation symbols
 * outside those blocks are out of scope). Everything else breaks.
 */
object Analyzer extends Serializable {
  val MaxTokenLength = 255

  @inline private def isWordChar(cp: Int): Boolean =
    Character.isLetter(cp) || Character.isDigit(cp)

  /** Emoji cluster base: the main pictographic blocks + regional
    * indicators (flag halves). Approximates Extended_Pictographic
    * (reference StandardTokenizerImpl emoji classes). */
  @inline private def isEmojiBase(cp: Int): Boolean =
    (cp >= 0x1F300 && cp <= 0x1FAFF) || // pictographs/emoticons/transport/supplemental
    (cp >= 0x2600 && cp <= 0x27BF)   || // misc symbols + dingbats
    cp == 0x2B50 || cp == 0x2B55     || // star / heavy circle
    (cp >= 0x1F1E6 && cp <= 0x1F1FF)    // regional indicators

  /** In-cluster continuation: ZWJ, variation selector 16, skin tones. */
  @inline private def isEmojiCont(cp: Int): Boolean =
    cp == 0x200D || cp == 0xFE0F || (cp >= 0x1F3FB && cp <= 0x1F3FF)

  /** Exclusive end of the emoji cluster starting at `start` (which must
    * point at an emoji base): consumes modifiers/VS16, ZWJ + next base
    * repeatedly; a regional-indicator base pairs with exactly one
    * following regional indicator (a flag). */
  private def emojiEnd(text: String, start: Int): Int = {
    val n = text.length
    val cp0 = text.codePointAt(start)
    var i = start + Character.charCount(cp0)
    if (cp0 >= 0x1F1E6 && cp0 <= 0x1F1FF) {
      if (i < n) {
        val cp1 = text.codePointAt(i)
        if (cp1 >= 0x1F1E6 && cp1 <= 0x1F1FF) i += Character.charCount(cp1)
      }
      return i
    }
    var done = false
    while (!done && i < n) {
      val cp = text.codePointAt(i)
      if (isEmojiCont(cp)) {
        val w = Character.charCount(cp)
        if (cp == 0x200D) {
          val j = i + w
          if (j < n && isEmojiBase(text.codePointAt(j)))
            i = j + Character.charCount(text.codePointAt(j))
          else done = true
        } else i += w
      } else done = true
    }
    i
  }

  /** CJK ideographs are single-codepoint tokens (UAX#29 gives Han no
    * word-joining rule; reference StandardTokenizer emits IDEOGRAPHIC
    * type per character — analysis/standard/StandardTokenizerImpl.java).
    * Hiragana likewise has no joining rule (per-char <HIRAGANA> tokens);
    * Katakana joins only with itself (WB13 — <KATAKANA> runs break against
    * Latin/digits/other scripts); Hangul syllables are ALetter and stay
    * generic letter runs (which is why "한국abc" is ONE token both here
    * and in the reference). */
  @inline private def isIdeograph(cp: Int): Boolean = Character.isIdeographic(cp)

  /** Hiragana LETTERS (combining marks / symbols in the block excluded —
    * they are not word chars and never reach the token). */
  @inline private def isHiragana(cp: Int): Boolean =
    (cp >= 0x3041 && cp <= 0x3096) || cp == 0x309D || cp == 0x309E

  /** Katakana word-char class (UAX#29 Katakana property's letter subset):
    * the main block incl. ー U+30FC, phonetic extensions, halfwidth forms. */
  @inline private def isKatakana(cp: Int): Boolean =
    (cp >= 0x30A1 && cp <= 0x30FA) || (cp >= 0x30FC && cp <= 0x30FE) ||
    (cp >= 0x31F0 && cp <= 0x31FF) || (cp >= 0xFF66 && cp <= 0xFF9F)

  /** WB13: a Katakana↔non-Katakana boundary between two word chars breaks
    * the run ('_' ExtendNumLet still joins per WB13a/b). */
  @inline private def scriptBreak(prev: Int, next: Int): Boolean =
    isWordChar(prev) && isWordChar(next) && (isKatakana(prev) != isKatakana(next))

  /** UAX#29 Extend: ExtendNumLet '_' plus combining marks (Mn/Mc/Me) —
    * Thai vowel/tone signs, Indic matras, and stacked diacritics continue
    * the word they attach to instead of breaking it. */
  @inline private def isExtend(cp: Int): Boolean = cp == '_' || {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** MidLetter/MidNumLet for letters; MidNum/MidNumLet for digits.
    * Per UAX#29: ':' is MidLetter (letters ONLY — "12:30" must split,
    * matching StandardTokenizer); '.' is MidNumLet (both); ',' MidNum
    * (digits only); '\'' and U+2019 (curly apostrophe, MidNumLet)
    * MidLetter-ish (letters only). */
  @inline private def joins(mid: Int, prev: Int, next: Int): Boolean = {
    val pl = Character.isLetter(prev); val nl = Character.isLetter(next)
    val pd = Character.isDigit(prev);  val nd = Character.isDigit(next)
    mid match {
      case '.'        => (pl && nl) || (pd && nd)
      case ':' | '\'' | '\u2019' => pl && nl
      case ','        => pd && nd
      case _          => false
    }
  }

  /** Segment into raw (not lowercased) tokens with positions. */
  def segment(text: String): Seq[Token] = {
    val out = new ArrayBuffer[Token]()
    val n = text.length
    var i = 0
    var pos = 0
    val sb = new java.lang.StringBuilder(32)
    def flush(): Unit = {
      var s = 0
      // scanner-buffer chop: emit <=255-char chunks, each its own position
      while (s < sb.length) {
        val e = math.min(s + MaxTokenLength, sb.length)
        out += Token(sb.substring(s, e), pos)
        pos += 1
        s = e
      }
      sb.setLength(0)
    }
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp >= 0x2600 && isEmojiBase(cp)) {
        if (sb.length > 0) flush()
        val e = emojiEnd(text, i)
        out += Token(text.substring(i, e), pos)
        pos += 1
        i = e
      } else if (isIdeograph(cp) || isHiragana(cp)) {
        if (sb.length > 0) flush()
        sb.appendCodePoint(cp)
        flush() // one token per ideograph / hiragana char
        i += w
      } else if (isWordChar(cp) || (isExtend(cp) && sb.length > 0)) {
        if (sb.length > 0 && scriptBreak(sb.codePointBefore(sb.length), cp)) flush()
        sb.appendCodePoint(cp)
        i += w
      } else if (sb.length > 0 && i + w < n && joins(cp, sb.codePointBefore(sb.length), text.codePointAt(i + w))) {
        sb.appendCodePoint(cp)
        i += w
      } else {
        if (sb.length > 0) flush()
        i += w
      }
    }
    if (sb.length > 0) flush()
    // trailing '_' or mid chars that never got a following word char stay in the
    // token only if followed by word chars; strip any trailing joiners now.
    out.map { t =>
      var e = t.term.length
      while (e > 0 && { val c = t.term.charAt(e - 1); c == '_' || c == '.' || c == ':' || c == '\'' || c == '\u2019' || c == ',' }) e -= 1
      if (e == t.term.length) t else t.copy(term = t.term.substring(0, e))
    }.filter(_.term.nonEmpty).toSeq
  }

  /** Segment + lowercase with character offsets into the original text
    * (the .pay/offsets tier's analysis pass — reference OffsetAttribute /
    * Lucene50PostingsFormat offsets). Terms/positions identical to
    * [[analyze]] (property-tested); offsets index the ORIGINAL string,
    * trailing stripped joiners excluded from `end`. */
  def analyzeWithOffsets(text: String): Seq[OffsetToken] = {
    val out = new ArrayBuffer[OffsetToken]()
    val n = text.length
    var i = 0
    var pos = 0
    var tokStart = -1
    val sb = new java.lang.StringBuilder(32)
    def flush(): Unit = {
      var s = 0
      val len = sb.length
      while (s < len) {
        val end = math.min(s + MaxTokenLength, len)
        var e = end
        while (e > s && { val c = sb.charAt(e - 1); c == '_' || c == '.' || c == ':' || c == '\'' || c == '\u2019' || c == ',' }) e -= 1
        if (e > s)
          out += OffsetToken(lowercase(sb.substring(s, e)), pos, tokStart + s, tokStart + e)
        // every chunk advances the position counter, even one emptied by
        // the joiner strip — segment() assigns positions BEFORE its strip
        // filter, leaving a hole (mirrored here for stream identity)
        pos += 1
        s = end
      }
      sb.setLength(0)
      tokStart = -1
    }
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp >= 0x2600 && isEmojiBase(cp)) {
        if (sb.length > 0) flush()
        val e = emojiEnd(text, i)
        out += OffsetToken(text.substring(i, e), pos, i, e)
        pos += 1
        i = e
      } else if (isIdeograph(cp) || isHiragana(cp)) {
        if (sb.length > 0) flush()
        tokStart = i
        sb.appendCodePoint(cp)
        flush() // one token per ideograph / hiragana char
        i += w
      } else if (isWordChar(cp) || (isExtend(cp) && sb.length > 0)) {
        if (sb.length > 0 && scriptBreak(sb.codePointBefore(sb.length), cp)) flush()
        if (sb.length == 0) tokStart = i
        sb.appendCodePoint(cp)
        i += w
      } else if (sb.length > 0 && i + w < n && joins(cp, sb.codePointBefore(sb.length), text.codePointAt(i + w))) {
        sb.appendCodePoint(cp)
        i += w
      } else {
        if (sb.length > 0) flush()
        i += w
      }
    }
    if (sb.length > 0) flush()
    out.toSeq
  }

  /** Full-Unicode lowercase, per code point (Character.toLowerCase semantics). */
  def lowercase(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** The full chain: segment -> lowercase. Stop set is empty by contract. */
  def analyze(text: String): Seq[Token] =
    segment(text).map(t => t.copy(term = lowercase(t.term)))

  /** Terms only (no positions). */
  def terms(text: String): Seq[String] = analyze(text).map(_.term)

  /**
   * Allocation-light hot path: stream lowercased terms into `f` without
   * materializing Token objects or intermediate Seqs. Semantics identical
   * to `analyze(text).foreach(t => f(t.term))` (property-tested) — this is
   * the per-doc kernel of the index build, where 32 concurrent tasks are
   * memory-bandwidth-bound, so garbage per token directly costs scaling.
   */
  def foreachTerm(text: String)(f: String => Unit): Unit = {
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(32)
    def flush(): Unit = {
      // chop into <=255-char chunks first (scanner-buffer semantics), then
      // strip trailing joiners per chunk and lowercase — exactly
      // segment() + the per-token strip + lowercase() of analyze()
      var s = 0
      val len = sb.length
      while (s < len) {
        val end = math.min(s + MaxTokenLength, len)
        var e = end
        while (e > s && { val c = sb.charAt(e - 1); c == '_' || c == '.' || c == ':' || c == '\'' || c == '\u2019' || c == ',' }) e -= 1
        if (e > s) f(lowercase(sb.substring(s, e)))
        s = end
      }
      sb.setLength(0)
    }
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      if (cp >= 0x2600 && isEmojiBase(cp)) {
        if (sb.length > 0) flush()
        val e = emojiEnd(text, i)
        f(text.substring(i, e))
        i = e
      } else if (isIdeograph(cp) || isHiragana(cp)) {
        if (sb.length > 0) flush()
        sb.appendCodePoint(cp)
        flush() // one token per ideograph / hiragana char
        i += w
      } else if (isWordChar(cp) || (isExtend(cp) && sb.length > 0)) {
        if (sb.length > 0 && scriptBreak(sb.codePointBefore(sb.length), cp)) flush()
        sb.appendCodePoint(cp)
        i += w
      } else if (sb.length > 0 && i + w < n && joins(cp, sb.codePointBefore(sb.length), text.codePointAt(i + w))) {
        sb.appendCodePoint(cp)
        i += w
      } else {
        if (sb.length > 0) flush()
        i += w
      }
    }
    if (sb.length > 0) flush()
  }

  /** Per-doc term frequencies and doc length in one allocation-light pass.
    * Returns a zero-copy read-only view of the internal map. */
  def termFreqs(text: String): (scala.collection.Map[String, Int], Int) = {
    val m = new java.util.HashMap[String, Int](64)
    var dl = 0
    foreachTerm(text) { t =>
      dl += 1
      val prev = m.getOrDefault(t, 0)
      m.put(t, prev + 1)
    }
    (scala.jdk.CollectionConverters.MapHasAsScala(m).asScala, dl)
  }
}
