package graft.analysis

/**
 * Pre-tokenizer character filters (the reference's CharFilter stage:
 * lucene/core/src/java/org/apache/lucene/analysis/CharFilter.java runs
 * text→text rewrites before the tokenizer sees the stream).
 *
 * Note on offsets: the chain's offsets tier (highlighting) is built from
 * the bare [[Analyzer]] over the raw stored text and never runs char
 * filters, so these rewrites affect term/position indexing only — the
 * reference's offset-correction machinery is therefore not needed here.
 */
trait CharFilter extends Serializable {
  def apply(text: String): String
}

/** Longest-match replacement over a literal mapping table
  * (charfilter/MappingCharFilter.java + NormalizeCharMap): at each input
  * position the longest matching key is replaced; on no match the char
  * passes through. */
final case class MappingCharFilter(mappings: Map[String, String]) extends CharFilter {
  require(mappings.keys.forall(_.nonEmpty), "empty mapping key")
  // group keys by first char, longest first — the scan is linear with a
  // bounded probe per position
  @transient private lazy val byFirst: Map[Char, Seq[(String, String)]] =
    mappings.toSeq.groupBy(_._1.charAt(0))
      .view.mapValues(_.sortBy(-_._1.length)).toMap
  def apply(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val cands = byFirst.getOrElse(text.charAt(i), Nil)
      cands.find { case (k, _) => text.regionMatches(i, k, 0, k.length) } match {
        case Some((k, v)) => sb.append(v); i += k.length
        case None => sb.append(text.charAt(i)); i += 1
      }
    }
    sb.toString
  }
}

/**
 * HTML/XML markup removal (the capability of charfilter/
 * HTMLStripCharFilter.jflex, re-expressed as a single-pass scanner —
 * a documented subset of the reference's full HTML-5 entity table):
 *
 *  - comments, processing instructions, doctype, and SCRIPT/STYLE
 *    element bodies are removed;
 *  - CDATA sections keep their inner text;
 *  - block-level tags (div/p/br/li/tr/h1…) become '\n' — words on
 *    either side never join (matching the reference's gold outputs);
 *    inline tags (a/b/span/…) are removed outright;
 *  - character entities decode: the common named set plus numeric
 *    decimal/hex forms; a bare '&' or '<' that opens no valid
 *    entity/tag passes through unchanged.
 */
case object HtmlStripCharFilter extends CharFilter {
  private val blockLevel = Set("address", "article", "aside", "blockquote",
    "br", "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
    "li", "main", "nav", "noscript", "ol", "p", "pre", "section", "table",
    "tbody", "td", "tfoot", "th", "thead", "tr", "ul")
  private val entities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "deg" -> "°",
    "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "frac12" -> "½", "sect" -> "§", "para" -> "¶",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "szlig" -> "ß", "Gamma" -> "Γ",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "pi" -> "π", "Omega" -> "Ω", "omega" -> "ω",
    "bull" -> "•", "dagger" -> "†", "prime" -> "′",
    "infin" -> "∞", "ne" -> "≠", "le" -> "≤", "ge" -> "≥")

  def apply(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (c == '<') {
        if (text.regionMatches(i, "<!--", 0, 4)) {
          val end = text.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (text.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val end = text.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          sb.append(text, i + 9, stop)
          i = if (end < 0) n else end + 3
        } else if (text.regionMatches(true, i, "<script", 0, 7)) {
          i = skipTagEnd(text, indexOfIgnoreCase(text, "</script", i))
        } else if (text.regionMatches(true, i, "<style", 0, 6)) {
          i = skipTagEnd(text, indexOfIgnoreCase(text, "</style", i))
        } else {
          // a real tag needs </, <!, <? or <letter
          val nameStart = if (i + 1 < n && (text.charAt(i + 1) == '/' ||
            text.charAt(i + 1) == '!' || text.charAt(i + 1) == '?')) i + 2 else i + 1
          if (nameStart <= n - 1 && nameStart > i &&
            (nameStart != i + 1 || Character.isLetter(text.charAt(nameStart)))) {
            val close = text.indexOf('>', i + 1)
            if (close < 0) { sb.append(c); i += 1 }
            else {
              var ne = nameStart
              while (ne < close && Character.isLetterOrDigit(text.charAt(ne))) ne += 1
              val name = text.substring(nameStart, ne).toLowerCase
              if (blockLevel.contains(name)) sb.append('\n')
              i = close + 1
            }
          } else { sb.append(c); i += 1 }
        }
      } else if (c == '&') {
        val sc = text.indexOf(';', i + 1)
        if (sc > i && sc - i <= 12) {
          val body = text.substring(i + 1, sc)
          val decoded =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.drop(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(body.drop(1).toInt)))
              catch { case _: Exception => None }
            else entities.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = sc + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Position just past the `>` that closes the tag starting at `from`. */
  private def skipTagEnd(text: String, from: Int): Int = {
    val close = text.indexOf('>', from)
    if (close < 0) text.length else close + 1
  }

  /** Case-insensitive indexOf without materializing a lowercased copy
    * (script-heavy documents would otherwise re-lowercase the whole text
    * per element). Returns text.length when absent. */
  private def indexOfIgnoreCase(text: String, needle: String, from: Int): Int = {
    var i = from
    val limit = text.length - needle.length
    while (i <= limit) {
      if (text.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    text.length
  }
}

/** Re-join words hyphenated across line breaks (the capability of
  * miscellaneous/HyphenatedWordsFilter.java, lifted to the char-filter
  * stage where this tokenizer can still see the hyphen): "hyphen-\n ated"
  * becomes "hyphenated". Only a hyphen directly followed by a newline
  * (plus surrounding spaces) joins — real compound hyphens stay. */
case object HyphenJoinCharFilter extends CharFilter {
  private val re = java.util.regex.Pattern.compile("""(\p{L})-[ \t]*\r?\n[ \t]*(\p{L})""")
  def apply(text: String): String = re.matcher(text).replaceAll("$1$2")
}
