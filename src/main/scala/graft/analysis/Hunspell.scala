package graft.analysis

import java.nio.charset.Charset
import scala.collection.mutable

/**
 * Hunspell affix-dictionary stemming — the reference's hunspell module
 * (lucene/analysis/common/src/java/org/apache/lucene/analysis/hunspell/
 * Dictionary.java:78, Stemmer.java:39), re-derived over plain Scala
 * collections instead of FSTs.
 *
 * A Hunspell dictionary is two text files: a `.aff` file declaring
 * prefix/suffix stripping rules (each with a strip string, an append
 * string, an optional continuation-flag list and a character-class
 * condition) plus global options (FLAG encoding, AF/AM aliases,
 * ICONV/OCONV longest-match rewrites, IGNORE chars, CIRCUMFIX /
 * KEEPCASE / NEEDAFFIX / ONLYINCOMPOUND marker flags, COMPLEXPREFIXES,
 * FULLSTRIP, LANG alternate casing), and a `.dic` file of root words,
 * each carrying a flag set and optional morphological data (`st:` stem
 * exceptions). Stemming strips up to two affix layers (prefix+suffix,
 * suffix+suffix, or with COMPLEXPREFIXES prefix+prefix+suffix) and
 * validates every candidate root against the dictionary and the rule
 * flags.
 *
 * Where the reference compiles words/affixes into FSTs and conditions
 * into run automata, this build keys plain hash maps by the affix
 * append text and matches conditions with a tiny character-class item
 * list — the dictionaries are broadcast once per executor and the hot
 * path is pure per-token CPU, so the idiomatic-Scala structure keeps
 * scale behavior identical (no shuffles, no driver state).
 *
 * Semantics validated word-for-word against the reference's own golden
 * fixtures (src/test/resources/hunspell, transcribed from the
 * reference's Test*.java assertStemsTo suites) in HunspellSpec.
 */
object Hunspell {

  /** One parsed PFX/SFX rule line (Dictionary.java:461 parseAffix). */
  final case class AffixRule(
      id: Int,
      flag: Char,
      strip: String,
      append: String,
      crossProduct: Boolean,
      cond: Condition,
      appendFlags: Array[Char], // sorted; continuation classes
      isSuffix: Boolean)

  /** Hunspell condition: a sequence of single-char matchers. The
    * reference compiles `cond.*` / `.*cond` regexes (Dictionary.java:104);
    * dash is escaped first ("dash hasn't got special meaning",
    * Dictionary.java:431), so the live syntax is exactly literals,
    * `.`, and (optionally negated) character classes — which this item
    * list matches directly against the rebuilt stem. */
  final class Condition private (items: Array[Condition.Item], val alwaysTrue: Boolean) {
    import Condition._
    private def matchItem(it: Item, c: Char): Boolean = it match {
      case Dot          => true
      case Lit(l)       => l == c
      case Cls(set, neg) => set.contains(c) != neg
    }
    /** condition anchored at the start (prefix rules: `cond.*`). */
    def matchesPrefix(s: CharSequence): Boolean =
      alwaysTrue || (s.length >= items.length &&
        items.indices.forall(i => matchItem(items(i), s.charAt(i))))
    /** condition anchored at the end (suffix rules: `.*cond`). */
    def matchesSuffix(s: CharSequence): Boolean =
      alwaysTrue || {
        val off = s.length - items.length
        off >= 0 && items.indices.forall(i => matchItem(items(i), s.charAt(off + i)))
      }
  }

  object Condition {
    private sealed trait Item
    private case object Dot extends Item
    private final case class Lit(c: Char) extends Item
    private final case class Cls(set: Set[Char], negated: Boolean) extends Item

    val True = new Condition(Array.empty, true)

    /** Parse the raw condition text (dash already literal per the
      * reference's escapeDash — we simply treat `-` and `\x` escapes as
      * literals everywhere). */
    def parse(cond: String): Condition = {
      val items = mutable.ArrayBuffer.empty[Item]
      var i = 0
      while (i < cond.length) {
        cond.charAt(i) match {
          case '[' =>
            var j = i + 1
            val negated = j < cond.length && cond.charAt(j) == '^'
            if (negated) j += 1
            val set = mutable.Set.empty[Char]
            while (j < cond.length && cond.charAt(j) != ']') {
              if (cond.charAt(j) == '\\' && j + 1 < cond.length) j += 1
              set += cond.charAt(j)
              j += 1
            }
            items += Cls(set.toSet, negated)
            i = j + 1 // past ']' (or end for the unterminated-gascon case)
          case '.' =>
            items += Dot; i += 1
          case '\\' if i + 1 < cond.length =>
            items += Lit(cond.charAt(i + 1)); i += 2
          case c =>
            items += Lit(c); i += 1
        }
      }
      new Condition(items.toArray, items.isEmpty)
    }
  }

  /** One root-word form: its sorted flag set plus the `st:` stem
    * exception if the entry carried one (Dictionary.java:1032). */
  final case class WordForm(flags: Array[Char], stemException: String) {
    def hasFlag(f: Int): Boolean =
      f >= 0 && java.util.Arrays.binarySearch(flags, f.toChar) >= 0
  }

  /** Longest-match character rewrite table (ICONV/OCONV;
    * Dictionary.java:1210 applyMappings). */
  final class ConvTable(mappings: Map[String, String]) extends Serializable {
    private val maxLen = if (mappings.isEmpty) 0 else mappings.keysIterator.map(_.length).max
    def isEmpty: Boolean = mappings.isEmpty
    def apply(s: CharSequence): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        var matched: String = null
        var matchedLen = 0
        var l = math.min(maxLen, s.length - i)
        while (l >= 1 && matched == null) {
          val cand = s.subSequence(i, i + l).toString
          mappings.get(cand) match {
            case Some(rep) => matched = rep; matchedLen = l
            case None      => l -= 1
          }
        }
        if (matched != null) { sb.append(matched); i += matchedLen }
        else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
  }

  /** How `FLAG` lines say flags are written (Dictionary.java:1060):
    * one char each (default / UTF-8), comma-separated numbers (`num`),
    * or two-ASCII-char pairs packed into one char (`long`). */
  private sealed trait FlagStrategy {
    def parseFlags(raw: String): Array[Char]
    final def parseFlag(raw: String): Char = {
      val fs = parseFlags(raw)
      require(fs.length == 1, s"expected one flag: $raw")
      fs(0)
    }
  }
  private object SimpleFlags extends FlagStrategy {
    def parseFlags(raw: String): Array[Char] = raw.toCharArray
  }
  private object NumFlags extends FlagStrategy {
    def parseFlags(raw: String): Array[Char] =
      raw.trim.split(",").iterator
        .map(_.replaceAll("[^0-9]", ""))
        .filter(_.nonEmpty)
        .map(s => Integer.parseInt(s).toChar)
        .toArray
  }
  private object LongFlags extends FlagStrategy {
    def parseFlags(raw: String): Array[Char] = {
      require(raw.length % 2 == 0, s"LONG flags need even length: $raw")
      Array.tabulate(raw.length / 2) { k =>
        val f1 = raw.charAt(2 * k); val f2 = raw.charAt(2 * k + 1)
        require(f1 < 256 && f2 < 256, s"LONG flags must be double ASCII: $raw")
        ((f1 << 8) | f2).toChar
      }
    }
  }

  /** Parsed dictionary. Rule lookup is keyed by the literal append
    * text; `words` maps each (cleaned) root to its homonym forms in
    * file order. */
  final class Dict(
      val words: Map[String, Array[WordForm]],
      val prefixByAppend: Map[String, Array[AffixRule]],
      val suffixByAppend: Map[String, Array[AffixRule]],
      val ignoreCase: Boolean,
      val complexPrefixes: Boolean,
      val twoStageAffix: Boolean,
      val fullStrip: Boolean,
      val alternateCasing: Boolean,
      val circumfix: Int,
      val keepcase: Int,
      val needaffix: Int,
      val onlyincompound: Int,
      ignoreChars: Array[Char], // sorted, may be empty
      iconv: ConvTable,
      oconv: ConvTable) extends Serializable {

    val needsInputCleaning: Boolean =
      ignoreCase || ignoreChars.nonEmpty || !iconv.isEmpty
    val needsOutputCleaning: Boolean = !oconv.isEmpty

    /** single-char case fold, Turkish/Azeri aware (Dictionary.java:1195). */
    def caseFold(c: Char): Char =
      if (alternateCasing) {
        if (c == 'I') '\u0131' else if (c == '\u0130') 'i' else Character.toLowerCase(c)
      } else Character.toLowerCase(c)

    /** IGNORE strip + on-the-fly case fold + ICONV (Dictionary.java:1160). */
    def cleanInput(input: CharSequence): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < input.length) {
        val ch = input.charAt(i)
        if (ignoreChars.isEmpty || java.util.Arrays.binarySearch(ignoreChars, ch) < 0) {
          sb.append(if (ignoreCase && iconv.isEmpty) caseFold(ch) else ch)
        }
        i += 1
      }
      if (!iconv.isEmpty) {
        val converted = iconv(sb)
        if (ignoreCase) converted.map(caseFold) else converted
      } else sb.toString
    }

    def applyOconv(s: String): String = if (oconv.isEmpty) s else oconv(s)
  }

  // ---------------------------------------------------------------- parsing

  private val EncodingAliases =
    Map("microsoft-cp1251" -> "windows-1251", "TIS620-2533" -> "TIS-620")

  /** First pass over the raw affix bytes: find the `SET <enc>` line
    * (Dictionary.java:632 getDictionaryEncoding). */
  private def dictionaryEncoding(aff: Array[Byte]): String = {
    val raw = new String(aff, Charset.forName("ISO-8859-1"))
    val SetRe = "^(?:\u005CuFEFF|\u00EF\u00BB\u00BF)?SET\\s+(.*)$".r
    raw.split("\n", -1).iterator.map(_.stripSuffix("\r")).foreach {
      case SetRe(enc) => return enc.trim
      case _          => ()
    }
    throw new IllegalArgumentException("affix file declares no SET encoding")
  }

  /** Parse aff+dic file contents into a [[Dict]]. Mirrors the reference
    * semantics (Dictionary.java:306 readAffixFile, :779
    * readDictionaryFiles) over mutable builders. */
  def load(aff: Array[Byte], dic: Array[Byte], ignoreCase: Boolean): Dict = {
    val encName = dictionaryEncoding(aff)
    val cs = Charset.forName(EncodingAliases.getOrElse(encName, encName))

    var flagStrategy: FlagStrategy = SimpleFlags
    var aliases: Array[String] = null
    var aliasCount = 0
    var morphAliases: Array[String] = null
    var morphAliasCount = 0
    var complexPrefixes = false
    var twoStageAffix = false
    var fullStrip = false
    var alternateCasing = false
    var circumfix, keepcase, needaffix, onlyincompound = -1
    var ignoreChars: Array[Char] = Array.empty
    var iconv = new ConvTable(Map.empty)
    var oconv = new ConvTable(Map.empty)
    def needsInputCleaning = ignoreCase || ignoreChars.nonEmpty || !iconv.isEmpty

    def caseFold1(c: Char): Char =
      if (alternateCasing) {
        if (c == 'I') '\u0131' else if (c == '\u0130') 'i' else Character.toLowerCase(c)
      } else Character.toLowerCase(c)
    def cleanNow(s: String): String = {
      val kept = s.filter(c =>
        ignoreChars.isEmpty || java.util.Arrays.binarySearch(ignoreChars, c) < 0)
      val folded = if (ignoreCase && iconv.isEmpty) kept.map(caseFold1) else kept
      val conv = if (iconv.isEmpty) folded else iconv(folded)
      if (!iconv.isEmpty && ignoreCase) conv.map(caseFold1) else conv
    }

    val prefixByAppend = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[AffixRule]]
    val suffixByAppend = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[AffixRule]]
    var nextRuleId = 0

    val affLines = new String(aff, cs).split("\n", -1).iterator
      .map(_.stripSuffix("\r")).toArray
    var li = 0
    def aliasValue(id: Int): String = aliases(id - 1)

    def parseAffixBlock(header: String, isSuffix: Boolean): Unit = {
      val args = header.trim.split("\\s+")
      val crossProduct = args(2) == "Y"
      val numLines = args(3).toInt
      val target = if (isSuffix) suffixByAppend else prefixByAppend
      var k = 0
      while (k < numLines) {
        li += 1
        val ruleArgs = affLines(li).trim.split("\\s+")
        require(ruleArgs.length >= 4, s"affix rule too short: ${affLines(li)}")
        val flag = flagStrategy.parseFlag(ruleArgs(1))
        val strip = if (ruleArgs(2) == "0") "" else ruleArgs(2)
        var affixArg = ruleArgs(3)
        var appendFlags: Array[Char] = Array.empty
        val flagSep = affixArg.lastIndexOf('/')
        if (flagSep != -1) {
          var flagPart = affixArg.substring(flagSep + 1)
          affixArg = affixArg.substring(0, flagSep)
          if (aliasCount > 0) flagPart = aliasValue(flagPart.toInt)
          appendFlags = flagStrategy.parseFlags(flagPart).sorted
          twoStageAffix = true
        }
        if (affixArg == "0") affixArg = ""
        var condition = if (ruleArgs.length > 4) ruleArgs(4) else "."
        // gascon fixture quirk: unterminated class gets closed
        if (condition.startsWith("[") && !condition.contains(']')) condition += "]"
        val cond =
          if (condition == "." || condition == strip) Condition.True
          else Condition.parse(condition)
        if (needsInputCleaning) affixArg = cleanNow(affixArg)
        val rule = AffixRule(nextRuleId, flag, strip, affixArg, crossProduct,
          cond, appendFlags, isSuffix)
        nextRuleId += 1
        target.getOrElseUpdate(affixArg, mutable.ArrayBuffer.empty) += rule
        k += 1
      }
    }

    def parseConversions(count: Int): ConvTable = {
      val m = mutable.Map.empty[String, String]
      var k = 0
      while (k < count) {
        li += 1
        val parts = affLines(li).trim.split("\\s+")
        require(parts.length == 3, s"invalid conversion: ${affLines(li)}")
        m += parts(1) -> parts(2)
        k += 1
      }
      new ConvTable(m.toMap)
    }

    while (li < affLines.length) {
      val line0 = affLines(li)
      val line = if (li == 0 && line0.startsWith("\uFEFF")) line0.substring(1) else line0
      if (line.startsWith("AF")) {
        val parts = line.trim.split("\\s+")
        if (aliases == null) aliases = new Array[String](parts(1).toInt)
        else { aliases(aliasCount) = if (parts.length == 1) "" else parts(1); aliasCount += 1 }
      } else if (line.startsWith("AM")) {
        if (morphAliases == null) morphAliases = new Array[String](line.substring(3).trim.toInt)
        else { morphAliases(morphAliasCount) = line.substring(2); morphAliasCount += 1 }
      } else if (line.startsWith("PFX")) {
        parseAffixBlock(line, isSuffix = false)
      } else if (line.startsWith("SFX")) {
        parseAffixBlock(line, isSuffix = true)
      } else if (line.startsWith("FLAG")) {
        flagStrategy = line.trim.split("\\s+")(1) match {
          case "num"   => NumFlags
          case "long"  => LongFlags
          case "UTF-8" => SimpleFlags
          case other   => throw new IllegalArgumentException(s"unknown flag type: $other")
        }
      } else if (line.trim == "COMPLEXPREFIXES") {
        complexPrefixes = true
      } else if (line.startsWith("CIRCUMFIX")) {
        circumfix = flagStrategy.parseFlag(line.trim.split("\\s+")(1))
      } else if (line.startsWith("KEEPCASE")) {
        keepcase = flagStrategy.parseFlag(line.trim.split("\\s+")(1))
      } else if (line.startsWith("NEEDAFFIX") || line.startsWith("PSEUDOROOT")) {
        needaffix = flagStrategy.parseFlag(line.trim.split("\\s+")(1))
      } else if (line.startsWith("ONLYINCOMPOUND")) {
        onlyincompound = flagStrategy.parseFlag(line.trim.split("\\s+")(1))
      } else if (line.startsWith("IGNORE")) {
        ignoreChars = line.trim.split("\\s+")(1).toCharArray.sorted
      } else if (line.startsWith("ICONV") || line.startsWith("OCONV")) {
        val parts = line.trim.split("\\s+")
        val table = parseConversions(parts(1).toInt)
        if (parts(0) == "ICONV") iconv = table else oconv = table
      } else if (line.startsWith("FULLSTRIP")) {
        fullStrip = true
      } else if (line.startsWith("LANG")) {
        val language = line.substring("LANG".length).trim
        alternateCasing = language == "tr_TR" || language == "az_AZ"
      }
      li += 1
    }

    // ------------------------------------------------------------- dic pass
    // Entry syntax (Dictionary.java:711 unescapeEntry, :741 morphBoundary):
    // word[/flags][ morph...] where backslash escapes the next char, the
    // word may contain spaces (morph data starts at a tab or at a
    // `xx:`-shaped field), and homonym lines each keep their own form.
    def morphBoundary(line: String): Int = {
      def spaceOrTab(from: Int): Int = {
        val p1 = line.indexOf('\t', from); val p2 = line.indexOf(' ', from)
        if (p1 >= 0 && p2 >= 0) math.min(p1, p2) else math.max(p1, p2)
      }
      var end = spaceOrTab(0)
      if (end == -1) return line.length
      while (end >= 0 && end < line.length) {
        if (line.charAt(end) == '\t' ||
            (end + 3 < line.length && Character.isLetter(line.charAt(end + 1)) &&
              Character.isLetter(line.charAt(end + 2)) && line.charAt(end + 3) == ':'))
          return end
        end = spaceOrTab(end + 1)
      }
      if (end == -1) line.length else end
    }

    // raw parsed entries: (word, flagText-or-null, morph-or-null)
    final case class RawEntry(word: String, flagPart: String, morph: String)
    val rawEntries = mutable.ArrayBuffer.empty[RawEntry]
    val dicLines = new String(dic, cs).split("\n", -1).iterator
      .map(_.stripSuffix("\r")).toArray
    var di = 1 // first line is the (approximate) entry count
    while (di < dicLines.length) {
      val line = dicLines(di)
      if (line.nonEmpty && line.charAt(0) != '/' && line.charAt(0) != '#' &&
          line.charAt(0) != '\t') {
        val end = morphBoundary(line)
        // unescape the word part; the first unescaped '/' splits flags
        val sb = new StringBuilder
        var flagSep = -1
        var i = 0
        while (i < end) {
          val ch = line.charAt(i)
          if (ch == '\\' && i + 1 < line.length) { sb.append(line.charAt(i + 1)); i += 2 }
          else {
            if (ch == '/' && flagSep == -1) flagSep = sb.length
            sb.append(ch); i += 1
          }
        }
        val wordAndFlags = sb.toString
        val (word0, flagPart) =
          if (flagSep == -1) (wordAndFlags, null)
          else (wordAndFlags.substring(0, flagSep), wordAndFlags.substring(flagSep + 1))
        val morph = if (end < line.length) line.substring(end) else null
        val word = if (needsInputCleaning) cleanNow(word0) else word0
        rawEntries += RawEntry(word, flagPart, morph)
      }
      di += 1
    }

    def parseStemException(morphData: String): String = {
      var md = morphData
      if (morphAliasCount > 0) {
        try { md = morphAliases(md.trim.toInt - 1) }
        catch { case _: NumberFormatException => () }
      }
      var index = md.indexOf(" st:")
      if (index < 0) index = md.indexOf("\tst:")
      if (index < 0) return null
      def spaceOrTab(from: Int): Int = {
        val p1 = md.indexOf('\t', from); val p2 = md.indexOf(' ', from)
        if (p1 >= 0 && p2 >= 0) math.min(p1, p2) else math.max(p1, p2)
      }
      var endIdx = spaceOrTab(index + 1)
      if (endIdx < 0) endIdx = md.length
      md.substring(index + 4, endIdx)
    }

    val words = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[WordForm]]
    rawEntries.foreach { e =>
      val flags =
        if (e.flagPart == null) Array.empty[Char]
        else {
          val fp = if (aliasCount > 0) aliasValue(e.flagPart.trim.toInt) else e.flagPart
          flagStrategy.parseFlags(fp).sorted
        }
      val exception = if (e.morph == null) null else parseStemException(e.morph)
      words.getOrElseUpdate(e.word, mutable.ArrayBuffer.empty) +=
        WordForm(flags, exception)
    }

    new Dict(
      words.iterator.map { case (w, fs) => (w, fs.toArray) }.toMap,
      prefixByAppend.iterator.map { case (k, v) => (k, v.toArray) }.toMap,
      suffixByAppend.iterator.map { case (k, v) => (k, v.toArray) }.toMap,
      ignoreCase, complexPrefixes, twoStageAffix, fullStrip, alternateCasing,
      circumfix, keepcase, needaffix, onlyincompound, ignoreChars, iconv, oconv)
  }

  /** Convenience: already-decoded file contents. Re-encodes with the
    * charset the affix file itself declares so the byte-level parse sees
    * exactly what a file on disk would. */
  def load(aff: String, dic: String, ignoreCase: Boolean): Dict = {
    val SetRe = "^\u005CuFEFF?SET\\s+(.*)$".r
    val enc = aff.split("\n").iterator.map(_.stripSuffix("\r")).collectFirst {
      case SetRe(e) => e.trim
    }.getOrElse("UTF-8")
    val cs = Charset.forName(EncodingAliases.getOrElse(enc, enc))
    load(aff.getBytes(cs), dic.getBytes(cs), ignoreCase)
  }

  /** Built-in compact English dictionary (resources/graft/hunspell_en.*):
    * a one-prefix / three-suffix-family grammar over fourteen corpus
    * roots — enough surface for the `--hunspell` CLI preset and the
    * ta_hunspell driver oracle without shipping a national dictionary. */
  lazy val sampleEnglishAff: String = resourceText("/graft/hunspell_en.aff")
  lazy val sampleEnglishDic: String = resourceText("/graft/hunspell_en.dic")

  private def resourceText(name: String): String = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource: $name")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  // --------------------------------------------------------------- stemming

  /** The stemming algorithm (Stemmer.java:90 stem, :171 doStem, :295
    * recursive strip, :507 applyAffix): generate every dictionary root
    * reachable by removing at most two affix layers, with cross-product,
    * continuation-class, circumfix-pairing, keepcase, needaffix and
    * onlyincompound gating, plus upper/title case-variant unioning. */
  final class Stemmer(dict: Dict) extends Serializable {

    def stem(word0: String): Seq[String] = {
      val word = if (dict.needsInputCleaning) dict.cleanInput(word0) else word0
      caseOf(word) match {
        case UpperCase =>
          val title = foldTitle(word)
          doStem(word, caseVariant = false) ++
            doStem(title, caseVariant = true) ++
            doStem(foldLower(title), caseVariant = true)
        case TitleCase =>
          doStem(word, caseVariant = false) ++
            doStem(foldLower(word), caseVariant = true)
        case ExactCase =>
          doStem(word, caseVariant = false)
      }
    }

    def uniqueStems(word: String): Seq[String] = {
      val all = stem(word)
      val seen = mutable.Set.empty[String]
      all.filter { s =>
        val key = if (dict.ignoreCase) s.toLowerCase else s
        seen.add(key)
      }
    }

    private sealed trait CaseType
    private case object ExactCase extends CaseType
    private case object TitleCase extends CaseType
    private case object UpperCase extends CaseType

    private def caseOf(word: String): CaseType = {
      if (dict.ignoreCase || word.isEmpty || !Character.isUpperCase(word.charAt(0)))
        return ExactCase
      var seenUpper = false; var seenLower = false
      var i = 1
      while (i < word.length) {
        if (Character.isUpperCase(word.charAt(i))) seenUpper = true else seenLower = true
        i += 1
      }
      if (!seenLower) UpperCase else if (!seenUpper) TitleCase else ExactCase
    }

    /** fold all but the first char (Stemmer.java:156 caseFoldTitle). */
    private def foldTitle(word: String): String =
      if (word.length <= 1) word
      else word.charAt(0) + word.substring(1).map(dict.caseFold)

    /** fold only the first char (Stemmer.java:165 caseFoldLower). */
    private def foldLower(word: String): String =
      if (word.isEmpty) word else dict.caseFold(word.charAt(0)) + word.substring(1)

    private def newStem(root: String, form: WordForm): String = {
      val base = if (form.stemException != null) form.stemException else root
      if (dict.needsOutputCleaning) dict.applyOconv(base) else base
    }

    private def doStem(word: String, caseVariant: Boolean): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      dict.words.get(word).foreach(_.foreach { form =>
        val keepcaseBlocked = caseVariant && form.hasFlag(dict.keepcase)
        if (!keepcaseBlocked && !form.hasFlag(dict.needaffix) &&
            !form.hasFlag(dict.onlyincompound))
          out += newStem(word, form)
      })
      out ++= strip(word, previous = -1, prevFlag = -1, prefixFlag = -1,
        depth = 0, doPrefix = true, doSuffix = true, previousWasPrefix = false,
        circumfix = false, caseVariant = caseVariant)
      out.toSeq
    }

    private def crossChecked(flag: Int, flags: Array[Char], matchEmpty: Boolean): Boolean =
      (flags.isEmpty && matchEmpty) ||
        java.util.Arrays.binarySearch(flags, flag.toChar) >= 0

    /** is this rule applicable at this recursion level? (the
      * onlyincompound / continuation-class gate, Stemmer.java:338). */
    private def compatible(rule: AffixRule, depth: Int, prevFlag: Int,
        previousWasPrefix: Boolean): Boolean =
      if (depth == 0) {
        dict.onlyincompound == -1 ||
          !crossChecked(dict.onlyincompound, rule.appendFlags, matchEmpty = false)
      } else if (rule.crossProduct) {
        val allowed = dict.onlyincompound == -1 ||
          !crossChecked(dict.onlyincompound, rule.appendFlags, matchEmpty = false)
        val matchEmpty = rule.isSuffix && previousWasPrefix
        allowed && crossChecked(prevFlag, rule.appendFlags, matchEmpty)
      } else false

    /** Try every prefix length (0 until limit) and suffix length (0 to
      * length-limit) of `word` against the rule maps (Stemmer.java:295's
      * FST walk, re-expressed as substring lookups). `previous` is the
      * rule just removed — the same rule is never removed twice in a
      * row. */
    private def strip(word: String, previous: Int, prevFlag: Int, prefixFlag: Int,
        depth: Int, doPrefix: Boolean, doSuffix: Boolean,
        previousWasPrefix: Boolean, circumfix: Boolean,
        caseVariant: Boolean): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      val length = word.length

      if (doPrefix && dict.prefixByAppend.nonEmpty) {
        // a prefix may consume the whole word only under FULLSTRIP
        val limit = if (dict.fullStrip) length else length - 1
        var i = 0
        while (i < limit) {
          dict.prefixByAppend.get(word.substring(0, i)).foreach(_.foreach { rule =>
            if (rule.id != previous &&
                compatible(rule, depth, prevFlag, previousWasPrefix)) {
              val stripped = rule.strip + word.substring(i)
              if (rule.cond.matchesPrefix(stripped))
                out ++= applyAffix(stripped, rule, prefixFlag = -1, depth,
                  isPrefix = true, circumfix, caseVariant)
            }
          })
          i += 1
        }
      }

      if (doSuffix && dict.suffixByAppend.nonEmpty) {
        // a suffix may consume the whole word only under FULLSTRIP
        val limit = if (dict.fullStrip) 0 else 1
        var i = length
        while (i >= limit) {
          dict.suffixByAppend.get(word.substring(i)).foreach(_.foreach { rule =>
            if (rule.id != previous &&
                compatible(rule, depth, prevFlag, previousWasPrefix)) {
              val stripped = word.substring(0, i) + rule.strip
              if (rule.cond.matchesSuffix(stripped))
                out ++= applyAffix(stripped, rule, prefixFlag, depth,
                  isPrefix = false, circumfix, caseVariant)
            }
          })
          i -= 1
        }
      }

      out.toSeq
    }

    /** Validate the rebuilt root against the dictionary and recurse for
      * the second affix layer (Stemmer.java:507 applyAffix). */
    private def applyAffix(stripped: String, rule: AffixRule, prefixFlag: Int,
        depth: Int, isPrefix: Boolean, circumfix0: Boolean,
        caseVariant: Boolean): Seq[String] = {
      val out = mutable.ArrayBuffer.empty[String]

      dict.words.get(stripped).foreach(_.foreach { form =>
        if (form.hasFlag(rule.flag)) {
          // with COMPLEXPREFIXES the first prefix was already chained
          // against the second, so it isn't re-checked against the word
          val chainedPrefix = dict.complexPrefixes && depth == 1 && isPrefix
          val prefixOk = chainedPrefix || prefixFlag < 0 ||
            form.hasFlag(prefixFlag) ||
            crossChecked(prefixFlag, rule.appendFlags, matchEmpty = false)
          // circumfix halves must pair up: a circumfix-marked prefix
          // requires a circumfix-marked suffix, and vice versa
          val circumfixOk = dict.circumfix == -1 ||
            circumfix0 == crossChecked(dict.circumfix, rule.appendFlags, matchEmpty = false)
          val keepcaseOk = !(caseVariant && form.hasFlag(dict.keepcase))
          val compoundOk = !form.hasFlag(dict.onlyincompound)
          if (prefixOk && circumfixOk && keepcaseOk && compoundOk)
            out += newStem(stripped, form)
        }
      })

      // a circumfix-marked prefix arms the pairing requirement for the
      // suffix layer below
      val circumfix =
        if (dict.circumfix != -1 && !circumfix0 && isPrefix)
          crossChecked(dict.circumfix, rule.appendFlags, matchEmpty = false)
        else circumfix0

      if (rule.crossProduct) {
        if (depth == 0) {
          if (isPrefix) {
            // first prefix removed: COMPLEXPREFIXES chains a second
            // prefix (plus a suffix); otherwise just a suffix
            out ++= strip(stripped, rule.id, rule.flag, prefixFlag = rule.flag,
              depth = 1, doPrefix = dict.complexPrefixes && dict.twoStageAffix,
              doSuffix = true, previousWasPrefix = true, circumfix, caseVariant)
          } else if (!dict.complexPrefixes && dict.twoStageAffix) {
            // first suffix removed: chain a second suffix
            out ++= strip(stripped, rule.id, rule.flag, prefixFlag,
              depth = 1, doPrefix = false, doSuffix = true,
              previousWasPrefix = false, circumfix, caseVariant)
          }
        } else if (depth == 1) {
          if (isPrefix && dict.complexPrefixes) {
            // second prefix removed: look for the suffix
            out ++= strip(stripped, rule.id, rule.flag, prefixFlag = rule.flag,
              depth = 2, doPrefix = false, doSuffix = true,
              previousWasPrefix = true, circumfix, caseVariant)
          } else if (!isPrefix && !dict.complexPrefixes && dict.twoStageAffix) {
            // prefix+suffix removed: look for a second suffix
            out ++= strip(stripped, rule.id, rule.flag, prefixFlag,
              depth = 2, doPrefix = false, doSuffix = true,
              previousWasPrefix = false, circumfix, caseVariant)
          }
        }
      }

      out.toSeq
    }
  }
}
