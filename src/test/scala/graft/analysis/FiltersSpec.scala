package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Porter stemmer goldens + filter-chain semantics. */
class PorterSpec extends AnyFunSuite {

  // golden pairs from the published algorithm description (Porter 1980),
  // covering every step
  private val goldens = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope",
    "callousness" -> "callous", "formaliti" -> "formal",
    "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens", "irritant" -> "irrit",
    "replacement" -> "replac", "adjustment" -> "adjust",
    "dependent" -> "depend", "adoption" -> "adopt", "homologou" -> "homolog",
    "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("golden pairs from the published algorithm") {
    goldens.foreach { case (in, out) =>
      assert(Porter.stem(in) === out, s"stem($in)")
    }
  }

  test("common query/corpus words") {
    assert(Porter.stem("running") === "run")
    assert(Porter.stem("query") === "queri")
    assert(Porter.stem("queries") === "queri")
    assert(Porter.stem("tables") === "tabl")
    assert(Porter.stem("table") === "tabl")
    assert(Porter.stem("customer") === "custom")
    assert(Porter.stem("merge") === "merg")
    assert(Porter.stem("merges") === "merg")
    assert(Porter.stem("merged") === "merg")
  }

  test("short and non-alphabetic terms pass through") {
    assert(Porter.stem("at") === "at")
    assert(Porter.stem("a") === "a")
    assert(Porter.stem("v2.0") === "v2.0")
    assert(Porter.stem("x86") === "x86")
    assert(Porter.stem("") === "")
  }

  test("stemming is idempotent on the corpus vocabulary") {
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line",
      "merge", "order", "part", "query", "row", "scan", "slow", "small",
      "sort", "spark", "stream", "table", "the", "value", "vector", "window")
    vocab.foreach { w =>
      val s = Porter.stem(w)
      assert(Porter.stem(s) === s, s"stem not idempotent at $w -> $s")
    }
  }
}

class FiltersSpec extends AnyFunSuite {

  test("stop filter leaves position holes (phrase gap semantics)") {
    val chain = AnalyzerChain(Seq(StopFilter(Set("the", "a"))))
    val toks = chain.analyze("the quick fox a lazy dog")
    assert(toks.map(_.term) === Seq("quick", "fox", "lazy", "dog"))
    // absolute positions preserved: holes at 0 and 3
    assert(toks.map(_.pos) === Seq(1, 2, 4, 5))
  }

  test("stop filter: dl counts surviving tokens only") {
    val chain = AnalyzerChain(Seq(StopFilter(Set("the"))))
    val (tfs, dl) = chain.termFreqs("the cat sat on the mat")
    assert(dl === 4)
    assert(!tfs.contains("the"))
    assert(tfs("cat") === 1)
  }

  test("porter stem filter stems terms, keeps positions") {
    val chain = AnalyzerChain(Seq(PorterStemFilter))
    val toks = chain.analyze("running queries merged")
    assert(toks.map(_.term) === Seq("run", "queri", "merg"))
    assert(toks.map(_.pos) === Seq(0, 1, 2))
  }

  test("snowball stem filter: per-language goldens through the chain") {
    // goldens cross-checked against the official snowballstem.org test
    // vocabularies (SnowballVocabSpec covers all 84k pairs; these spots
    // exercise umlaut removal, RV-limited verb suffixes, and undoubling)
    val de = AnalyzerChain(Seq(SnowballStemFilter("german")))
    assert(de.terms("häuser laufen schönheit bücher") ===
      Seq("haus", "lauf", "schonheit", "buch"))
    val es = AnalyzerChain(Seq(SnowballStemFilter("spanish")))
    assert(es.terms("casas corriendo felicidad niños") ===
      Seq("cas", "corr", "felic", "niñ"))
    val fr = AnalyzerChain(Seq(SnowballStemFilter("french")))
    assert(fr.terms("continuerait majestueux nationale chevaux") ===
      Seq("continu", "majestu", "national", "cheval"))
    intercept[IllegalArgumentException](SnowballStemFilter("klingon"))
  }

  test("synonym filter injects at the same position as an overlap") {
    val chain = AnalyzerChain(Seq(SynonymFilter(Map("fast" -> Seq("quick", "rapid")))))
    val (toks, overlaps) = chain.analyzeWithOverlaps("fast scan")
    assert(toks.map(t => (t.term, t.pos)) ===
      Seq(("fast", 0), ("quick", 0), ("rapid", 0), ("scan", 1)))
    assert(overlaps === Seq(false, true, true, false))
    // discountOverlaps: dl counts the 2 source tokens, tf counts synonyms
    val (tfs, dl) = chain.termFreqs("fast scan")
    assert(dl === 2)
    assert(tfs === Map("fast" -> 1, "quick" -> 1, "rapid" -> 1, "scan" -> 1))
  }

  test("stop + stem compose in order (english chain)") {
    val chain = AnalyzerChain.english(Set("the", "a"))
    assert(chain.terms("the running tables") === Seq("run", "tabl"))
  }

  test("empty chain is bit-compatible with the bare analyzer") {
    val texts = Seq("The Quick brown_Fox", "a b a c", "x1 42 v2.0", "")
    texts.foreach { t =>
      assert(AnalyzerChain.standard.analyze(t) === Analyzer.analyze(t))
      assert(AnalyzerChain.standard.termFreqs(t) === Analyzer.termFreqs(t))
    }
  }

  test("ascii folding: accents stripped, ligatures expanded, ascii untouched") {
    val chain = AnalyzerChain(Seq(AsciiFoldingFilter))
    assert(chain.terms("café naïve Zürich") === Seq("cafe", "naive", "zurich"))
    assert(chain.terms("straße œuvre Ærø") === Seq("strasse", "oeuvre", "aero"))
    assert(chain.terms("plain ascii7 text") === Seq("plain", "ascii7", "text"))
    // positions unchanged
    assert(chain.analyze("é b ç").map(_.pos) === Seq(0, 1, 2))
  }

  test("length filter drops out-of-range tokens leaving holes") {
    val chain = AnalyzerChain(Seq(LengthFilter(2, 4)))
    val toks = chain.analyze("a bb ccc dddd eeeee")
    assert(toks.map(_.term) === Seq("bb", "ccc", "dddd"))
    assert(toks.map(_.pos) === Seq(1, 2, 3))
  }

  test("shingle filter: adjacent bigrams as overlaps at the first position") {
    val chain = AnalyzerChain(Seq(ShingleFilter(maxShingleSize = 2)))
    val (toks, over) = chain.analyzeWithOverlaps("fast table scan")
    val uni = toks.zip(over).filter(!_._2).map(_._1)
    val shingles = toks.zip(over).filter(_._2).map(_._1)
    assert(uni.map(_.term) === Seq("fast", "table", "scan"))
    assert(shingles.map(t => (t.term, t.pos)) ===
      Seq(("fast table", 0), ("table scan", 1)))
    // dl discounts shingles (overlaps): 3 base tokens
    assert(chain.termFreqs("fast table scan")._2 === 3)
  }

  test("shingles do not join across stop-word holes") {
    val chain = AnalyzerChain(Seq(StopFilter(Set("the")), ShingleFilter(2)))
    val (toks, over) = chain.analyzeWithOverlaps("scan the table")
    val shingles = toks.zip(over).filter(_._2).map(_._1.term)
    assert(shingles.isEmpty) // 'scan'@0 and 'table'@2 are not adjacent
  }

  test("trigram shingles include bigrams and trigrams") {
    val chain = AnalyzerChain(Seq(ShingleFilter(maxShingleSize = 3)))
    val (toks, over) = chain.analyzeWithOverlaps("a b c d")
    val shingles = toks.zip(over).filter(_._2).map(_._1.term).sorted
    assert(shingles === Seq("a b", "a b c", "b c", "b c d", "c d").sorted)
  }

  test("edge ngram filter: prefixes stacked at the token position") {
    val chain = AnalyzerChain(Seq(EdgeNGramFilter(2, 3)))
    val (toks, over) = chain.analyzeWithOverlaps("spark ml")
    val got = toks.zip(over).map { case (t, o) => (t.term, t.pos, o) }
    assert(got === Seq(
      ("sp", 0, false), ("spa", 0, true), ("spark", 0, true),
      ("ml", 1, false)))
    // short token below minGram: preserved as original, not dropped
    val (t2, _) = chain.analyzeWithOverlaps("a")
    assert(t2.map(_.term) === Seq("a"))
  }

  test("word delimiter: case/alnum/acronym splits and possessive stem (reference goldens)") {
    // goldens from analysis/miscellaneous/WordDelimiterGraphFilter.java
    // javadoc + TestWordDelimiterGraphFilter expectations
    val wdf = WordDelimiterFilter(preserveOriginal = false)
    assert(wdf.parts("PowerShot") === Seq("Power", "Shot"))
    assert(wdf.parts("SD500") === Seq("SD", "500"))
    assert(wdf.parts("HTTPServer") === Seq("HTTP", "Server"))
    assert(wdf.parts("McKinley") === Seq("Mc", "Kinley"))
    assert(wdf.parts("j2se") === Seq("j", "2", "se"))
    assert(wdf.parts("O'Neil's") === Seq("O", "Neil")) // possessive 's stripped, ' splits
    assert(wdf.parts("parseConfig") === Seq("parse", "Config"))
    assert(wdf.parts("plain") === Seq("plain"))
    // no-alnum tokens (emoji clusters) pass through unsplit
    assert(wdf.parts("😀") === Seq("😀"))
  }

  test("word delimiter parts: property parity with an independent spec") {
    // independent reference: category-tag the chars, split where the
    // category pair is a boundary, drop delimiter chars
    def refParts(term: String): Seq[String] = {
      def c(ch: Char): Int =
        if (Character.isDigit(ch)) 3
        else if (Character.isLetter(ch)) { if (ch.isUpper || Character.isTitleCase(ch)) 2 else 1 }
        else 0
      if (!term.exists(c(_) != 0)) return Seq(term)
      val t = if (term.length > 2 && term(term.length - 2) == '\'' &&
        (term.last == 's' || term.last == 'S')) term.dropRight(2) else term
      val tagged = t.map(ch => (ch, c(ch)))
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var cur = new StringBuilder
      for (i <- tagged.indices) {
        val (ch, tc) = tagged(i)
        if (tc == 0) { if (cur.nonEmpty) { out += cur.toString; cur = new StringBuilder } }
        else {
          val boundary = cur.nonEmpty && {
            val pc = c(cur.last)
            (pc == 1 && tc == 2) || ((pc == 3) != (tc == 3)) ||
              (pc == 2 && tc == 2 && i + 1 < tagged.length && tagged(i + 1)._2 == 1)
          }
          if (boundary) { out += cur.toString; cur = new StringBuilder }
          cur += ch
        }
      }
      if (cur.nonEmpty) out += cur.toString
      out.toSeq
    }
    val wdf = WordDelimiterFilter(preserveOriginal = false)
    val rnd = new scala.util.Random(11)
    val pool = "aAbB9'_zZ05xY"
    for (_ <- 1 to 2000) {
      val s = Seq.fill(1 + rnd.nextInt(12))(pool(rnd.nextInt(pool.length))).mkString
      assert(wdf.parts(s) === refParts(s), s"input: $s")
    }
  }

  test("word delimiter chain: parts at consecutive positions, original as overlap") {
    val chain = AnalyzerChain(Nil, Some(WordDelimiterFilter(preserveOriginal = true)))
    val (toks, over) = chain.analyzeWithOverlaps("parseConfig fast")
    assert(toks.map(t => (t.term, t.pos)) ===
      Seq(("parseconfig", 0), ("parse", 0), ("config", 1), ("fast", 2)))
    assert(over === Seq(true, false, false, false))
    // dl discounts the preserved original (an overlap): parse, config, fast
    assert(chain.termFreqs("parseConfig fast")._2 === 3)
    // unsplit tokens carry no duplicate original
    val (t2, o2) = chain.analyzeWithOverlaps("plain text")
    assert(t2.map(t => (t.term, t.pos)) === Seq(("plain", 0), ("text", 1)))
    assert(o2 === Seq(false, false))
  }

  test("word delimiter runs pre-lowercase; downstream filters see split parts") {
    // post-lowercase the case information is gone — the dedicated slot is
    // what makes camelCase splitting possible at all
    val chain = AnalyzerChain(Seq(StopFilter(Set("config"))),
      Some(WordDelimiterFilter(preserveOriginal = false)))
    assert(chain.terms("parseConfig runs") === Seq("parse", "runs"))
  }

  test("chain config round-trips through JSON") {
    val chains = Seq(
      AnalyzerChain.standard,
      AnalyzerChain(Seq(StopFilter(Set("the"))),
        Some(WordDelimiterFilter(preserveOriginal = false, stemPossessive = true))),
      AnalyzerChain(Nil, Some(WordDelimiterFilter())),
      AnalyzerChain(Seq(StopFilter(Set("the", "a", "of")))),
      AnalyzerChain(Seq(PorterStemFilter)),
      AnalyzerChain.english(Set("the", "a")),
      AnalyzerChain(Seq(AsciiFoldingFilter, LengthFilter(2, 255))),
      AnalyzerChain(Seq(ShingleFilter(3, outputUnigrams = false))),
      AnalyzerChain(Seq(EdgeNGramFilter(1, 4, preserveOriginal = false))),
      AnalyzerChain(Seq(
        StopFilter(Set("the")),
        SynonymFilter(Map("fast" -> Seq("quick"), "big" -> Seq("large", "huge"))),
        PorterStemFilter)),
      AnalyzerChain(Seq(KeywordStemFilter(Set("tables"),
        Map("running" -> "sprint")))),
      AnalyzerChain(Seq(SnowballStemFilter("german"))),
      AnalyzerChain(Seq(StopFilter(Set("le", "la")), SnowballStemFilter("french"))))
    chains.foreach { c =>
      val rt = AnalyzerChain.fromJson(AnalyzerChain.toJson(c))
      assert(rt === c, AnalyzerChain.toJson(c))
      // behavior-equal, not just structurally equal
      assert(rt.terms("the fast big running tables") === c.terms("the fast big running tables"))
    }
  }

  test("KeywordStemFilter: override wins, protected words skip stemming, rest Porter-stems") {
    val f = KeywordStemFilter(Set("tables"), Map("running" -> "sprint"))
    val toks = Seq(Token("running", 0), Token("tables", 1), Token("jumping", 2))
    val (out, _) = f(toks, toks.map(_ => false))
    // override replaces (StemmerOverrideFilter) and is never re-stemmed
    assert(out(0).term == "sprint")
    // protected word passes unchanged (KeywordMarkerFilter)
    assert(out(1).term == "tables")
    // everything else Porter-stems; stand-alone Porter agrees
    assert(out(2).term == Porter.stem("jumping"))
    assert(Porter.stem("tables") != "tables", "test needs a word Porter would change")
  }
}
