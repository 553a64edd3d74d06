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

  test("chain config round-trips through JSON") {
    val chains = Seq(
      AnalyzerChain.standard,
      AnalyzerChain(Seq(StopFilter(Set("the", "a", "of")))),
      AnalyzerChain(Seq(PorterStemFilter)),
      AnalyzerChain.english(Set("the", "a")),
      AnalyzerChain(Seq(
        StopFilter(Set("the")),
        SynonymFilter(Map("fast" -> Seq("quick"), "big" -> Seq("large", "huge"))),
        PorterStemFilter)))
    chains.foreach { c =>
      val rt = AnalyzerChain.fromJson(AnalyzerChain.toJson(c))
      assert(rt === c, AnalyzerChain.toJson(c))
      // behavior-equal, not just structurally equal
      assert(rt.terms("the fast big running tables") === c.terms("the fast big running tables"))
    }
  }
}
