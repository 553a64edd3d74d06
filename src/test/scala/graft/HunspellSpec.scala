package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Hunspell

/**
 * Replays the reference's own hunspell stemmer suites
 * (lucene/analysis/common/src/test/org/apache/lucene/analysis/hunspell/
 * Test*.java, StemmerTestBase.assertStemsTo) from the transcribed golden
 * TSVs in src/test/resources/hunspell: each line is
 * `word \t stem1  stem2 ...` and comparison is order-insensitive
 * (the reference sorts both sides).
 */
class HunspellSpec extends AnyFunSuite {

  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/hunspell/$name")
    require(in != null, s"missing test resource: hunspell/$name")
    try in.readAllBytes() finally in.close()
  }

  private val goldens = Seq(
    "AlternateCasing", "CaseInsensitive", "CaseSensitive", "Circumfix",
    "ComplexPrefix", "Condition", "Condition2", "Conv", "Dependencies",
    "DoubleEscape", "Escaped", "FlagLong", "FlagNum", "FullStrip",
    "Homonyms", "Ignore", "KeepCase", "Morph", "MorphAlias", "MorphData",
    "NeedAffix", "OnlyInCompound", "OptionalCondition", "Spaces",
    "Stemmer", "StrangeOvergeneration", "TwoFold", "TwoSuffixes",
    "ZeroAffix", "ZeroAffix2")

  private val HeaderRe = """#aff=(\S+) dic=(\S+) ignoreCase=(True|False)""".r

  for (name <- goldens) test(s"hunspell golden: $name") {
    val lines = new String(resourceBytes(s"$name.golden.tsv"), "UTF-8")
      .split("\n").toSeq.map(_.stripSuffix("\r")).filter(_.nonEmpty)
    val (aff, dic, ignoreCase) = lines.head match {
      case HeaderRe(a, d, ic) => (a, d, ic == "True")
      case other => fail(s"bad golden header: $other")
    }
    val dict = Hunspell.load(resourceBytes(aff), resourceBytes(dic), ignoreCase)
    val stemmer = new Hunspell.Stemmer(dict)
    var checked = 0
    lines.tail.foreach { line =>
      val Array(word, stemsCol) = line.split("\t", 2) match {
        case Array(w) => Array(w, "")
        case a        => a
      }
      val expected =
        if (stemsCol.isEmpty) Seq.empty[String]
        else stemsCol.split("\u0001", -1).toSeq
      val actual = stemmer.stem(word)
      assert(actual.sorted == expected.sorted,
        s"$name: stem($word) = ${actual.sorted} expected ${expected.sorted}")
      checked += 1
    }
    assert(checked > 0, s"$name golden had no cases")
  }

  private def fixtureText(name: String): String =
    new String(resourceBytes(name), "UTF-8")

  test("filter: stem replacement, multi-stem overlap injection, pass-through") {
    val f = graft.analysis.HunspellStemFilter(
      fixtureText("simple.aff"), fixtureText("simple.dic"))
    // "lucene" has two stems: the root itself and lucen+e(A) — the first
    // replaces the token, the second is injected at the same position
    val (toks, overlaps) = f(
      Seq(graft.analysis.Token("lucene", 0), graft.analysis.Token("zebra", 1)),
      Seq(false, false))
    assert(toks.map(_.term) == Seq("lucene", "lucen", "zebra"))
    assert(toks.map(_.pos) == Seq(0, 0, 1))
    assert(overlaps == Seq(false, true, false))
  }

  test("filter: dedup collapses duplicate stems; longestOnly keeps one") {
    val aff = fixtureText("simple.aff"); val dic = fixtureText("simple.dic")
    // "foo" appears twice in the dic (foo/D, foo/E) so raw stemming
    // yields it twice; dedup (the default) collapses it
    val dedup = graft.analysis.HunspellStemFilter(aff, dic)
    val (t1, _) = dedup(Seq(graft.analysis.Token("foo", 0)), Seq(false))
    assert(t1.map(_.term) == Seq("foo"))
    val raw = graft.analysis.HunspellStemFilter(aff, dic, dedup = false)
    val (t2, o2) = raw(Seq(graft.analysis.Token("foo", 0)), Seq(false))
    assert(t2.map(_.term) == Seq("foo", "foo") && o2 == Seq(false, true))
    val longest = graft.analysis.HunspellStemFilter(aff, dic, longestOnly = true)
    val (t3, _) = longest(Seq(graft.analysis.Token("lucene", 0)), Seq(false))
    assert(t3.map(_.term) == Seq("lucene"))
  }

  test("sample english dictionary: two-layer prefix+suffix stripping") {
    val chain = graft.analysis.AnalyzerChain(Seq(
      graft.analysis.HunspellStemFilter(
        Hunspell.sampleEnglishAff, Hunspell.sampleEnglishDic)))
    assert(chain.terms("reworking indexes queried zebra") ==
      Seq("work", "index", "query", "zebra"))
    assert(chain.terms("merging caches rescored searches") ==
      Seq("merge", "cache", "score", "search"))
  }

  test("filter persists and restores through the chain json") {
    val chain = graft.analysis.AnalyzerChain(Seq(
      graft.analysis.HunspellStemFilter(
        Hunspell.sampleEnglishAff, Hunspell.sampleEnglishDic,
        ignoreCase = true, dedup = true, longestOnly = false)))
    val json = graft.analysis.AnalyzerChain.toJson(chain)
    val back = graft.analysis.AnalyzerChain.fromJson(json)
    assert(back == chain)
    assert(back.terms("Reworking INDEXES") == chain.terms("Reworking INDEXES"))
  }
}
