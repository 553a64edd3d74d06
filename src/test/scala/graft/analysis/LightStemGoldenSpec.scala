package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden-case validation for the second light-stemmer wave — languages
  * whose reference tests carry inline word→stem expectations instead of
  * vocabulary archives (extracted verbatim into
  * src/test/resources/lightstem/<lang>_golden.tsv / el.tsv). */
class LightStemGoldenSpec extends AnyFunSuite {

  private def pairs(name: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/lightstem/$name")
    require(in != null, s"missing /lightstem/$name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines()
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val t = l.split('\t'); (t(0), if (t.length > 1) t(1) else "") }
      .toVector
    finally src.close()
  }

  private def check(name: String, stem: String => String): Unit = {
    val vocab = pairs(name)
    assert(vocab.nonEmpty, s"$name golden set is empty")
    val bad = vocab.filter { case (w, want) => stem(w) != want }
    if (bad.nonEmpty) {
      val sample = bad.take(25).map { case (w, want) =>
        s"$w -> got '${stem(w)}' want '$want'"
      }.mkString("\n  ")
      fail(s"$name: ${bad.size}/${vocab.size} mismatches\n  $sample")
    }
  }

  test("greek: all reference golden cases stem exactly") {
    // the reference drives these through GreekAnalyzer (GreekLowerCaseFilter
    // then the stemmer); inputs carry tonos accents
    check("el.tsv", GreekStemmers.stemLowercased)
  }
  test("latvian: all reference golden cases stem exactly") {
    check("lv_golden.tsv", LightStemmers.LatvianLight.stem)
  }
  test("czech: all reference golden cases stem exactly") {
    // the reference drives these through CzechAnalyzer, which lowercases
    check("cz_golden.tsv", w => LightStemmers.CzechLight.stem(w.toLowerCase))
  }
  test("bulgarian: all reference golden cases stem exactly") {
    check("bg_golden.tsv", LightStemmers.BulgarianLight.stem)
  }
  test("indonesian: all reference golden cases stem exactly") {
    check("id_golden.tsv", LightStemmers.Indonesian.stem)
  }
  test("indonesian inflectional-only golden cases") {
    check("id_infl_golden.tsv", LightStemmers.Indonesian.stemInflectional)
  }
  test("hindi stemmer golden cases") {
    check("hi_stem_golden.tsv", IndicStemmers.HindiStem.stem)
  }
  test("hindi normalizer golden cases") {
    check("hi_norm_golden.tsv", IndicStemmers.HindiNormalizer.normalize)
  }
  test("bengali stemmer golden cases") {
    check("bn_stem_golden.tsv", IndicStemmers.BengaliStem.stem)
  }
  test("bengali normalizer golden cases") {
    check("bn_norm_golden.tsv", IndicStemmers.BengaliNormalizer.normalize)
  }
  test("arabic light stemmer golden cases (normalized input)") {
    // the reference chain runs ArabicNormalizationFilter before the stemmer
    check("ar_stem_golden.tsv", IndicStemmers.ArabicLight.stemNormalized)
  }
  test("arabic normalizer golden cases") {
    check("ar_norm_golden.tsv", IndicStemmers.ArabicNormalizer.normalize)
  }
  test("persian normalizer golden cases") {
    check("fa_norm_golden.tsv", IndicStemmers.PersianNormalizer.normalize)
  }
  test("brazilian: all reference golden cases stem exactly") {
    check("br_golden.tsv", Brazilian.stem)
  }
  test("kstem: all 12k reference golden pairs stem exactly") {
    check("kstem.tsv", KStem.stem)
    // filter + json round-trip
    val chain = AnalyzerChain(Seq(KStemFilter))
    // "running" is itself a lexicon entry and therefore NOT conflated —
    // the dictionary-validation property that distinguishes KStem
    assert(chain.terms("the memorials slowly running") ===
      Seq("the", "memorial", "slow", "running"))
    assert(AnalyzerChain.fromJson(AnalyzerChain.toJson(chain)) === chain)
  }

  test("wave-2 light-stem filters round-trip through chain json") {
    LightStemFilter.languages2.foreach { lang =>
      val chain = AnalyzerChain(Seq(LightStemFilter(lang)))
      val back = AnalyzerChain.fromJson(AnalyzerChain.toJson(chain))
      assert(back.filters == chain.filters, lang)
    }
  }
}
