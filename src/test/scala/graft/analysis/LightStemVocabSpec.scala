package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Word-for-word validation of the CLEF light/minimal stemmer family
  * against the reference's own golden vocabularies
  * (lucene/analysis/common/src/test/.../{de,fr,es,it,pt,ru,sv,fi,hu,gl,ckb}/
  * *testdata.zip and no/{nb,nn}_{light,minimal}.txt) — the same evidence
  * pattern as SnowballVocabSpec: ~420k pairs, all exact. */
class LightStemVocabSpec extends AnyFunSuite {

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
    assert(vocab.nonEmpty, s"$name vocabulary is empty")
    val bad = vocab.filter { case (w, want) => stem(w) != want }
    if (bad.nonEmpty) {
      val sample = bad.take(25).map { case (w, want) =>
        s"$w -> got '${stem(w)}' want '$want'"
      }.mkString("\n  ")
      fail(s"$name: ${bad.size}/${vocab.size} mismatches\n  $sample")
    }
  }

  test("german light vocabulary stems exactly") {
    check("de_light.tsv", LightStemmers.GermanLight.stem)
  }
  test("german minimal vocabulary stems exactly") {
    check("de_minimal.tsv", LightStemmers.GermanMinimal.stem)
  }
  test("french light vocabulary stems exactly") {
    check("fr_light.tsv", LightStemmers.FrenchLight.stem)
  }
  test("french minimal vocabulary stems exactly") {
    check("fr_minimal.tsv", LightStemmers.FrenchMinimal.stem)
  }
  test("spanish light vocabulary stems exactly") {
    check("es_light.tsv", LightStemmers.SpanishLight.stem)
  }
  test("italian light vocabulary stems exactly") {
    check("it_light.tsv", LightStemmers.ItalianLight.stem)
  }
  test("portuguese light vocabulary stems exactly") {
    check("pt_light.tsv", LightStemmers.PortugueseLight.stem)
  }
  test("portuguese minimal (RSLP-S) vocabulary stems exactly") {
    check("pt_minimal.tsv", Rslp.PortugueseMinimal.stem)
  }
  test("portuguese RSLP vocabulary stems exactly") {
    check("pt_rslp.tsv", Rslp.Portuguese.stem)
  }
  test("galician RSLP vocabulary stems exactly") {
    check("gl.tsv", Rslp.Galician.stem)
  }
  test("russian light vocabulary stems exactly") {
    check("ru_light.tsv", LightStemmers.RussianLight.stem)
  }
  test("swedish light vocabulary stems exactly") {
    check("sv_light.tsv", LightStemmers.SwedishLight.stem)
  }
  test("finnish light vocabulary stems exactly") {
    check("fi_light.tsv", LightStemmers.FinnishLight.stem)
  }
  test("hungarian light vocabulary stems exactly") {
    check("hu_light.tsv", LightStemmers.HungarianLight.stem)
  }
  test("norwegian bokmål light vocabulary stems exactly") {
    check("nb_light.txt", LightStemmers.norwegianLightNb.stem)
  }
  test("norwegian bokmål minimal vocabulary stems exactly") {
    check("nb_minimal.txt", LightStemmers.norwegianMinimalNb.stem)
  }
  test("norwegian nynorsk light vocabulary stems exactly") {
    check("nn_light.txt", LightStemmers.norwegianLightNn.stem)
  }
  test("norwegian nynorsk minimal vocabulary stems exactly") {
    check("nn_minimal.txt", LightStemmers.norwegianMinimalNn.stem)
  }
  test("sorani vocabulary normalizes+stems exactly") {
    check("ckb.tsv", LightStemmers.SoraniStem.stemNormalized)
  }

  test("light-stem filter round-trips through chain json for every language") {
    LightStemFilter.languages.foreach { lang =>
      val chain = AnalyzerChain(Seq(LightStemFilter(lang)))
      val back = AnalyzerChain.fromJson(AnalyzerChain.toJson(chain))
      assert(back.filters == chain.filters, lang)
    }
  }
}
