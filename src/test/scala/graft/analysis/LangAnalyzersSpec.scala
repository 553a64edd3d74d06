package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Per-language analyzer presets: composition, stopword data, and
  * chain-JSON persistence across every language. */
class LangAnalyzersSpec extends AnyFunSuite {

  test("every preset loads, runs, and round-trips through chain json") {
    Analyzers.languages.foreach { lang =>
      val chain = Analyzers.forLanguage(lang)
      // runs on mixed text without error
      chain.terms("Hello world 42 test")
      val back = AnalyzerChain.fromJson(AnalyzerChain.toJson(chain))
      assert(back === chain, s"$lang failed json round-trip")
    }
  }

  test("french: elision + stop + snowball stemming") {
    val fr = Analyzers.forLanguage("fr")
    // l'avion -> elision -> stop keeps -> stems
    assert(fr.terms("l'avion et les châteaux") === Seq("avion", "château"))
  }

  test("english: possessive strip + stop + porter") {
    val en = Analyzers.forLanguage("en")
    assert(en.terms("the dog's bones") === Seq("dog", "bone"))
  }

  test("german: stop + normalization + light stemmer") {
    val de = Analyzers.forLanguage("de")
    // GermanNormalization folds umlauts before the light stemmer
    assert(de.terms("die Häuser und Bücher") ===
      Seq(LightStemmers.GermanLight.stem(GermanNormalizationFilter.normalize("häuser")),
        LightStemmers.GermanLight.stem(GermanNormalizationFilter.normalize("bücher"))))
  }

  test("stopword lists filter their language's function words") {
    assert(Analyzers.stopwords("fr").contains("les"))
    assert(Analyzers.stopwords("de").contains("und"))
    assert(Analyzers.stopwords("ru").contains("и"))
    assert(Analyzers.stopwords("ar").nonEmpty && Analyzers.stopwords("hi").nonEmpty)
    val ru = Analyzers.forLanguage("ru")
    assert(!ru.terms("книга и перо").contains("и"))
  }

  test("thai: dictionary word segmentation matches the reference goldens") {
    // TestThaiAnalyzer.java:44-47 / 67-71 expectations
    val chain = AnalyzerChain(Seq(ThaiWordFilter))
    assert(chain.terms("การที่ได้ต้องแสดงว่างานดี") ===
      Seq("การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"))
    val mixed = chain.analyze("การที่ได้ต้อง the แสดงว่างานดี")
    assert(mixed.map(_.term) ===
      Seq("การ", "ที่", "ได้", "ต้อง", "the", "แสดง", "ว่า", "งาน", "ดี"))
    // positions stay consecutive across the re-segmented runs
    assert(mixed.map(_.pos) === (0 until 9))
    val th = Analyzers.forLanguage("th")
    assert(th.terms("การที่ได้ต้องแสดงว่างานดี") ===
      Seq("แสดง", "งาน", "ดี")) // stopwords removed, per reference test
  }

  test("german normalization FSM examples") {
    assert(GermanNormalizationFilter.normalize("schön") === "schon")
    assert(GermanNormalizationFilter.normalize("weißbier") === "weissbier")
    // e after umlaut-state vowel deletes (ue-style digraph handling)
    assert(GermanNormalizationFilter.normalize("quellen") !== "qullen")
  }
}
