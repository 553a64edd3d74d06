package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Word-for-word validation of the Snowball stemmers against the
  * published snowballstem.org test vocabularies (the same voc/output
  * pairs the reference's TestSnowballVocab runs). */
class SnowballVocabSpec extends AnyFunSuite {

  private def pairs(lang: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/snowball/$lang.tsv")
    require(in != null, s"missing /snowball/$lang.tsv")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { l =>
      val t = l.split('\t'); (t(0), if (t.length > 1) t(1) else "")
    }.toVector
    finally src.close()
  }

  private def check(lang: String, stem: String => String): Unit = {
    val vocab = pairs(lang)
    val bad = vocab.filter { case (w, want) => stem(w) != want }
    if (bad.nonEmpty) {
      val sample = bad.take(25).map { case (w, want) =>
        s"$w -> got '${stem(w)}' want '$want'"
      }.mkString("\n  ")
      fail(s"$lang: ${bad.size}/${vocab.size} mismatches\n  $sample")
    }
  }

  test("german vocabulary stems exactly") { check("german", Snowball.German.stem) }
  test("spanish vocabulary stems exactly") { check("spanish", Snowball.Spanish.stem) }
  test("french vocabulary stems exactly") { check("french", Snowball.French.stem) }
  test("italian vocabulary stems exactly") { check("italian", Snowball.Italian.stem) }
  test("portuguese vocabulary stems exactly") { check("portuguese", Snowball.Portuguese.stem) }
  test("danish vocabulary stems exactly") { check("danish", Snowball.Danish.stem) }
  test("norwegian vocabulary stems exactly") { check("norwegian", Snowball.Norwegian.stem) }
  test("swedish vocabulary stems exactly") { check("swedish", Snowball.Swedish.stem) }
  test("dutch vocabulary stems exactly") { check("dutch", Snowball.Dutch.stem) }
  test("russian vocabulary stems exactly") { check("russian", Snowball.Russian.stem) }
  test("romanian vocabulary stems exactly") { check("romanian", Snowball.Romanian.stem) }
  test("finnish vocabulary stems exactly") { check("finnish", Snowball.Finnish.stem) }
  test("hungarian vocabulary stems exactly") { check("hungarian", Snowball.Hungarian.stem) }
  test("turkish vocabulary stems exactly") { check("turkish", Snowball.Turkish.stem) }
  test("arabic vocabulary stems exactly") { check("arabic", Snowball.Arabic.stem) }
  test("german2 vocabulary stems exactly") { check("german2", Snowball.German2.stem) }
  test("lovins vocabulary stems exactly") { check("lovins", Snowball.Lovins.stem) }
  test("kraaij_pohlmann vocabulary stems exactly") {
    check("kraaij_pohlmann", Snowball.KraaijPohlmann.stem)
  }
  // The remaining six languages have no published snowballstem.org test
  // vocabulary; their goldens were produced by exercising the published
  // algorithms over a synthesized stem-by-suffix cross vocabulary that
  // covers every suffix-table entry under varied stem shapes.
  test("irish vocabulary stems exactly") { check("irish", Snowball.Irish.stem) }
  test("armenian vocabulary stems exactly") { check("armenian", Snowball.Armenian.stem) }
  test("lithuanian vocabulary stems exactly") {
    check("lithuanian", Snowball.Lithuanian.stem)
  }
  test("basque vocabulary stems exactly") { check("basque", Snowball.Basque.stem) }
  test("catalan vocabulary stems exactly") { check("catalan", Snowball.Catalan.stem) }
  test("estonian vocabulary stems exactly") { check("estonian", Snowball.Estonian.stem) }
  test("english (Porter2) vocabulary stems exactly") {
    check("english", Snowball.English.stem)
  }
  test("porter vocabulary stems exactly (words of length >= 3)") {
    // the reference PorterStemmer leaves words of length <= 2 unchanged
    // (PorterStemmer.java:479 `if (k > k0+1)`), matching our port; the
    // snowball demo variant stems them ('as'->'a', 's'->'') — those 12
    // two-letter rows are the only divergence, excluded by contract here
    val vocab = pairs("porter").filter(_._1.length >= 3)
    val bad = vocab.filter { case (w, want) => Porter.stem(w) != want }
    assert(bad.isEmpty, bad.take(10).mkString(", "))
    assert(vocab.size > 30000)
  }
}
