package graft.analysis

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhoneticSpec extends SparkSpec {
  import spark.implicits._

  test("soundex: classic published golden codes") {
    val goldens = Map(
      "robert" -> "R163", "rupert" -> "R163",
      "ashcraft" -> "A261", "ashcroft" -> "A261", // h does not separate equal codes
      "tymczak" -> "T522",                        // vowel separates equal codes
      "pfister" -> "P236",                        // f collapses into first-letter code
      "honeyman" -> "H555",
      "jackson" -> "J250",
      "join" -> "J500", "joyn" -> "J500", "jawn" -> "J500",
      "a" -> "A000", "w" -> "W000",
      "spark" -> "S162", "sprak" -> "S162")       // phonetically equal misspelling
    goldens.foreach { case (w, c) =>
      assert(Soundex.encode(w) === c, s"encode($w)")
    }
  }

  test("soundex: non-letter-initial tokens pass through unchanged") {
    Seq("42", "4abc", "", "中文").foreach { t =>
      assert(Soundex.encode(t) === t)
    }
  }

  test("soundex: Column implementation matches the scalar on corpus vocab + fuzz") {
    val rnd = new scala.util.Random(42)
    val fuzz = (1 to 400).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (1 to len).map(_ => "abcdefghijklmnopqrstuvwxyz0123456789".charAt(rnd.nextInt(36))).mkString
    }
    val vocab = Seq("spark", "query", "join", "data", "group", "filter", "window",
      "customer", "merge", "hash", "scan", "batch", "slow", "fast", "the",
      "handler7", "42", "a1b2", "wwhh", "aeiou", "bbbb", "xzxz") ++ fuzz
    val got = vocab.toDF("tok")
      .select(col("tok"), Soundex.encodeCol(col("tok")).as("code"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    vocab.foreach { t =>
      assert(got(t) === Soundex.encode(t), s"column vs scalar on '$t'")
    }
  }

  test("PhoneticFilter inject=true adds the code at the same position as an overlap") {
    val chain = AnalyzerChain(Seq(PhoneticFilter(inject = true)))
    val (toks, overlaps) = chain.analyzeWithOverlaps("robert joins")
    val byTerm = toks.map(_.term).zip(overlaps)
    assert(byTerm.contains(("robert", false)) && byTerm.contains(("R163", true)))
    assert(byTerm.contains(("joins", false)) && byTerm.contains(("J520", true)))
    // injected code shares its source token's position
    val pos = toks.groupBy(_.term).view.mapValues(_.head.pos).toMap
    assert(pos("R163") === pos("robert"))
    // dl counts non-overlap tokens only
    assert(chain.termFreqs("robert joins")._2 === 2)
  }

  test("PhoneticFilter inject=false replaces terms; chain JSON roundtrips") {
    val chain = AnalyzerChain(Seq(PhoneticFilter(inject = false)))
    assert(chain.terms("robert joins") === Seq("R163", "J520"))
    val json = AnalyzerChain.toJson(chain)
    assert(AnalyzerChain.fromJson(json) === chain)
    val inj = AnalyzerChain(Seq(StopFilter(Set("the")), PhoneticFilter()))
    assert(AnalyzerChain.fromJson(AnalyzerChain.toJson(inj)) === inj)
  }

  // The reference's TestPhoneticFilter / TestDoubleMetaphoneFilter /
  // TestDaitchMokotoffSoundexFilter inline expectations, inject and
  // replace modes (codes and originals share a position; the set of
  // emitted terms is what matters for matching).
  private def emitted(enc: String, inject: Boolean, text: String): Seq[String] =
    AnalyzerChain(Seq(PhoneticFilter(inject, enc))).terms(text)

  test("metaphone matches the reference test vectors") {
    assert(emitted("metaphone", true, "aaa bbb ccc easgasg").toSet ===
      Set("A", "aaa", "B", "bbb", "KKK", "ccc", "ESKS", "easgasg"))
    assert(emitted("metaphone", false, "aaa bbb ccc easgasg") ===
      Seq("A", "B", "KKK", "ESKS"))
  }
  test("double metaphone matches the reference test vectors") {
    assert(emitted("dmetaphone", true, "aaa bbb ccc easgasg").toSet ===
      Set("A", "aaa", "PP", "bbb", "KK", "ccc", "ASKS", "easgasg"))
    assert(emitted("dmetaphone", false, "aaa bbb ccc easgasg") ===
      Seq("A", "PP", "KK", "ASKS"))
    // primary + alternate at one position (TestDoubleMetaphoneFilter
    // testAlternateInjectFalse: "Kuczewski" -> KSSK, KXFS)
    assert(emitted("dmetaphone", false, "kuczewski") === Seq("KSSK", "KXFS"))
  }
  test("refined soundex matches the reference test vectors") {
    assert(emitted("rsoundex", false, "aaa bbb ccc easgasg") ===
      Seq("A0", "B1", "C3", "E034034"))
  }
  test("caverphone2 matches the reference test vectors") {
    assert(emitted("caverphone", false, "Darda Karleen Datha Carlene") ===
      Seq("TTA1111111", "KLN1111111", "TTA1111111", "KLN1111111"))
  }
  test("nysiis matches the reference test vectors") {
    assert(emitted("nysiis", false, "aaa bbb ccc easgasg") ===
      Seq("A", "B", "C", "EASGAS"))
  }
  test("daitch-mokotoff emits every branch code") {
    assert(emitted("dmsoundex", false, "aaa bbb ccc easgasg") ===
      Seq("000000", "700000", "400000", "450000", "454000",
        "540000", "545000", "500000", "045450"))
    assert(emitted("dmsoundex", true, "ccc").toSet ===
      Set("ccc", "400000", "450000", "454000", "540000", "545000", "500000"))
  }
  test("cologne phonetic encodes and round-trips") {
    // Kölner Phonetik: published examples (Müller-Lüdenscheidt -> 65752682)
    assert(emitted("cologne", false, "muellerluedenscheidt") === Seq("65752682"))
    val chain = AnalyzerChain(Seq(PhoneticFilter(inject = true, "cologne")))
    assert(AnalyzerChain.fromJson(AnalyzerChain.toJson(chain)) === chain)
  }
  test("match rating approach encodes names") {
    // published MRA examples: Byrne -> BYRN, Smith -> SMTH
    assert(emitted("matchrating", false, "byrne smith catherine") ===
      Seq("BYRN", "SMTH", "CTHRN"))
  }

  test("all phonetic encoders round-trip through chain json") {
    Seq("soundex", "metaphone", "dmetaphone", "rsoundex", "caverphone",
      "cologne", "nysiis", "dmsoundex", "matchrating").foreach { enc =>
      val chain = AnalyzerChain(Seq(PhoneticFilter(inject = false, enc)))
      assert(AnalyzerChain.fromJson(AnalyzerChain.toJson(chain)) === chain, enc)
    }
  }
}
