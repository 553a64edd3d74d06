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
}
