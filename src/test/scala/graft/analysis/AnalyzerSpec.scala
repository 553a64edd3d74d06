package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {
  test("basic segmentation + lowercase, empty stop set") {
    assert(Analyzer.terms("The Quick  brown_Fox jumps!") === Seq("the", "quick", "brown_fox", "jumps"))
    assert(Analyzer.terms("the a an") === Seq("the", "a", "an")) // no stopwords
  }
  test("numbers and mixed alnum") {
    assert(Analyzer.terms("x1 42 3.14 v2.0 a,b 1,000") === Seq("x1", "42", "3.14", "v2.0", "a", "b", "1,000"))
    // ':' is MidLetter only: joins letters, splits digits (UAX#29 /
    // StandardTokenizer behavior)
    assert(Analyzer.terms("12:30 ab:cd") === Seq("12", "30", "ab:cd"))
  }
  test("mid-letter joiners need word chars on both sides") {
    assert(Analyzer.terms("a.b a. .b can't 'quoted'") === Seq("a.b", "a", "b", "can't", "quoted"))
    assert(Analyzer.terms("example.com api:v2") === Seq("example.com", "api:v2"))
  }
  test("255-char chop: long runs emitted as <=255-char chunks, each with its own position") {
    val long = "x" * 600
    val toks = Analyzer.analyze(s"start $long end")
    assert(toks.map(_.term.length) === Seq(5, 255, 255, 90, 3))
    assert(toks.map(_.pos) === Seq(0, 1, 2, 3, 4))
  }
  test("positions increment per token") {
    val toks = Analyzer.analyze("a b c")
    assert(toks.map(_.pos) === Seq(0, 1, 2))
  }
  test("unicode letters kept and lowercased per code point") {
    assert(Analyzer.terms("Größe ÉTÉ") === Seq("größe", "été"))
  }
  test("CJK ideographs: one token per character; kana/hangul stay runs") {
    assert(Analyzer.terms("日本語") === Seq("日", "本", "語"))
    assert(Analyzer.terms("hello世界ok") === Seq("hello", "世", "界", "ok"))
    assert(Analyzer.terms("カタカナ") === Seq("カタカナ")) // katakana run
    assert(Analyzer.terms("한국어 텍스트") === Seq("한국어", "텍스트")) // hangul runs
    // hiragana is per-character (UAX#29 gives it no joining rule — the
    // reference StandardTokenizer emits <HIRAGANA> per char); katakana
    // runs break against Latin/digits (WB13 joins Katakana only with
    // Katakana); hangul is ALetter and merges with Latin
    assert(Analyzer.terms("これはtestです") === Seq("こ", "れ", "は", "test", "で", "す"))
    assert(Analyzer.terms("テストtest") === Seq("テスト", "test"))
    assert(Analyzer.terms("タワー2") === Seq("タワー", "2"))
    assert(Analyzer.terms("한국abc") === Seq("한국abc"))
    // positions advance per ideograph token
    assert(Analyzer.analyze("x 中国 y").map(t => (t.term, t.pos)) ===
      Seq(("x", 0), ("中", 1), ("国", 2), ("y", 3)))
    // all scanner variants agree, offsets slice the original
    val texts = Seq("日本語です", "mixed中文and英文 tokens", "中", "a中b")
    texts.foreach { t =>
      val base = Analyzer.analyze(t)
      val off = Analyzer.analyzeWithOffsets(t)
      assert(off.map(o => (o.term, o.pos)) === base.map(b => (b.term, b.pos)))
      off.foreach(o => assert(Analyzer.lowercase(t.substring(o.start, o.end)) === o.term))
      var streamed = List.empty[String]
      Analyzer.foreachTerm(t)(s => streamed ::= s)
      assert(streamed.reverse === base.map(_.term))
    }
  }
  test("termFreqs counts and doc length") {
    val (tfs, dl) = Analyzer.termFreqs("a b a c a b")
    assert(dl === 6)
    assert(tfs === Map("a" -> 3, "b" -> 2, "c" -> 1))
  }

  test("emoji clusters: one token per cluster, ZWJ sequences and flags atomic") {
    // simple pictographs split from words, one token each
    assert(Analyzer.terms("ship 🚀 it🔥") ===
      Seq("ship", "🚀", "it", "🔥"))
    // VS16 and skin-tone modifiers stay inside the cluster
    assert(Analyzer.terms("ok ❤️ done") === Seq("ok", "❤️", "done"))
    assert(Analyzer.terms("👍🏽 yes") ===
      Seq("👍🏽", "yes"))
    // ZWJ family sequence = ONE token
    val family = "👨‍👩‍👧"
    assert(Analyzer.terms(s"a $family b") === Seq("a", family, "b"))
    // regional indicators pair into flags; adjacent flags split per pair
    val us = "🇺🇸"; val fr = "🇫🇷"
    assert(Analyzer.terms(s"go $us$fr now") === Seq("go", us, fr, "now"))
    // positions advance per cluster
    assert(Analyzer.analyze(s"x $us y").map(t => (t.term, t.pos)) ===
      Seq(("x", 0), (us, 1), ("y", 2)))
    // all scanner variants agree; offsets slice the original text
    val texts = Seq(s"mix $family and$us", "😀😀",
      s"tail $us", "❤️", s"${family}lead")
    texts.foreach { t =>
      val base = Analyzer.analyze(t)
      val off = Analyzer.analyzeWithOffsets(t)
      assert(off.map(o => (o.term, o.pos)) === base.map(b => (b.term, b.pos)), s"[$t]")
      off.foreach(o => assert(Analyzer.lowercase(t.substring(o.start, o.end)) === o.term))
      var streamed = List.empty[String]
      Analyzer.foreachTerm(t)(s => streamed ::= s)
      assert(streamed.reverse === base.map(_.term), s"[$t]")
    }
  }
}

class FastPathSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.analysis.Analyzer

  test("foreachTerm is exactly analyze().map(_.term) on random mixed text") {
    val rnd = new scala.util.Random(42)
    val pool = "abcXYZ019 \n\t(){};.:'_,\u00c4\u00df\u4e2d\u00e9\u03a3"
    val emoji = Seq("\ud83d\ude80", "\u2764\ufe0f", "\ud83d\udc4d\ud83c\udffd", "\ud83d\udc68\u200d\ud83d\udc69\u200d\ud83d\udc67", "\ud83c\uddfa\ud83c\uddf8")
    for (trial <- 0 until 500) {
      val len = rnd.nextInt(120)
      val sb = new StringBuilder
      for (_ <- 0 until len) {
        if (rnd.nextInt(12) == 0) sb ++= emoji(rnd.nextInt(emoji.length))
        else sb += pool(rnd.nextInt(pool.length))
      }
      if (trial % 50 == 0) sb ++= " " + ("x" * (250 + rnd.nextInt(350))) + "." + sb.toString
      val s = sb.toString
      val slow = Analyzer.analyze(s).map(_.term)
      val fast = scala.collection.mutable.ArrayBuffer[String]()
      Analyzer.foreachTerm(s)(fast += _)
      assert(slow == fast.toSeq, s"mismatch on: [$s]")
    }
  }

  test("termFreqs matches analyze-derived counts") {
    val s = "Foo.bar foo_bar 1,234 a.b.c 'quoted' x. . ABC abc"
    val (tfs, dl) = Analyzer.termFreqs(s)
    val toks = Analyzer.analyze(s).map(_.term)
    assert(dl === toks.length)
    assert(tfs.toMap === toks.groupBy(identity).view.mapValues(_.size).toMap)
  }
}
