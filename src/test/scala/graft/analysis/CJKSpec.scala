package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** CJK width folding + bigram formation through the analyzer chain.
  * Golden vectors are the reference's own test expectations
  * (lucene/analysis/common/src/test/.../cjk/TestCJKWidthFilter.java,
  * TestCJKBigramFilter.java, TestCJKAnalyzer.java). */
class CJKSpec extends AnyFunSuite {

  private val width = AnalyzerChain(Seq(CJKWidthFilter))
  private val bigram = AnalyzerChain(Seq(CJKBigramFilter()))
  private val unibi = AnalyzerChain(Seq(CJKBigramFilter(outputUnigrams = true)))
  private val cjk = AnalyzerChain(Seq(CJKWidthFilter, CJKBigramFilter()))

  // --- CJKWidthFilter (TestCJKWidthFilter.java vectors) ---

  test("fullwidth ASCII folds to basic latin") {
    // lowercase runs before the filter chain, so Ｔｅｓｔ arrives ｔｅｓｔ
    assert(width.terms("Ｔｅｓｔ １２３４") === Seq("test", "1234"))
  }

  test("halfwidth katakana folds to standard katakana with voice marks composed") {
    assert(width.terms("ｶﾀｶﾅ") === Seq("カタカナ"))
    assert(width.terms("ｳﾞｨｯﾂ") === Seq("ヴィッツ"))
    assert(width.terms("ﾊﾟﾅｿﾆｯｸ") === Seq("パナソニック"))
  }

  test("width folding leaves plain tokens untouched") {
    assert(width.terms("plain ascii text") === Seq("plain", "ascii", "text"))
    assert(CJKWidthFilter.fold("") === "")
  }

  // --- CJKBigramFilter (TestCJKBigramFilter.java / TestCJKAnalyzer.java) ---

  test("mixed han/hiragana text becomes a sliding bigram run") {
    val toks = bigram.analyze("多くの学生が試験に落ちた。")
    assert(toks.map(_.term) === Seq("多く", "くの", "の学", "学生", "生が",
      "が試", "試験", "験に", "に落", "落ち", "ちた"))
    assert(toks.map(_.pos) === (0 to 10))
  }

  test("han-only digits example: spaced singles stay unigrams in korean-style runs") {
    // 一二三四五六七八九十 unspaced: pure bigrams (TestCJKAnalyzer testJa1)
    assert(bigram.terms("一二三四五六七八九十") ===
      Seq("一二", "二三", "三四", "四五", "五六", "六七", "七八", "八九", "九十"))
  }

  test("bigram runs break at non-CJK tokens (TestCJKAnalyzer testJa2-style)") {
    // あいうえおabcかきくけこ — latin interrupts the kana run
    assert(bigram.terms("あいうえおabcかきくけこ") ===
      Seq("あい", "いう", "うえ", "えお", "abc", "かき", "きく", "くけ", "けこ"))
  }

  test("lone CJK char emits a unigram (SINGLE fallback)") {
    assert(bigram.terms("divide 中 parts") === Seq("divide", "中", "parts"))
    assert(bigram.terms("あい") === Seq("あい"))
    assert(bigram.terms("あいtest") === Seq("あい", "test"))
    assert(bigram.terms("testあい") === Seq("test", "あい"))
  }

  test("hangul runs bigram inside a token but never across whitespace") {
    // Korean separates words with real spaces — 한국어/처리 stay independent
    assert(bigram.terms("한국어 처리") === Seq("한국", "국어", "처리"))
    // mixed hangul+latin tokens pass through whole (reference ALPHANUM rule)
    assert(bigram.terms("한국abc") === Seq("한국abc"))
  }

  test("katakana runs bigram; boundaries against other runs break") {
    assert(bigram.terms("カタカナ") === Seq("カタ", "タカ", "カナ"))
    // two spaced katakana runs do not join
    assert(bigram.terms("タワー ビル") === Seq("タワ", "ワー", "ビル"))
    // han adjacent to a katakana run joins (offset-contiguous in the text)
    assert(bigram.terms("東京タワー") === Seq("東京", "京タ", "タワ", "ワー"))
  }

  test("positions slide densely around bigram runs") {
    val toks = bigram.analyze("x 中国人 y")
    assert(toks.map(t => (t.term, t.pos)) ===
      Seq(("x", 0), ("中国", 1), ("国人", 2), ("y", 3)))
    val lone = bigram.analyze("x 中 y")
    assert(lone.map(t => (t.term, t.pos)) === Seq(("x", 0), ("中", 1), ("y", 2)))
  }

  test("outputUnigrams emits unigrams with bigram overlaps (TestCJKBigramFilter unibi)") {
    val (toks, over) = unibi.analyzeWithOverlaps("多くの学生が試験に落ちた。")
    val expectTerms = Seq(
      "多", "多く", "く", "くの", "の", "の学", "学", "学生", "生",
      "生が", "が", "が試", "試", "試験", "験", "験に", "に",
      "に落", "落", "落ち", "ち", "ちた", "た")
    assert(toks.map(_.term) === expectTerms)
    assert(toks.map(_.pos) === Seq(0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
      6, 7, 7, 8, 8, 9, 9, 10, 10, 11))
    // unigram posInc 1 / bigram posInc 0 — the bigrams are the overlaps
    assert(over === expectTerms.map(t => t.codePointCount(0, t.length) == 2))
  }

  test("width + bigram composition (the --cjk CLI preset chain)") {
    assert(cjk.terms("ﾄﾞｲﾂ") === Seq("ドイ", "イツ"))
    assert(cjk.terms("Ｔｅｓｔ 多くの") === Seq("test", "多く", "くの"))
  }

  test("doc length counts non-overlap tokens; bigrams are real postings in unibi mode") {
    val (tf, dl) = unibi.termFreqs("中国人")
    assert(dl === 3) // three unigram positions
    assert(tf === Map("中" -> 1, "国" -> 1, "人" -> 1, "中国" -> 1, "国人" -> 1))
    val (tf2, dl2) = bigram.termFreqs("中国人")
    assert(dl2 === 2)
    assert(tf2 === Map("中国" -> 1, "国人" -> 1))
  }

  test("chain JSON persists and restores the CJK filters") {
    val json = AnalyzerChain.toJson(cjk)
    val back = AnalyzerChain.fromJson(json)
    assert(back === cjk)
    val json2 = AnalyzerChain.toJson(unibi)
    assert(AnalyzerChain.fromJson(json2) === unibi)
  }
}
