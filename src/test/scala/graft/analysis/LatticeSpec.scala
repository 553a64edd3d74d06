package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Viterbi lattice segmentation (the kuromoji-capability first increment):
  * compound-vs-split resolution by path cost, particle attachment, unknown
  * katakana grouping, chain integration and persisted-chain round-trip. */
class LatticeSpec extends AnyFunSuite {
  private val d = Lattice.demoJa
  private def seg(s: String): Seq[String] = Lattice.segment(s, d)

  test("compound entry beats its split when the lattice says so") {
    // 東京都 (2500) vs 東京+都 (3000+4000 + noun-noun transition)
    assert(seg("東京都") === Seq("東京都"))
    assert(seg("東京都に行きます") === Seq("東京都", "に", "行き", "ます"))
    // without the compound in range, the split still wins over unknowns
    assert(seg("京都に行きます") === Seq("京都", "に", "行き", "ます"))
  }

  test("particle attachment segments SOV sentences") {
    assert(seg("私は水を飲む") === Seq("私", "は", "水", "を", "飲む"))
    assert(seg("犬が魚を食べる") === Seq("犬", "が", "魚", "を", "食べる"))
    assert(seg("日本語の本を読む") === Seq("日本語", "の", "本", "を", "読む"))
  }

  test("unknown katakana runs group into one token") {
    assert(seg("ソフトウェアを検索する") === Seq("ソフトウェア", "を", "検索", "する"))
    // unknown han chars fall back to single-char nodes
    assert(seg("鰻を食べる") === Seq("鰻", "を", "食べる"))
  }

  test("segmentation is deterministic and total") {
    assert(seg("") === Nil)
    assert(seg("猫") === Seq("猫"))
    val s = "会社員は電車で会社に行きます"
    assert(seg(s) === seg(s))
    assert(seg(s) === Seq("会社員", "は", "電車", "で", "会社", "に", "行き", "ます"))
    // every segmentation reassembles to the input (no loss, no overlap)
    for (t <- Seq("東京都に行きます", "ソフトウェアを検索する", "鰻を食べる"))
      assert(seg(t).mkString === t)
  }

  test("chain filter re-joins CJK runs, segments, keeps positions dense") {
    val chain = AnalyzerChain(Seq(MorphSegmentFilter()))
    assert(chain.terms("東京都に行きます") === Seq("東京都", "に", "行き", "ます"))
    val toks = chain.analyze("東京都に行きます")
    assert(toks.map(_.pos) === Seq(0, 1, 2, 3))
    // mixed script: latin token passes through, CJK run segments
    assert(chain.terms("spark処理を分散する") ===
      Seq("spark", "処理", "を", "分散", "する"))
    // katakana run token from the tokenizer joins adjacent singles
    assert(chain.terms("データを処理する") === Seq("データ", "を", "処理", "する"))
  }

  test("ja analyzer preset: width fold + segmentation + stop list") {
    val ja = Analyzers.forLanguage("ja")
    assert(ja.terms("私は水を飲む") === Seq("私", "水", "飲む"))
    // fullwidth latin folds before segmentation
    assert(ja.terms("ＪＡＶＡで検索する") === Seq("java", "検索"))
  }

  test("morph filter survives the persisted-chain JSON round-trip") {
    val chain = AnalyzerChain(Seq(CJKWidthFilter, MorphSegmentFilter()))
    val back = AnalyzerChain.fromJson(AnalyzerChain.toJson(chain))
    assert(back.terms("東京都に行きます") === Seq("東京都", "に", "行き", "ます"))
    assert(back.filters.exists(_.isInstanceOf[MorphSegmentFilter]))
  }
}
