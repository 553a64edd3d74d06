package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Elision, common-grams, compound decomposition, char filters, and the
  * small miscellaneous token filters (keep/truncate/reverse/pattern). */
class MiscFiltersSpec extends AnyFunSuite {

  test("elision strips french articles before apostrophes") {
    val chain = AnalyzerChain(Seq(ElisionFilter()))
    assert(chain.terms("l'avion d'histoire jusqu'au xy'z") ===
      Seq("avion", "histoire", "au", "xy'z"))
    // right single quote form too
    assert(chain.terms("l’avion") === Seq("avion"))
    // positions unchanged
    assert(chain.analyze("l'avion vole").map(_.pos) === Seq(0, 1))
  }

  test("common grams: bigram at first word's position as an overlap") {
    val chain = AnalyzerChain(Seq(CommonGramsFilter(Set("the", "of"))))
    val (toks, overlaps) = chain.analyzeWithOverlaps("the quick fox of doom")
    val terms = toks.map(_.term)
    assert(terms === Seq("the", "the_quick", "quick", "fox", "fox_of", "of",
      "of_doom", "doom"))
    assert(toks.zip(overlaps).collect { case (t, true) => t.term } ===
      Seq("the_quick", "fox_of", "of_doom"))
    // gram shares the first token's position (reference positions {1,0,1})
    val pos = toks.groupBy(_.term).view.mapValues(_.head.pos).toMap
    assert(pos("the_quick") === pos("the"))
    assert(pos("of_doom") === pos("of"))
    // doc length counts only the backbone
    assert(chain.termFreqs("the quick fox of doom")._2 === 5)
  }

  test("dictionary compound decomposition emits subwords as overlaps") {
    val dict = Set("donau", "dampf", "schiff", "fahrt")
    val chain = AnalyzerChain(Seq(DictionaryCompoundFilter(dict)))
    val (toks, overlaps) = chain.analyzeWithOverlaps("donaudampfschifffahrt ok")
    assert(toks.map(_.term) ===
      Seq("donaudampfschifffahrt", "donau", "dampf", "schiff", "fahrt", "ok"))
    assert(overlaps === Seq(false, true, true, true, true, false))
    assert(toks(1).pos === toks(0).pos)
    // a dictionary word of exactly minWordSize re-emits itself as a
    // subword overlap — the reference decompose() does the same
    // (CompoundWordTokenFilterBase: i=0, j=len is in [minSub, maxSub])
    assert(chain.terms("dampf") === Seq("dampf", "dampf"))
    // below minWordSize bypasses decomposition entirely
    assert(AnalyzerChain(Seq(DictionaryCompoundFilter(dict, minWordSize = 6)))
      .terms("dampf") === Seq("dampf"))
  }

  test("keep/truncate/reverse/pattern-replace filters") {
    assert(AnalyzerChain(Seq(KeepWordFilter(Set("alpha", "beta"))))
      .terms("alpha gamma beta") === Seq("alpha", "beta"))
    assert(AnalyzerChain(Seq(TruncateFilter(4)))
      .terms("abcdef ab") === Seq("abcd", "ab"))
    assert(AnalyzerChain(Seq(ReverseStringFilter))
      .terms("abc xyz") === Seq("cba", "zyx"))
    assert(AnalyzerChain(Seq(PatternReplaceFilter("[0-9]+", "#")))
      .terms("a1b22c x9") === Seq("a#b#c", "x#"))
    // tokens emptied by the pattern are removed, hole remains
    val (t, _) = AnalyzerChain(Seq(PatternReplaceFilter("^x[0-9]+$", "")))
      .analyzeWithOverlaps("a x42 b")
    assert(t.map(_.term) === Seq("a", "b") && t.map(_.pos) === Seq(0, 2))
  }

  test("html strip removes markup, decodes entities, breaks at block tags") {
    val html = "<div class=\"foo\">this is some text</div> here is a " +
      "<a href=\"#bar\">link</a> and another " +
      "<a href=\"http://lucene.apache.org/\">link</a>. " +
      "This is an entity: &amp; plus a &lt;.  Here is an &. <!-- is a comment -->"
    val gold = "\nthis is some text\n here is a link and another link. " +
      "This is an entity: & plus a <.  Here is an &. "
    assert(HtmlStripCharFilter(html) === gold)
    // script/style bodies vanish; CDATA keeps inner text; numeric entities
    assert(HtmlStripCharFilter("a<script>var x=1;</script>b") === "ab")
    assert(HtmlStripCharFilter("<style>p{}</style>ok") === "ok")
    assert(HtmlStripCharFilter("<![CDATA[kept]]> x") === "kept x")
    assert(HtmlStripCharFilter("&#65;&#x42;") === "AB")
    assert(HtmlStripCharFilter("3 < 4 and a&b") === "3 < 4 and a&b")
    // through the chain: tags don't join words
    val chain = AnalyzerChain(Nil, None, Seq(HtmlStripCharFilter))
    assert(chain.terms("foo<p>bar</p><b>baz</b>qux") ===
      Seq("foo", "bar", "bazqux"))
  }

  test("mapping char filter applies longest match") {
    val f = MappingCharFilter(Map("ph" -> "f", "qu" -> "kw", "q" -> "k"))
    assert(f("phquqx") === "fkwkx")
    val chain = AnalyzerChain(Nil, None, Seq(f))
    assert(chain.terms("phase quit") === Seq("fase", "kwit"))
  }

  test("unicode folding: NFKC + mark strip + case fold across scripts") {
    val chain = AnalyzerChain(Seq(UnicodeFoldingFilter))
    assert(chain.terms("café ﬁre ＡＢＣ Straße") ===
      Seq("cafe", "fire", "abc", "strasse"))
    // greek tonos and cyrillic pass folded
    assert(UnicodeFoldingFilter.fold("άλφα") === "αλφα")
  }

  // The ICUFoldingFilter approximation boundary, EXECUTABLE (the COVERAGE
  // note in prose form): what JDK NFKC + mark-strip + case-fold does on the
  // Unicode edge corpus, pinned so any drift (JDK Unicode-data update, chain
  // reorder) surfaces here instead of silently changing index terms.
  test("unicode folding boundary: hangul, arabic presentation forms, ligature case") {
    import UnicodeFoldingFilter.fold
    // Hangul COMPATIBILITY jamo normalize to conjoining jamo (NFKC), and a
    // precomposed syllable round-trips unchanged (NFD -> strip none -> NFC).
    // ICU's tailored folding instead conflates some jamo — documented gap.
    assert(fold("ㄱㅏ") === "\uAC00")
    assert(fold("한") === "한")
    // Arabic presentation-form ligature: NFKC decomposes lam-alef-with-
    // hamza, then the NON_SPACING_MARK strip REMOVES the hamza (U+0654) —
    // stronger than ICU, which keeps hamza as part of the base letters.
    assert(fold("ﻷ") === "لا")
    // plain lam-alef presentation form folds without loss
    assert(fold("ﻻ") === "لا")
    // capital sharp-S folds all the way to ss (case-fold happens BEFORE the
    // ligature-letter map; folding after would strand ẞ as ß)
    assert(fold("ẞ") === "ss")
    assert(fold("GROẞE") === "grosse")
    // Turkish dotted capital İ: lowercase introduces combining dot above,
    // which the mark strip then removes — matches ICU's diacritic folding
    assert(fold("İ") === "i")
  }

  test("unicode folding properties: idempotent, mark-free, lowercase") {
    import UnicodeFoldingFilter.fold
    val edge = Seq("ＫＡＮＪＩ", "ﬁﬂﬃ", "Ǆǅǆ", "ΑΈΪ", "Ѐё", "ÅÄÖ", "ﻷﻹﻵ",
      "ㄱㄴㄷㅏㅑ", "각낙닥", "ẞßÆæŒœ", "Ⅻⅻ", "½¾", "ｱｲｳｴｵ", "é́", "ẍy")
    val rng = new scala.util.Random(42)
    val samples = edge ++ (0 until 200).map { _ =>
      val pool = edge.flatMap(_.toSeq)
      (0 until 1 + rng.nextInt(8)).map(_ => pool(rng.nextInt(pool.size))).mkString
    }
    for (s <- samples) {
      val f = fold(s)
      assert(fold(f) === f, s"not idempotent on <$s>")
      assert(!f.exists(c => Character.getType(c) == Character.NON_SPACING_MARK),
        s"marks survive in <$s> -> <$f>")
      assert(f === f.toLowerCase, s"uppercase survives in <$s> -> <$f>")
    }
  }

  test("repeat-stem emits stem plus original at one position") {
    val chain = AnalyzerChain(Seq(RepeatStemFilter("porter")))
    val (toks, overlaps) = chain.analyzeWithOverlaps("running dogs fast")
    assert(toks.map(_.term) === Seq("run", "running", "dog", "dogs", "fast"))
    assert(overlaps === Seq(false, true, false, true, false))
    assert(toks(0).pos === toks(1).pos)
    // unchanged stems do not duplicate (RemoveDuplicates behavior)
    assert(chain.terms("fast") === Seq("fast"))
    val sn = AnalyzerChain(Seq(RepeatStemFilter("snowball", "german")))
    assert(sn.terms("häuser") === Seq("haus", "häuser"))
  }

  test("limit-count and codepoint-count filters") {
    assert(AnalyzerChain(Seq(LimitTokenCountFilter(2)))
      .terms("a b c d") === Seq("a", "b"))
    // astral-plane char counts one codepoint (length 2 in UTF-16)
    val cp = AnalyzerChain(Seq(CodepointCountFilter(1, 2)))
    assert(cp.terms("ab abc 𝐀𝐁") ===
      Seq("ab", "𝐀𝐁"))
  }

  test("hyphen-join char filter repairs line-broken words only") {
    assert(HyphenJoinCharFilter("hyphen-\nated word") === "hyphenated word")
    assert(HyphenJoinCharFilter("state-of-the-art stays") === "state-of-the-art stays")
    assert(HyphenJoinCharFilter("trail- \n  ing") === "trailing")
    val chain = AnalyzerChain(Nil, None, Seq(HyphenJoinCharFilter))
    assert(chain.terms("hy-\nphen") === Seq("hyphen"))
  }

  test("new filters and char filters round-trip through chain json") {
    val chains = Seq(
      AnalyzerChain(Seq(ElisionFilter())),
      AnalyzerChain(Seq(ElisionFilter(ElisionFilter.italian))),
      AnalyzerChain(Seq(CommonGramsFilter(Set("the", "of")))),
      AnalyzerChain(Seq(DictionaryCompoundFilter(Set("donau", "dampf"),
        onlyLongestMatch = true))),
      AnalyzerChain(Seq(KeepWordFilter(Set("a", "b")))),
      AnalyzerChain(Seq(TruncateFilter(3), ReverseStringFilter)),
      AnalyzerChain(Seq(PatternReplaceFilter("""\d+""", "#", all = false))),
      AnalyzerChain(Nil, None, Seq(HtmlStripCharFilter,
        MappingCharFilter(Map("ph" -> "f", "\"x\"" -> "\\y")))),
      AnalyzerChain(Seq(StopFilter(Set("the")), ElisionFilter()), None,
        Seq(HtmlStripCharFilter)),
      AnalyzerChain(Seq(UnicodeFoldingFilter, LimitTokenCountFilter(9),
        CodepointCountFilter(1, 64), RepeatStemFilter("snowball", "french")),
        None, Seq(HyphenJoinCharFilter)))
    chains.foreach { c =>
      assert(AnalyzerChain.fromJson(AnalyzerChain.toJson(c)) === c,
        AnalyzerChain.toJson(c))
    }
  }
}
