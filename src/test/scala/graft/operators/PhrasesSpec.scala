package graft.operators

import graft.SparkSpec

/** PhrasesIdentificationComponent: shingle-stat gathering, the bayesian
  * scoring formula (independently re-derived here), wrapper-phrase
  * probability at maxIndexed=3, greedy non-overlap selection, summary. */
class PhrasesSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with hand-countable stats: "data base" is a strong phrase
  // ('base' rarely appears without 'data' before it); "the data" is not
  private val corpus = Seq(
    "the data base holds rows",
    "a data base scan reads the data base",
    "data base admin the rows",
    "rows and the base line",
    "the quick data load",
    "more rows the table"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  private lazy val docs = corpus.toDF("doc_id", "text").cache()

  private def toksOf(s: String): Vector[String] =
    "[a-z0-9]+".r.findAllIn(s.toLowerCase).toVector

  // brute-force stats over the local corpus
  private def ttf(t: String): Long = corpus.map(c => toksOf(c._2).count(_ == t)).sum
  private def bttf(a: String, b: String): Long = corpus.map { c =>
    toksOf(c._2).sliding(2).count(w => w.length == 2 && w(0) == a && w(1) == b)
  }.sum
  private def tttf(a: String, b: String, cc: String): Long = corpus.map { c =>
    toksOf(c._2).sliding(3).count(w => w.length == 3 && w == Vector(a, b, cc))
  }.sum
  private def tdf(a: String, b: String, cc: String): Long = corpus.count { c =>
    toksOf(c._2).sliding(3).exists(w => w.length == 3 && w == Vector(a, b, cc))
  }
  private def conj(ts: Set[String]): Long =
    corpus.count(c => ts.subsetOf(toksOf(c._2).toSet))

  test("gatherStats matches brute-force counting") {
    val cands = Phrases.candidates(Vector("the", "data", "base"), 3)
    val (termTtf, shingleStats, conjM) = Phrases.gatherStats(docs, "text", cands, 2)
    assert(termTtf === Map("the" -> ttf("the"), "data" -> ttf("data"), "base" -> ttf("base")))
    assert(shingleStats("the data")._1 === bttf("the", "data"))
    assert(shingleStats("data base")._1 === bttf("data", "base"))
    // df of "data base" = docs containing the bigram
    assert(shingleStats("data base")._2 === corpus.count(c =>
      toksOf(c._2).sliding(2).exists(w => w.length == 2 && w(0) == "data" && w(1) == "base")).toLong)
    assert(conjM(Set("the", "data", "base")) === conj(Set("the", "data", "base")))
    assert(conjM(Set("data", "base")) === conj(Set("data", "base")))
  }

  test("bigram and trigram scores match the reference formula, re-derived") {
    val r = Phrases.identify(docs, "text", "the data base", maxIndexed = 2, maxQuery = 3)
    val byPhrase = r.all.map(s => s.phrase -> s.score).toMap
    // single words score 0 (they occur)
    assert(byPhrase("the") === 0.0 && byPhrase("data") === 0.0 && byPhrase("base") === 0.0)
    // bigram: score = (bttf/min_ttf)*1 - (bttf/max_ttf)*0, halved
    def bigramWant(a: String, b: String): Double = {
      val c2 = conj(Set(a, b))
      if (c2 <= 0) -1.0
      else ((bttf(a, b) / math.min(ttf(a), ttf(b)).toDouble) * 1.0 -
        (bttf(a, b) / math.max(ttf(a), ttf(b)).toDouble) * 0.0) * (1.0 / 2) * 1.0
    }
    assert(byPhrase("the data") === bigramWant("the", "data"))
    assert(byPhrase("data base") === bigramWant("data", "base"))
    assert(byPhrase("data base") > byPhrase("the data")) // the point of the model
    // trigram: both bigram words contribute with p = conj3/conj_w
    val c3 = conj(Set("the", "data", "base")).toDouble
    def w(a: String, b: String): Double = {
      val cw = conj(Set(a, b))
      (bttf(a, b) / math.min(ttf(a), ttf(b)).toDouble) * (c3 / cw) -
        (bttf(a, b) / math.max(ttf(a), ttf(b)).toDouble) * (1 - c3 / cw)
    }
    val wantTri = (w("the", "data") + w("data", "base")) * (1.0 / 2) *
      (c3 / math.max(c3, math.max(conj(Set("the", "data")), conj(Set("data", "base"))).toDouble))
    assert(math.abs(byPhrase("the data base") - wantTri) < 1e-12)
  }

  test("wrapper-phrase probability discounts sub-phrases at maxIndexed=3") {
    val r = Phrases.identify(docs, "text", "a data base", maxIndexed = 3, maxQuery = 3)
    val byPhrase = r.all.map(s => s.phrase -> s.score).toMap
    // input "data base" (len 2 < maxIndexed): words = itself; its indexed
    // super is the trigram "a data base" -> wrapper prob = tri_df/conj3
    val c2 = conj(Set("data", "base")).toDouble
    val c3 = conj(Set("a", "data", "base")).toDouble
    val wrap = if (c3 <= 0) 0.0 else tdf("a", "data", "base") / c3
    val p = c2 / c2 - wrap
    val want = ((bttf("data", "base") / math.min(ttf("data"), ttf("base")).toDouble) * p -
      (bttf("data", "base") / math.max(ttf("data"), ttf("base")).toDouble) * (1 - p)) *
      (1.0 / (1 + 3 - 3)) * 1.0
    assert(math.abs(byPhrase("data base") - want) < 1e-12)
    // and the trigram itself scores via its own ttf over min word ttf
    val wantTri0 = if (c3 <= 0) -1.0 else {
      val tt = Seq(ttf("a"), ttf("data"), ttf("base"))
      ((tttf("a", "data", "base") / tt.min.toDouble) * 1.0 -
        (tttf("a", "data", "base") / tt.max.toDouble) * 0.0) * 1.0 * 1.0
    }
    assert(math.abs(byPhrase("a data base") - wantTri0) < 1e-12)
  }

  test("selection is greedy non-overlapping; summary marks selected phrases") {
    val r = Phrases.identify(docs, "text", "the data base admin", maxIndexed = 2, maxQuery = 3)
    // "data base" is the best phrase; any selected phrase overlapping it
    // must be itself or a higher-scoring container
    assert(r.selected.nonEmpty)
    val positions = r.selected.flatMap(s => s.start until (s.start + s.len))
    assert(positions.distinct.size === positions.size) // disjoint
    assert(r.selected.sortBy(-_.score) === r.selected)  // kept in score order
    assert(r.summary.contains("{") && r.summary.contains("}"))
    // marked tokens re-join to the tokenized input
    assert(r.summary.replace("{", "").replace("}", "") === "the data base admin")
  }

  test("unknown terms: conjunction 0 gives -1; empty input echoes") {
    val r = Phrases.identify(docs, "text", "zzz data", maxIndexed = 2, maxQuery = 3)
    val byPhrase = r.all.map(s => s.phrase -> s.score).toMap
    assert(byPhrase("zzz") === -1.0)
    assert(byPhrase("zzz data") === -1.0)
    assert(byPhrase("data") === 0.0)
    assert(Phrases.identify(docs, "text", "???", 2, 3).summary === "???")
  }
}
