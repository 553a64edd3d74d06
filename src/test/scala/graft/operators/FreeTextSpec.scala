package graft.operators

import graft.SparkSpec

/** FreeTextSuggester semantics (reference lucene/suggest
  * FreeTextSuggester.java): n-gram model counts, stupid-backoff scores,
  * higher-order dedup, and next-word prediction — all hand-computed on a
  * tiny corpus. */
class FreeTextSpec extends SparkSpec {
  import spark.implicits._

  // 13 tokens total
  lazy val docs = Seq(
    "the cat sat on the mat",
    "the cat ran",
    "a cat sat still").toDF("text")
  lazy val model = FreeText.model(docs, "text", maxOrder = 3).cache()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Int, Double)] =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSeq

  test("model counts are exact per order and never cross documents") {
    val m = model.collect().map(r =>
      ((r.getInt(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(m((1, "", "the")) == 3L)
    assert(m((1, "", "cat")) == 3L)
    assert(m((1, "", "sat")) == 2L)
    assert(m((2, "the", "cat")) == 2L)
    assert(m((2, "cat", "sat")) == 2L)
    assert(m((3, "the cat", "sat")) == 1L)
    assert(m((3, "the cat", "ran")) == 1L)
    // "ran the" would only exist if doc2+doc1 were concatenated
    assert(!m.contains((2, "ran", "the")))
    // total unigram mass = corpus token count
    assert(m.filter(_._1._1 == 1).values.sum == 13L)
  }

  test("stupid backoff: trigram hit scores 1.0 * cnt/denom; unseen words back off with alpha^k") {
    val got = rows(FreeText.suggest(model, Seq("the", "cat", "s"), 10))
    // order 3: "the cat sat" cnt 1 / bigram "the cat" cnt 2
    // order 1: "still" cnt 1 / 13 tokens, factor 0.4*0.4 (same fp product)
    val expected = Seq(
      ("sat", 3, 1.0 / 2.0),
      ("still", 1, (0.4 * 0.4) * (1.0 / 13.0)))
    assert(got === expected)
  }

  test("a word seen at a higher order is not re-reported from a lower one") {
    val got = rows(FreeText.suggest(model, Seq("the", "cat", "s"), 10))
    assert(got.count(_._1 == "sat") == 1)
    assert(got.find(_._1 == "sat").get._2 == 3)
  }

  test("empty last token predicts the next word") {
    val got = rows(FreeText.suggest(model, Seq("cat", ""), 2))
    assert(got.map(_._1) === Seq("sat", "ran"))
    assert(got.head._3 === 2.0 / 3.0)
    assert(got(1)._3 === 1.0 / 3.0)
  }

  test("more context than maxOrder uses only the last maxOrder-1 tokens") {
    val a = rows(FreeText.suggest(model, Seq("on", "zz", "the", "cat", "s"), 10))
    val b = rows(FreeText.suggest(model, Seq("the", "cat", "s"), 10))
    assert(a === b)
  }
}
