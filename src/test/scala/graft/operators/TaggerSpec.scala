package graft.operators

import graft.SparkSpec
import graft.operators.Tagger._

/** Solr Text Tagger semantics: trie matching + the three overlap policies
  * of TagClusterReducer, hand-computed. */
class TaggerSpec extends SparkSpec {
  import spark.implicits._

  val dict = Seq(
    ("CITY", "new york"),
    ("STATE", "new york state"),
    ("CITY", "york"),
    ("ORG", "bank of new york"),
    ("THING", "bank"))

  private def tags(text: String, overlaps: Overlaps): Seq[(Int, Int, String)] = {
    val df = Tagger.tagDocs(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", dict, overlaps)
    df.collect().map(r => (r.getInt(1), r.getInt(2), r.getString(5))).toSeq
  }

  test("ALL emits every dictionary match including nested ones") {
    val got = tags("the bank of new york state", All)
    // bank@1; bank of new york@1-4; new york@3-4; york@4; new york state@3-5
    assert(got.toSet === Set(
      (1, 1, "THING"), (1, 4, "ORG"), (3, 4, "CITY"), (4, 4, "CITY"), (3, 5, "STATE")))
  }

  test("NO_SUB drops contained tags only") {
    val got = tags("the bank of new york state", NoSub).toSet
    // york, new york are inside ORG/STATE; bank inside ORG; ORG and STATE
    // overlap but neither contains the other
    assert(got === Set((1, 4, "ORG"), (3, 5, "STATE")))
  }

  test("LONGEST_DOMINANT_RIGHT keeps the longest then non-overlapping remainder") {
    val got = tags("the bank of new york state", LongestDominantRight).toSet
    // ORG 'bank of new york' (16 chars) beats STATE 'new york state' (14);
    // everything else overlaps ORG except... STATE overlaps too -> only ORG
    assert(got === Set((1, 4, "ORG")))
    // with text lacking 'bank': STATE wins, CITY matches inside are dropped
    val got2 = tags("visit new york state today", LongestDominantRight).toSet
    assert(got2 === Set((1, 3, "STATE")))
  }

  test("char offsets index the original text") {
    val text = "Bank of New York"
    val df = Tagger.tagDocs(Seq((7L, text)).toDF("doc_id", "text"),
      "doc_id", "text", dict, LongestDominantRight)
    val r = df.head()
    assert(text.substring(r.getInt(3), r.getInt(4)) === "Bank of New York")
  }

  test("non-overlapping tags all survive LDR") {
    val got = tags("york here and bank there", LongestDominantRight).toSet
    assert(got === Set((0, 0, "CITY"), (3, 3, "THING")))
  }
}
