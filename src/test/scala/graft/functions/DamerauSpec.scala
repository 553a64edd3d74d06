package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DamerauSpec extends SparkSpec {
  import spark.implicits._

  test("osa: golden distances (transposition = one edit; OSA restriction)") {
    assert(DamerauLevenshtein.osa("sprak", "spark") === 1) // adjacent swap
    assert(DamerauLevenshtein.osa("spark", "spark") === 0)
    assert(DamerauLevenshtein.osa("spark", "sprk") === 1)  // delete
    assert(DamerauLevenshtein.osa("spark", "spork") === 1) // substitute
    assert(DamerauLevenshtein.osa("abcd", "badc") === 2)   // two swaps
    assert(DamerauLevenshtein.osa("", "abc") === 3)
    assert(DamerauLevenshtein.osa("abc", "") === 3)
    // OSA (not full DL): a substring may transpose only once -> "ca"->"abc"
    // is 3 under OSA (full Damerau-Levenshtein would give 2)
    assert(DamerauLevenshtein.osa("ca", "abc") === 3)
  }

  test("osa column: codegen path equals the scalar on fuzzed pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 300).map { _ =>
      def w = (1 to 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      (w, w)
    } :+ (("sprak", "spark")) :+ (("ca", "abc"))
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", DamerauLevenshtein($"a", $"b").as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    got.foreach { case (a, b, d) =>
      assert(d === DamerauLevenshtein.osa(a, b), s"($a, $b)")
    }
  }

  test("osa never exceeds levenshtein and differs exactly on transposed pairs") {
    val words = Seq("spark", "sprak", "spak", "park", "crash", "chras")
    for (a <- words; b <- words) {
      val osa = DamerauLevenshtein.osa(a, b)
      val lev = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(a, b)
      assert(osa <= lev, s"($a,$b)")
    }
    assert(DamerauLevenshtein.osa("chras", "crash") === 2)
  }
}
