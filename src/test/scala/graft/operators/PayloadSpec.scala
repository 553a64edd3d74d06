package graft.operators

import graft.SparkSpec

/** DelimitedPayloadTokenFilter + PayloadScoreQuery function family:
  * reference-style goldens for the parse and the four fold functions. */
class PayloadSpec extends SparkSpec {
  import spark.implicits._

  private def table(text: String) =
    TextOps.payloadTable(Seq((1L, text)).toDF("id", "text"), "id", "text")
      .collect().map(r => (r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getFloat(3)))).toSeq.sortBy(_._1)

  test("delimited parse: float suffix, null when absent, LAST delimiter splits") {
    val got = table("the|0.5 quick|2.0 fox jumped|3")
    assert(got == Seq(
      (0, "the", Some(0.5f)), (1, "quick", Some(2.0f)),
      (2, "fox", None), (3, "jumped", Some(3.0f))))
    // multi-delimiter token: the reference scans for the LAST delimiter
    assert(table("a|b|2.5") == Seq((0, "a|b", Some(2.5f))))
    // scientific notation decodes like Float.parseFloat
    assert(table("x|1.5e2") == Seq((0, "x", Some(150f))))
  }

  test("payload functions: min/max/avg/sum folds, null payloads don't count") {
    val docs = Seq(
      (1L, "x|1 x|3 x|5 y|2"),
      (2L, "x x|4"),     // one null-payload occurrence of x
      (3L, "y|9")        // no x at all
    ).toDF("id", "text")
    val pt = TextOps.payloadTable(docs, "id", "text")
    def score(f: String): Map[Long, (Double, Long)] =
      TextOps.payloadScore(pt, "id", "x", f).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(score("min") == Map(1L -> (1.0, 3L), 2L -> (4.0, 1L)))
    assert(score("max") == Map(1L -> (5.0, 3L), 2L -> (4.0, 1L)))
    assert(score("avg") == Map(1L -> (3.0, 3L), 2L -> (4.0, 1L)))
    assert(score("sum") == Map(1L -> (9.0, 3L), 2L -> (4.0, 1L)))
    intercept[IllegalArgumentException](TextOps.payloadScore(pt, "id", "x", "median"))
  }

  test("payload_check: per-slot equality with None wildcard (SpanPayloadCheckQuery)") {
    val docs = Seq(
      (1L, "a|1 b|2 c|3"),   // phrase a b with payloads (1,2)
      (2L, "a|1 b|9"),       // b payload mismatches
      (3L, "a|5 b|2 a|1 b|2"), // two a-b starts; one passes the strict check
      (4L, "b|2 a|1")        // wrong order
    ).toDF("id", "text")
    val pt = TextOps.payloadTable(docs, "id", "text")
    def check(cs: Seq[Option[Float]]): Map[Long, Long] =
      TextOps.payloadCheck(pt, "id", Seq("a", "b"), cs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(check(Seq(Some(1f), Some(2f))) == Map(1L -> 1L, 3L -> 1L))
    assert(check(Seq(None, Some(2f))) == Map(1L -> 1L, 3L -> 2L))
    assert(check(Seq(None, None)) == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    intercept[IllegalArgumentException](
      TextOps.payloadCheck(pt, "id", Seq("a", "b"), Seq(None)))
  }
}
