package graft.query

import graft.SparkSpec
import graft.query.SurroundParser._

/** Surround dialect (reference queryparser/surround): grammar goldens,
  * distance-subquery gating, and doc-set evaluation. */
class SurroundParserSpec extends SparkSpec {
  import spark.implicits._

  test("grammar: precedence OR < AND < NOT < N < W; infix chains collect into one distance op") {
    assert(parse("a w b w c") == SDist(1, ordered = true, Seq(STerm("a"), STerm("b"), STerm("c"))))
    assert(parse("a n b") == SDist(1, ordered = false, Seq(STerm("a"), STerm("b"))))
    // W binds tighter than N: a n b w c == n(a, w(b, c))
    assert(parse("a n b w c") ==
      SDist(1, ordered = false, Seq(STerm("a"), SDist(1, ordered = true, Seq(STerm("b"), STerm("c"))))))
    assert(parse("a AND b OR c") == SOr(Seq(SAnd(Seq(STerm("a"), STerm("b"))), STerm("c"))))
    assert(parse("a NOT b AND c") == SAnd(Seq(SNot(STerm("a"), STerm("b")), STerm("c"))))
    assert(parse("3w(a, b)") == SDist(3, ordered = true, Seq(STerm("a"), STerm("b"))))
    assert(parse("4n(a, b, c)") == SDist(4, ordered = false, Seq(STerm("a"), STerm("b"), STerm("c"))))
    assert(parse("or(a, and(b, c))") == SOr(Seq(STerm("a"), SAnd(Seq(STerm("b"), STerm("c"))))))
    // prefix call inside an infix chain nests, never flattens
    assert(parse("1w(a, b) w c") ==
      SDist(1, ordered = true, Seq(SDist(1, ordered = true, Seq(STerm("a"), STerm("b"))), STerm("c"))))
    assert(parse("(a OR b) AND c") == SAnd(Seq(SOr(Seq(STerm("a"), STerm("b"))), STerm("c"))))
  }

  test("infix distance operators carry an explicit distance: a 3w b, a 2n b") {
    // reference QueryParser.jj token W/N is (<_DISTOP_NUM>)?("W"|"w")
    assert(parse("a 3w b") == SDist(3, ordered = true, Seq(STerm("a"), STerm("b"))))
    assert(parse("a 2n b") == SDist(2, ordered = false, Seq(STerm("a"), STerm("b"))))
    // the LAST operator's distance governs the collected chain (the
    // reference overwrites the operator token each iteration)
    assert(parse("a 2w b 5w c") ==
      SDist(5, ordered = true, Seq(STerm("a"), STerm("b"), STerm("c"))))
    // mixed bare and numbered: `a w b 4w c` -> distance 4
    assert(parse("a w b 4w c") ==
      SDist(4, ordered = true, Seq(STerm("a"), STerm("b"), STerm("c"))))
    // W still binds tighter than N with explicit distances
    assert(parse("a 5n b 2w c") ==
      SDist(5, ordered = false, Seq(STerm("a"), SDist(2, ordered = true, Seq(STerm("b"), STerm("c"))))))
    intercept[SurroundParseException](parse("a 0w b"))
    // prefix form is not stolen by the infix path
    assert(parse("3w(a, b)") == SDist(3, ordered = true, Seq(STerm("a"), STerm("b"))))
  }

  test("boolean subqueries are rejected inside distance operators") {
    intercept[SurroundParseException](parse("2w(and(a, b), c)"))
    intercept[SurroundParseException](parse("trailing garbage )"))
    intercept[SurroundParseException](parse("0w(a, b)"))
  }

  test("matchingDocs over a tiny corpus") {
    val docs = Seq(
      (0L, "alpha beta gamma"),        // alpha..beta adjacent
      (1L, "alpha x beta"),            // distance 2
      (2L, "beta alpha"),              // wrong order
      (3L, "alpha delta"),
      (4L, "gamma delta")
    ).toDF("id", "text")
    def ids(q: String): Set[Long] =
      SurroundParser.matchingDocs(docs, "id", "text", q).collect().map(_.getLong(0)).toSet
    assert(ids("alpha w beta") == Set(0L))
    assert(ids("2w(alpha, beta)") == Set(0L, 1L))
    assert(ids("alpha n beta") == Set(0L, 2L))            // unordered adjacency
    assert(ids("alpha AND delta") == Set(3L))
    assert(ids("alpha OR gamma") == Set(0L, 1L, 2L, 3L, 4L))
    assert(ids("alpha NOT beta") == Set(3L))
    assert(ids("or(2w(alpha, beta), and(gamma, delta))") == Set(0L, 1L, 4L))
  }
}
