package graft.operators

import graft.SparkSpec
import graft.operators.Spans._
import org.apache.spark.sql.functions._

class SpansSpec extends SparkSpec {
  import spark.implicits._

  private def posMap(text: String): Map[String, Array[Int]] =
    text.split("\\s+").zipWithIndex.groupBy(_._1)
      .map { case (t, ps) => t -> ps.map(_._2).sorted }

  /** Exhaustive reference evaluator: enumerate every combination. */
  private def bruteNear(lists: Seq[Array[(Int, Int)]], slop: Int,
                        inOrder: Boolean): Set[(Int, Int)] = {
    def combos(ls: Seq[Array[(Int, Int)]]): Seq[Seq[(Int, Int)]] =
      ls.foldLeft(Seq(Seq.empty[(Int, Int)])) { (acc, l) =>
        for (c <- acc; s <- l) yield c :+ s
      }
    combos(lists).flatMap { c =>
      val ordered = !inOrder || c.sliding(2).forall {
        case Seq(a, b) => b._1 >= a._2
        case _         => true
      }
      val minS = c.map(_._1).min; val maxE = c.map(_._2).max
      val cost = maxE - minS - c.map(s => s._2 - s._1).sum
      if (ordered && cost <= slop) Some((minS, maxE)) else None
    }.toSet
  }

  test("term, or, first, not span algebra on a known doc") {
    val pm = posMap("a b c a d b a")
    assert(eval(SpanTerm("a"), pm).toSeq === Seq((0, 1), (3, 4), (6, 7)))
    assert(eval(SpanOr(Seq(SpanTerm("a"), SpanTerm("b"))), pm).toSeq ===
      Seq((0, 1), (1, 2), (3, 4), (5, 6), (6, 7)))
    assert(eval(SpanFirst(SpanTerm("a"), 4), pm).toSeq === Seq((0, 1), (3, 4)))
    // near(a,b) ordered slop 1: (0,2) a@0 b@1; (3,6) a@3 b@5 (gap 1)
    val near = SpanNear(Seq(SpanTerm("a"), SpanTerm("b")), 1, inOrder = true)
    assert(eval(near, pm).toSeq === Seq((0, 2), (3, 6)))
    // not: drop near-spans overlapping d@4 -> (3,6) overlaps d, (0,2) kept
    assert(eval(SpanNot(near, SpanTerm("d")), pm).toSeq === Seq((0, 2)))
  }

  test("containing/within: enclosure algebra (result spans from big / little)") {
    val pm = posMap("a b c a d b a")
    val near = SpanNear(Seq(SpanTerm("a"), SpanTerm("b")), 1, inOrder = true) // (0,2),(3,6)
    // containing: near-spans that enclose a d -> only (3,6) contains d@4
    assert(eval(SpanContaining(near, SpanTerm("d")), pm).toSeq === Seq((3, 6)))
    // within: d-spans enclosed by a near-span -> d@4 inside (3,6)
    assert(eval(SpanWithin(near, SpanTerm("d")), pm).toSeq === Seq((4, 5)))
    // b@1 is inside (0,2); b@5 inside (3,6): both within
    assert(eval(SpanWithin(near, SpanTerm("b")), pm).toSeq === Seq((1, 2), (5, 6)))
    // nothing encloses c@2 (near spans (0,2) excludes end)
    assert(eval(SpanContaining(near, SpanTerm("c")), pm).isEmpty)
  }

  test("ordered near requires order; unordered accepts both directions") {
    val pm = posMap("x y z y x")
    val o = SpanNear(Seq(SpanTerm("y"), SpanTerm("z")), 0, inOrder = true)
    assert(eval(o, pm).toSeq === Seq((1, 3))) // y@1 z@2; z then y@3 rejected
    val u = SpanNear(Seq(SpanTerm("y"), SpanTerm("z")), 0, inOrder = false)
    assert(eval(u, pm).toSeq === Seq((1, 3), (2, 4)))
  }

  test("near kernel matches exhaustive enumeration on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 200) {
      val text = Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val pm = posMap(text)
      val k = 2 + rnd.nextInt(2)
      val clauses: Seq[SpanQuery] = Seq.fill(k)(
        if (rnd.nextBoolean()) SpanTerm(vocab(rnd.nextInt(vocab.size)))
        else SpanOr(Seq(SpanTerm(vocab(rnd.nextInt(vocab.size))),
          SpanTerm(vocab(rnd.nextInt(vocab.size))))))
      val slop = rnd.nextInt(4)
      val inOrder = rnd.nextBoolean()
      val lists = clauses.map(c => eval(c, pm)).toArray
      if (lists.forall(_.nonEmpty)) {
        val got = eval(SpanNear(clauses, slop, inOrder), pm).toSet
        val want = bruteNear(lists.toSeq, slop, inOrder)
        assert(got === want, s"trial $trial text='$text' clauses=$clauses slop=$slop ordered=$inOrder")
      }
    }
  }

  test("nested near-of-near composes") {
    val pm = posMap("p q r s")
    val inner = SpanNear(Seq(SpanTerm("p"), SpanTerm("q")), 0, inOrder = true) // (0,2)
    val outer = SpanNear(Seq(inner, SpanTerm("s")), 1, inOrder = true)
    assert(eval(outer, pm).toSeq === Seq((0, 4))) // gap r = 1 <= slop
    val tight = SpanNear(Seq(inner, SpanTerm("s")), 0, inOrder = true)
    assert(eval(tight, pm).isEmpty)
  }

  test("distributed spans/matchingDocs agree with the local kernel") {
    val docs = Seq(
      (1L, "spark merge sort merge data"),
      (2L, "sort x y merge"),
      (3L, "merge sort"),
      (4L, "no match here")).toDF("doc_id", "text")
    val q = SpanNear(Seq(SpanTerm("sort"), SpanTerm("merge")), 2, inOrder = true)
    val got = spans(docs, "doc_id", "text", q)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val want = docs.collect().flatMap { r =>
      eval(q, posMap(r.getString(1))).map { case (s, e) => (r.getLong(0), s, e) }
    }.toSet
    assert(got === want && want.nonEmpty)
    val md = matchingDocs(docs, "doc_id", "text", q)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(md === want.groupBy(_._1).map { case (d, ss) => d -> ss.size.toLong })
    assert(!md.contains(3L) && !md.contains(4L)) // merge before sort: not ordered
  }

  test("pathological doc stays bounded (combo budget)") {
    val text = Seq.fill(3000)("a b").mkString(" ") // 3000 a's, 3000 b's
    val pm = posMap(text)
    val t0 = System.nanoTime()
    val r = eval(SpanNear(Seq(SpanTerm("a"), SpanTerm("b"), SpanTerm("a")), 2,
      inOrder = false), pm)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.nonEmpty)
    assert(secs < 10.0, s"kernel took ${secs}s — budget not effective")
  }
}
