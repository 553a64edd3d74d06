package graft.operators

import graft.SparkSpec
import graft.operators.Intervals._

/** Minimal-interval algebra semantics vs hand-computed cases and a
  * brute-force two-sided-minimal reference for the two-source case. */
class IntervalsSpec extends SparkSpec {

  private def pos(m: (String, Seq[Int])*): Map[String, Array[Int]] =
    m.map { case (t, ps) => t -> ps.toArray }.toMap

  private def spans(src: Source, p: Map[String, Array[Int]]): Seq[(Int, Int)] =
    evaluate(src, p).map(iv => (iv.start, iv.end))

  /** Brute force for ordered(a, b): pairs (pa, pb), pa < pb, that are
    * two-sided minimal — pb is the first b after pa AND pa the last a
    * before pb. */
  private def bruteOrdered(as: Seq[Int], bs: Seq[Int]): Seq[(Int, Int)] =
    (for {
      pa <- as
      pb <- bs.filter(_ > pa).take(1)
      if !as.exists(a2 => a2 > pa && a2 < pb)
    } yield (pa, pb)).sorted

  /** Brute force for unordered(a, b): minimal windows covering one a and
    * one b (no window nested in another). */
  private def bruteUnordered(as: Seq[Int], bs: Seq[Int]): Seq[(Int, Int)] = {
    val all = for { pa <- as; pb <- bs; if pa != pb }
      yield (math.min(pa, pb), math.max(pa, pb))
    all.distinct.filter(w => !all.exists(o =>
      o != w && o._1 >= w._1 && o._2 <= w._2)).sorted
  }

  test("ordered: two-sided minimal pairs, hand case + random brute force") {
    val p = pos("a" -> Seq(1, 4, 10), "b" -> Seq(2, 6, 12))
    assert(spans(Ordered(Seq(Term("a"), Term("b"))), p) === Seq((1, 2), (4, 6), (10, 12)))
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val as = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(30)).distinct.sorted
      val bs = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(30)).distinct.sorted
        .filterNot(as.contains(_))
      if (bs.nonEmpty) {
        val got = spans(Ordered(Seq(Term("a"), Term("b"))), pos("a" -> as, "b" -> bs)).sorted
        assert(got === bruteOrdered(as, bs), s"as=$as bs=$bs")
      }
    }
  }

  test("unordered: minimal covering windows, hand case + random brute force") {
    val p = pos("a" -> Seq(1, 10), "b" -> Seq(4, 7))
    assert(spans(Unordered(Seq(Term("a"), Term("b"))), p).sorted === Seq((1, 4), (7, 10)))
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val as = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(30)).distinct.sorted
      val bs = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(30)).distinct.sorted
        .filterNot(as.contains(_))
      if (bs.nonEmpty) {
        val got = spans(Unordered(Seq(Term("a"), Term("b"))), pos("a" -> as, "b" -> bs)).sorted
        assert(got === bruteUnordered(as, bs), s"as=$as bs=$bs")
      }
    }
  }

  test("three-term ordered chains and gaps") {
    // "a x b y y c" -> a@0 b@2 c@5: one chain, gaps = (2-0-1)+(5-2-1) = 3
    val p = pos("a" -> Seq(0), "b" -> Seq(2), "c" -> Seq(5))
    val src = Ordered(Seq(Term("a"), Term("b"), Term("c")))
    val ivs = evaluate(src, p)
    assert(ivs === Vector(Iv(0, 5, 3)))
    assert(evaluate(MaxGaps(2, src), p).isEmpty)
    assert(evaluate(MaxGaps(3, src), p) === Vector(Iv(0, 5, 3)))
    assert(evaluate(MaxWidth(5, src), p).isEmpty)
    assert(evaluate(MaxWidth(6, src), p).size === 1)
  }

  test("block requires exact adjacency") {
    val p = pos("a" -> Seq(1, 7), "b" -> Seq(2, 9))
    assert(spans(Block(Seq(Term("a"), Term("b"))), p) === Seq((1, 2)))
  }

  test("or: containment dedup keeps the inner interval") {
    // single-position term inside a wider ordered interval: the disjunction
    // enumerates by end asc and skips envelopes containing the current one
    val p = pos("a" -> Seq(1), "b" -> Seq(3), "x" -> Seq(2))
    val src = Or(Seq(Ordered(Seq(Term("a"), Term("b"))), Term("x")))
    assert(spans(src, p) === Seq((2, 2)))
  }

  test("containing / containedBy / nonOverlapping / extend / within") {
    val p = pos("a" -> Seq(1, 20), "b" -> Seq(5, 24), "x" -> Seq(3, 40))
    val ab = Ordered(Seq(Term("a"), Term("b")))  // (1,5), (20,24)
    assert(spans(Containing(ab, Term("x")), p) === Seq((1, 5)))
    assert(spans(NotContaining(ab, Term("x")), p) === Seq((20, 24)))
    assert(spans(ContainedBy(Term("x"), ab), p) === Seq((3, 3)))
    assert(spans(NotContainedBy(Term("x"), ab), p) === Seq((40, 40)))
    assert(spans(NonOverlapping(ab, Term("x")), p) === Seq((20, 24)))
    assert(spans(Extend(Term("x"), 2, 1), p) === Seq((1, 4), (38, 41)))
    // within 2 positions of a: x@3 is (extend a by 2 -> [0,3],[18,22] covers 3)
    assert(spans(within(Term("x"), 2, Term("a")), p) === Seq((3, 3)))
    assert(spans(notWithin(Term("x"), 2, Term("a")), p) === Seq((40, 40)))
  }

  test("sloppy freq + saturation score match the reference arithmetic") {
    // intervals (1,2) and (4,6) for a 2-term source: lengths 2 and 3,
    // minExtent 2 -> freq = 1/1 + 1/2 = 1.5; score = 1 - 1/(1+1.5)
    val (freq, score) = freqAndScore(Seq(Iv(1, 2, 0), Iv(4, 6, 1)), 2, 1f, 1f)
    assert(freq === 1.5f)
    assert(score === (1.0f - 1.0f / (1.0f + 1.5f)))
  }

  test("distributed query over a positions tier matches local evaluation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "fast scan join fast table scan"),
      (1L, "scan fast"),
      (2L, "fast join join join scan"),
      (3L, "nothing here"))
    val positions = docs.toDF("docId", "text").as[(Long, String)]
      .flatMap { case (id, t) =>
        t.split(' ').zipWithIndex.groupBy(_._1).map { case (w, ps) => (id, w, ps.map(_._2)) }
      }.toDF("docId", "term", "poss")
    val src = MaxGaps(2, Ordered(Seq(Term("fast"), Term("scan"))))
    val got = Intervals.query(positions, src)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getFloat(2), r.getFloat(3)))
      .sortBy(_._1)
    // doc0: minimal pairs (3,5) [fast@3, scan@5, gaps 1] and (0,1); doc2: fast@0 scan@4 gaps 3 > 2
    val localFreq0 = freqAndScore(Seq(Iv(0, 1, 0), Iv(3, 5, 1)), 2, 1f, 1f)
    assert(got.map(g => (g._1, g._2)) === Seq((0L, 2)))
    assert(got.head._3 === localFreq0._1 && got.head._4 === localFreq0._2)
  }
}
