package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Minimal-interval query algebra — the Spark shape of the reference's
 * intervals module (lucene/queries/src/java/org/apache/lucene/queries/
 * intervals/: Intervals.java factory surface, IntervalQuery scoring).
 *
 * Sources compose like the reference's IntervalsSource tree; per-document
 * evaluation re-implements the reference's lazy iterator algebra
 * (OrderedIntervalsSource.java:110-137, UnorderedIntervalsSource.java:
 * 137-165, BlockIntervalsSource.java:114-135, DisjunctionIntervalsSource
 * .java:200-215, FilteredIntervalsSource gaps/width filters,
 * ExtendedIntervalIterator) over the index's positions tier. The document
 * set and positions are DISTRIBUTED (a term-pruned scan of the positions
 * table grouped by docId); only the per-doc interval walk is local — the
 * same split as the reference, where the iterator runs per segment-doc.
 *
 * Scoring (IntervalScorer.java:65-68 + IntervalScoreFunction saturation):
 *   freq(d)  = Σ over matching intervals of 1 / max(length − minExtent + 1, 1)
 *   score(d) = boost * (1 − pivot / (pivot + freq))        // pivot default 1
 * computed in the reference's float/double mixture.
 */
object Intervals {

  private val NoMore = Int.MaxValue

  sealed trait Source {
    /** Terms whose position lists this source reads (the pruned scan set). */
    def termSet: Set[String]
    /** Reference minExtent (the smallest span this source can match). */
    def minExtent: Int
  }
  final case class Term(t: String) extends Source {
    def termSet = Set(t); def minExtent = 1
  }
  /** Intervals over sub-sources in query order (ordered(...)). */
  final case class Ordered(subs: Seq[Source]) extends Source {
    require(subs.size >= 2)
    def termSet = subs.flatMap(_.termSet).toSet
    def minExtent = subs.map(_.minExtent).sum
  }
  /** Intervals over sub-sources in any order (unordered(...)). */
  final case class Unordered(subs: Seq[Source]) extends Source {
    require(subs.size >= 2)
    def termSet = subs.flatMap(_.termSet).toSet
    def minExtent = subs.map(_.minExtent).sum
  }
  /** Contiguous run of sub-sources (phrase(...)). */
  final case class Block(subs: Seq[Source]) extends Source {
    require(subs.size >= 2)
    def termSet = subs.flatMap(_.termSet).toSet
    def minExtent = subs.map(_.minExtent).sum
  }
  /** Union with containment dedup (or(...)). */
  final case class Or(subs: Seq[Source]) extends Source {
    require(subs.nonEmpty)
    def termSet = subs.flatMap(_.termSet).toSet
    def minExtent = subs.map(_.minExtent).min
  }
  /** Keep intervals with at most `g` internal gaps (maxgaps(g, ...)). */
  final case class MaxGaps(g: Int, sub: Source) extends Source {
    def termSet = sub.termSet; def minExtent = sub.minExtent
  }
  /** Keep intervals spanning at most `w` positions (maxwidth(w, ...)). */
  final case class MaxWidth(w: Int, sub: Source) extends Source {
    def termSet = sub.termSet; def minExtent = sub.minExtent
  }
  /** Intervals of `big` that contain an interval of `small`. */
  final case class Containing(big: Source, small: Source) extends Source {
    def termSet = big.termSet ++ small.termSet; def minExtent = big.minExtent
  }
  /** Intervals of `small` contained in an interval of `big`. */
  final case class ContainedBy(small: Source, big: Source) extends Source {
    def termSet = small.termSet ++ big.termSet; def minExtent = small.minExtent
  }
  /** Intervals of `minuend` that do NOT contain any of `subtrahend`. */
  final case class NotContaining(minuend: Source, subtrahend: Source) extends Source {
    def termSet = minuend.termSet ++ subtrahend.termSet; def minExtent = minuend.minExtent
  }
  /** Intervals of `small` NOT contained in any of `big`. */
  final case class NotContainedBy(small: Source, big: Source) extends Source {
    def termSet = small.termSet ++ big.termSet; def minExtent = small.minExtent
  }
  /** Intervals of `minuend` that do not overlap any of `subtrahend`. */
  final case class NonOverlapping(minuend: Source, subtrahend: Source) extends Source {
    def termSet = minuend.termSet ++ subtrahend.termSet; def minExtent = minuend.minExtent
  }
  /** Bounds widened by `before`/`after` positions (extend(...)). */
  final case class Extend(sub: Source, before: Int, after: Int) extends Source {
    def termSet = sub.termSet
    def minExtent = { val m = before + sub.minExtent + after; if (m < 0) Int.MaxValue else m }
  }

  /** within(source, positions, reference) — Intervals.java:323. */
  def within(source: Source, positions: Int, reference: Source): Source =
    ContainedBy(source, Extend(reference, positions, positions))
  /** notWithin(minuend, positions, subtrahend) — Intervals.java:311. */
  def notWithin(minuend: Source, positions: Int, subtrahend: Source): Source =
    NonOverlapping(minuend, Extend(subtrahend, positions, positions))

  // ---------------------------------------------------------------------
  // per-document iterator algebra
  // ---------------------------------------------------------------------

  final case class Iv(start: Int, end: Int, gaps: Int)

  /** Iterator protocol of the reference (IntervalIterator): start/end are
    * -1 before the first nextInterval(), NoMore after exhaustion. */
  private sealed abstract class It {
    var start: Int = -1
    var end: Int = -1
    def gaps: Int
    def nextInterval(): Int
    final def exhaust(): Unit = { start = NoMore; end = NoMore }
  }

  private final class CursorIt(ivs: Vector[Iv]) extends It {
    private var i = -1
    private var g = 0
    def gaps: Int = g
    def nextInterval(): Int = {
      i += 1
      if (i >= ivs.length) { exhaust(); NoMore }
      else { val v = ivs(i); start = v.start; end = v.end; g = v.gaps; start }
    }
  }

  /** OrderedIntervalsSource.java:110-137, verbatim control flow. */
  private final class OrderedIt(subs: IndexedSeq[It]) extends It {
    subs(0).nextInterval() // reset(): first sub pre-advanced
    private var firstEnd = -1
    def gaps: Int = {
      var g = subs(1).start - firstEnd - 1
      var i = 2
      while (i < subs.length) { g += subs(i).start - subs(i - 1).end - 1; i += 1 }
      g
    }
    def nextInterval(): Int = {
      start = NoMore; end = NoMore
      var b = Int.MaxValue
      var i = 1
      while (true) {
        var inner = true
        while (inner) {
          if (subs(i - 1).end >= b) return start
          if (i == subs.length || subs(i).start > subs(i - 1).end) inner = false
          else {
            var cont = true
            while (cont) {
              if (subs(i).end >= b || subs(i).nextInterval() == NoMore) return start
              cont = subs(i).start <= subs(i - 1).end
            }
            i += 1
          }
        }
        start = subs(0).start
        if (start == NoMore) { end = NoMore; return NoMore }
        firstEnd = subs(0).end
        end = subs(subs.length - 1).end
        b = subs(subs.length - 1).start
        i = 1
        if (subs(0).nextInterval() == NoMore) return start
      }
      start // unreachable
    }
  }

  /** BlockIntervalsSource.java:114-135. */
  private final class BlockIt(subs: IndexedSeq[It]) extends It {
    def gaps = 0
    def nextInterval(): Int = {
      if (subs(0).nextInterval() == NoMore) { exhaust(); return NoMore }
      var i = 1
      while (i < subs.length) {
        while (subs(i).start <= subs(i - 1).end) {
          if (subs(i).nextInterval() == NoMore) { exhaust(); return NoMore }
        }
        if (subs(i).start == subs(i - 1).end + 1) i += 1
        else {
          if (subs(0).nextInterval() == NoMore) { exhaust(); return NoMore }
          i = 1
        }
      }
      start = subs(0).start
      end = subs(subs.length - 1).end
      start
    }
  }

  /** UnorderedIntervalsSource.java:101-193 (PQ + right-extreme windowing). */
  private final class UnorderedIt(subs: IndexedSeq[It]) extends It {
    private implicit val ord: Ordering[It] = (a: It, b: It) =>
      // reference lessThan: a before b if a.start < b.start, ties widest first
      if (a.start < b.start || (a.start == b.start && a.end >= b.end)) 1 else -1
    private val queue = scala.collection.mutable.PriorityQueue.empty[It]
    private var queueEnd = -1
    private var firstEnd = -1
    // reset(): every sub advanced once and queued
    locally {
      var ok = true
      for (s <- subs if ok) {
        if (s.nextInterval() == NoMore) ok = false
        else { queue.enqueue(s); if (s.end > queueEnd) queueEnd = s.end }
      }
    }
    def gaps: Int = {
      val inner = new Array[Int](subs.length * 2)
      var i = 0
      while (i < subs.length) {
        if (subs(i).end > end) { inner(i * 2) = start; inner(i * 2 + 1) = firstEnd }
        else { inner(i * 2) = subs(i).start; inner(i * 2 + 1) = subs(i).end }
        i += 1
      }
      java.util.Arrays.sort(inner)
      var g = 0
      i = 1
      while (i < subs.length) { g += inner(i * 2) - inner(i * 2 - 1) - 1; i += 1 }
      g
    }
    private def popAdvance(): Unit = {
      val it = queue.dequeue()
      if (it.nextInterval() != NoMore) {
        queue.enqueue(it)
        if (it.end > queueEnd) queueEnd = it.end
      }
    }
    def nextInterval(): Int = {
      while (queue.size == subs.length && queue.head.start == start) popAdvance()
      if (queue.size < subs.length) { exhaust(); return NoMore }
      var go = true
      while (go) {
        start = queue.head.start
        firstEnd = queue.head.end
        end = queueEnd
        if (queue.head.end == end) return start
        popAdvance()
        go = queue.size == subs.length && end == queueEnd
      }
      start
    }
  }

  /** DisjunctionIntervalsSource.java:200-219 (end-asc queue, containment skip). */
  private final class DisjunctionIt(subs: IndexedSeq[It]) extends It {
    private implicit val ord: Ordering[It] = (a: It, b: It) =>
      if (a.end < b.end || (a.end == b.end && a.start >= b.start)) 1 else -1
    private val queue = scala.collection.mutable.PriorityQueue.empty[It]
    for (s <- subs) if (s.nextInterval() != NoMore) queue.enqueue(s)
    private var current: It = null
    def gaps: Int = current.gaps
    private def contains(it: It, s: Int, e: Int): Boolean =
      s >= it.start && s <= it.end && e >= it.start && e <= it.end
    def nextInterval(): Int = {
      if (current == null) {
        if (queue.isEmpty) { exhaust(); return NoMore }
        current = queue.head
        start = current.start; end = current.end
        return start
      }
      val (s, e) = (current.start, current.end)
      while (queue.nonEmpty && contains(queue.head, s, e)) {
        val it = queue.dequeue()
        if (it.nextInterval() != NoMore) queue.enqueue(it)
      }
      if (queue.isEmpty) { exhaust(); current = null; return NoMore }
      current = queue.head
      start = current.start; end = current.end
      start
    }
  }

  private final class FilterIt(in: It, accept: It => Boolean) extends It {
    def gaps: Int = in.gaps
    def nextInterval(): Int = {
      var r = in.nextInterval()
      while (r != NoMore && !accept(in)) r = in.nextInterval()
      start = in.start; end = in.end
      r
    }
  }

  private final class ExtendIt(in: It, before: Int, after: Int) extends It {
    def gaps: Int = in.gaps
    def nextInterval(): Int = {
      val r = in.nextInterval()
      if (r == NoMore) { exhaust(); NoMore }
      else {
        start = math.max(0, in.start - before)
        val e = in.end.toLong + after
        end = if (e > Int.MaxValue) Int.MaxValue else e.toInt
        start
      }
    }
  }

  /** Drain an iterator into the interval list it would have produced. */
  private def drain(it: It): Vector[Iv] = {
    val out = Vector.newBuilder[Iv]
    while (it.nextInterval() != NoMore) out += Iv(it.start, it.end, it.gaps)
    out.result()
  }

  /** All intervals the reference iterator tree would enumerate for one doc
    * (positions: ascending per term; terms absent from the doc are empty). */
  def evaluate(src: Source, positions: Map[String, Array[Int]]): Vector[Iv] =
    drain(iterator(src, positions))

  private def iterator(src: Source, positions: Map[String, Array[Int]]): It = src match {
    case Term(t) =>
      new CursorIt(positions.getOrElse(t, Array.empty[Int]).toVector.map(p => Iv(p, p, 0)))
    case Ordered(subs) =>
      val its = subs.map(s => cursor(s, positions)).toIndexedSeq
      if (its.exists(_.isEmpty)) emptyIt else new OrderedIt(its.map(new CursorIt(_)))
    case Block(subs) =>
      val its = subs.map(s => cursor(s, positions)).toIndexedSeq
      if (its.exists(_.isEmpty)) emptyIt else new BlockIt(its.map(new CursorIt(_)))
    case Unordered(subs) =>
      val its = subs.map(s => cursor(s, positions)).toIndexedSeq
      if (its.exists(_.isEmpty)) emptyIt else new UnorderedIt(its.map(new CursorIt(_)))
    case Or(subs) =>
      new DisjunctionIt(subs.map(s => iterator(s, positions)).toIndexedSeq)
    case MaxGaps(g, sub) => new FilterIt(iterator(sub, positions), _.gaps <= g)
    case MaxWidth(w, sub) => new FilterIt(iterator(sub, positions), it => it.end - it.start + 1 <= w)
    case Containing(big, small) =>
      val smalls = evaluate(small, positions)
      new FilterIt(iterator(big, positions),
        it => smalls.exists(s => s.start >= it.start && s.end <= it.end))
    case ContainedBy(small, big) =>
      val bigs = evaluate(big, positions)
      new FilterIt(iterator(small, positions),
        it => bigs.exists(b => b.start <= it.start && b.end >= it.end))
    case NotContaining(minuend, subtrahend) =>
      val subs = evaluate(subtrahend, positions)
      new FilterIt(iterator(minuend, positions),
        it => !subs.exists(s => s.start >= it.start && s.end <= it.end))
    case NotContainedBy(small, big) =>
      val bigs = evaluate(big, positions)
      new FilterIt(iterator(small, positions),
        it => !bigs.exists(b => b.start <= it.start && b.end >= it.end))
    case NonOverlapping(minuend, subtrahend) =>
      val subs = evaluate(subtrahend, positions)
      new FilterIt(iterator(minuend, positions),
        it => !subs.exists(s => s.start <= it.end && s.end >= it.start))
    case Extend(sub, before, after) =>
      new ExtendIt(iterator(sub, positions), before, after)
  }

  /** Leaf-ish sources are evaluated eagerly and re-cursored so composite
    * iterators see the plain cursor protocol. */
  private def cursor(src: Source, positions: Map[String, Array[Int]]): Vector[Iv] =
    evaluate(src, positions)

  private def emptyIt: It = new CursorIt(Vector.empty)

  // ---------------------------------------------------------------------
  // document-level query
  // ---------------------------------------------------------------------

  /** Reference sloppy frequency + saturation score for one doc's intervals
    * (IntervalScorer.java:65-68; IntervalScoreFunction saturation). */
  def freqAndScore(ivs: Seq[Iv], minExtent: Int, pivot: Float, boost: Float): (Float, Float) = {
    var freq = 0f
    ivs.foreach { iv =>
      val length = iv.end - iv.start + 1
      freq = (freq + 1.0 / math.max(length - minExtent + 1, 1)).toFloat
    }
    (freq, boost * (1.0f - pivot / (pivot + freq)))
  }

  /**
   * Matching docs with interval count, sloppy freq and saturation score.
   * `positions`: the index positions tier (docId, term, poss) — the scan is
   * pruned to the source's own terms (file/row-group pruning on the
   * term-bucketed tier), grouped by docId (one shuffle of the pruned rows),
   * and each doc walks the iterator algebra locally.
   * Returns (docId, n_intervals, freq, score).
   */
  def query(positions: DataFrame, src: Source, pivot: Float = 1f, boost: Float = 1f): DataFrame = {
    val spark = positions.sparkSession
    import spark.implicits._
    val terms = src.termSet.toSeq
    val minExtent = src.minExtent
    positions
      .filter(col("term").isin(terms: _*))
      .select(col("docId").cast("long"), col("term"), col("poss"))
      .as[(Long, String, Array[Int])]
      .groupByKey(_._1)
      .flatMapGroups { (docId, rows) =>
        val pos = rows.map(r => r._2 -> r._3).toMap
        val ivs = evaluate(src, pos)
        if (ivs.isEmpty) Iterator.empty
        else {
          val (freq, score) = freqAndScore(ivs, minExtent, pivot, boost)
          Iterator.single((docId, ivs.size, freq, score))
        }
      }
      .toDF("docId", "n_intervals", "freq", "score")
  }
}
