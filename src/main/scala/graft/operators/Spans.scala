package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Span-query family (reference `lucene/core/src/java/org/apache/lucene/search/spans`):
 * position-aware queries that compose — `SpanTermQuery`, `SpanNearQuery`
 * (ordered + unordered, `NearSpansOrdered.java` / `NearSpansUnordered.java`),
 * `SpanOrQuery`, `SpanNotQuery`, `SpanFirstQuery` (`SpanPositionRangeQuery`
 * with start=0).
 *
 * Spark shape: the ONLY distributed work is (1) a token-position scan
 * filtered to the tree's terms — an `isin` pushed into the source scan —
 * and (2) one groupBy(doc) shuffle carrying (term, pos) pairs for those
 * terms only. The span algebra itself is a per-doc kernel over sorted
 * position lists (each list is one doc's occurrences of one term — small
 * by construction), so the operator scales exactly like the phrase
 * matchers: shuffle bytes proportional to matched-term postings, never to
 * corpus size, and no driver-side state.
 *
 * Span semantics: a span is [start, end) over token positions. Matching
 * docs are those where the tree yields >= 1 span; `spans()` returns the
 * distinct result spans per doc.
 *
 * Near cost (`SpanNearQuery.java` slop): for a choice of one sub-span per
 * clause, cost = (maxEnd - minStart) - sum(clause span lengths); the
 * combination matches iff cost <= slop, and (ordered) clause spans must
 * appear in clause order without overlap (each next start >= previous
 * end, `NearSpansOrdered.java:32-46`). The kernel enumerates combinations
 * with branch-and-bound pruning (sorted lists, earliest-exit) and a hard
 * combination budget — a pathological doc degrades to the greedy
 * earliest-match answer instead of blowing up the task (same policy as
 * `TextOps.minRangeWithRepeats`).
 */
object Spans {

  sealed trait SpanQuery {
    /** Distinct terms referenced by the tree. */
    def terms: Set[String] = this match {
      case SpanTerm(t)            => Set(t)
      case SpanNear(cs, _, _)     => cs.flatMap(_.terms).toSet
      case SpanOr(cs)             => cs.flatMap(_.terms).toSet
      case SpanNot(inc, exc)      => inc.terms ++ exc.terms
      case SpanFirst(inner, _)    => inner.terms
      case SpanContaining(b, l)   => b.terms ++ l.terms
      case SpanWithin(b, l)       => b.terms ++ l.terms
    }
  }
  final case class SpanTerm(term: String) extends SpanQuery
  final case class SpanNear(clauses: Seq[SpanQuery], slop: Int,
                            inOrder: Boolean) extends SpanQuery {
    require(clauses.nonEmpty, "SpanNear needs >= 1 clause")
  }
  final case class SpanOr(clauses: Seq[SpanQuery]) extends SpanQuery {
    require(clauses.nonEmpty, "SpanOr needs >= 1 clause")
  }
  /** Include-spans that do not overlap any exclude-span
    * (`SpanNotQuery.java` with pre = post = 0). */
  final case class SpanNot(include: SpanQuery, exclude: SpanQuery) extends SpanQuery
  /** Spans of `inner` ending at or before token position `end`
    * (`SpanFirstQuery.java`). */
  final case class SpanFirst(inner: SpanQuery, end: Int) extends SpanQuery
  /** Spans of `big` that fully ENCLOSE at least one span of `little`
    * (`SpanContainingQuery.java`: result spans come from `big`). */
  final case class SpanContaining(big: SpanQuery, little: SpanQuery) extends SpanQuery
  /** Spans of `little` fully enclosed by at least one span of `big`
    * (`SpanWithinQuery.java`: result spans come from `little`). */
  final case class SpanWithin(big: SpanQuery, little: SpanQuery) extends SpanQuery

  /** Budget on near-combination enumeration per doc; beyond it the kernel
    * keeps the combinations found so far (greedy earliest matches are
    * found first). Bounds worst-case work on adversarial docs. */
  private val MaxCombos = 100000

  // ---------------------------------------------------------------- kernel

  /** Evaluate a span tree against one doc's term -> sorted positions map.
    * Returns distinct spans sorted by (start, end). */
  private[operators] def eval(q: SpanQuery,
                              pos: Map[String, Array[Int]]): Array[(Int, Int)] =
    q match {
      case SpanTerm(t) =>
        pos.getOrElse(t, Array.empty[Int]).map(p => (p, p + 1))
      case SpanOr(cs) =>
        cs.flatMap(eval(_, pos)).distinct.sortBy(identity).toArray
      case SpanFirst(inner, end) =>
        eval(inner, pos).filter(_._2 <= end)
      case SpanNot(inc, exc) =>
        val ex = eval(exc, pos)
        eval(inc, pos).filter { case (s, e) =>
          !ex.exists { case (xs, xe) => xs < e && s < xe }
        }
      case SpanContaining(big, little) =>
        val ls = eval(little, pos)
        eval(big, pos).filter { case (s, e) =>
          ls.exists { case (ls1, le) => s <= ls1 && le <= e }
        }
      case SpanWithin(big, little) =>
        val bs = eval(big, pos)
        eval(little, pos).filter { case (s, e) =>
          bs.exists { case (bs1, be) => bs1 <= s && e <= be }
        }
      case SpanNear(cs, slop, inOrder) =>
        val lists = cs.map(eval(_, pos)).toArray
        if (lists.exists(_.isEmpty)) Array.empty
        else {
          val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Int)]
          var combos = 0
          val chosen = new Array[(Int, Int)](lists.length)
          def totalLen(upTo: Int): Int = {
            var s = 0; var i = 0
            while (i <= upTo) { s += chosen(i)._2 - chosen(i)._1; i += 1 }
            s
          }
          def dfs(ci: Int): Unit = {
            if (combos >= MaxCombos) return
            if (ci == lists.length) {
              combos += 1
              var minS = Int.MaxValue; var maxE = Int.MinValue; var i = 0
              while (i < chosen.length) {
                if (chosen(i)._1 < minS) minS = chosen(i)._1
                if (chosen(i)._2 > maxE) maxE = chosen(i)._2
                i += 1
              }
              if (maxE - minS - totalLen(lists.length - 1) <= slop)
                out += ((minS, maxE))
            } else {
              val lst = lists(ci)
              var j = 0
              while (j < lst.length && combos < MaxCombos) {
                val sp = lst(j)
                val ok =
                  if (!inOrder || ci == 0) true
                  else sp._1 >= chosen(ci - 1)._2 // in order, non-overlapping
                if (ok) {
                  // bound: even the tightest completion can't beat slop if
                  // the span so far already exceeds it (ordered case: ends
                  // only grow, so width - len is monotone non-decreasing)
                  chosen(ci) = sp
                  val prune = inOrder && ci > 0 && {
                    var minS = Int.MaxValue; var i = 0
                    while (i <= ci) { if (chosen(i)._1 < minS) minS = chosen(i)._1; i += 1 }
                    sp._2 - minS - totalLen(ci) > slop
                  }
                  if (!prune) dfs(ci + 1)
                  else if (inOrder) j = lst.length // sorted: later spans only worse
                }
                j += 1
              }
            }
          }
          dfs(0)
          out.toArray.sortBy(identity)
        }
    }

  // ------------------------------------------------------------- operators

  /** Per-doc spans of `q`: (idCol, start, end), one row per distinct span.
    * Shuffles only the positions of the tree's own terms. */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            q: SpanQuery): DataFrame = {
    val terms = q.terms.toSeq
    val pos = TextOps.tokenPosTable(docs, idCol, textCol)
      .filter(col("tok").isin(terms: _*))
    val grouped = pos.groupBy(idCol)
      .agg(collect_list(struct(col("tok"), col("pos"))).as("tp"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      grouped.schema(idCol),
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("end",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    grouped.mapPartitions { rows =>
      rows.flatMap { r =>
        val tp = r.getSeq[Row](1)
        val byTerm = tp.groupBy(_.getString(0))
          .map { case (t, rs) => t -> rs.map(_.getInt(1)).toArray.sorted }
        eval(q, byTerm).iterator.map { case (s, e) => Row(r.get(0), s, e) }
      }
    }(enc)
  }

  /** Matching docs with span count: (idCol, n_spans). */
  def matchingDocs(docs: DataFrame, idCol: String, textCol: String,
                   q: SpanQuery): DataFrame =
    spans(docs, idCol, textCol, q)
      .groupBy(idCol).agg(count("*").as("n_spans"))
}
