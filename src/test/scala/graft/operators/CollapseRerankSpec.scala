package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Field collapse / expand (CollapsingQParserPlugin, ExpandComponent),
  * re-ranking (ReRankQParserPlugin / QueryRescorer) and pivot facets
  * (PivotFacetProcessor) — semantics on hand-checkable frames; the
  * corpus-scale versions are oracle-checked as q48/q49/q50. */
class CollapseRerankSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    // (id, group, score)
    (1L, "a", 3.0), (2L, "a", 5.0), (3L, "a", 5.0), (4L, "b", 1.0),
    (5L, "b", 2.0), (6L, "c", 7.0)
  ).toDF("id", "grp", "score")

  test("collapseOn keeps the max-score head, ties to lowest id, with group size") {
    val got = Relational.collapseOn(frame, "grp", "score", "id")
      .select("grp", "id", "score", "group_size")
      .as[(String, Long, Double, Long)].collect().sortBy(_._1)
    // group a: score tie 5.0 between ids 2 and 3 -> id 2 wins
    assert(got.toSeq === Seq(("a", 2L, 5.0, 3L), ("b", 5L, 2.0, 2L), ("c", 6L, 7.0, 1L)))
  }

  test("expandGroups returns the rows behind each head, capped at n") {
    val got = Relational.expandGroups(frame, "grp",
        Seq(col("score").desc, col("id").asc), n = 1)
      .select("grp", "id").as[(String, Long)].collect().sortBy(_._1)
    // a: head=2, next=3 (tie order by id); b: head=5, next=4; c: no tail
    assert(got.toSeq === Seq(("a", 3L), ("b", 4L)))
  }

  test("collapse heads + expand tails partition each group (no overlap, no loss)") {
    val heads = Relational.collapseOn(frame, "grp", "score", "id")
      .select("id").as[Long].collect().toSet
    val tails = Relational.expandGroups(frame, "grp",
        Seq(col("score").desc, col("id").asc), n = 100)
      .select("id").as[Long].collect().toSet
    assert((heads & tails).isEmpty)
    assert(heads ++ tails === (1L to 6L).toSet)
  }

  test("reRank: combined = first_pass + w * rescore inside the window only") {
    val docs = Seq(
      (1L, "spark spark spark"),          // strong main, no rescore terms
      (2L, "spark join join"),            // main + rescore
      (3L, "join data"),                  // rescore only -> not in main results
      (4L, "spark data")                  // main + rescore
    ).toDF("doc_id", "text")
    // window of 2: top-2 by first_pass get re-scored; doc outside window drops
    val got = TextOps.reRank(docs, "doc_id", "text",
        mainTerms = Seq("spark"), rescoreTerms = Seq("join", "data"),
        reRankDocs = 2, weight = 10.0)
      .select("doc_id", "score", "first_pass")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    // top-2 by first pass: doc 1 (tf=3) and doc 4 (len-2 doc beats doc 2's
    // len-3 doc on BM25 length normalization); doc 3 never enters (no main term)
    assert(got.map(_._1) === Seq(1L, 4L))
    val byId = got.map(g => g._1 -> g).toMap
    // doc 1 misses the rescore query: combined == first_pass
    assert(byId(1L)._2 === byId(1L)._3)
    // doc 4 matches it ("data"): combined > first_pass
    assert(byId(4L)._2 > byId(4L)._3)
  }

  test("elevate: pins rank first in config order, exclusions drop, unmatched pins insert") {
    val scored = Seq((10L, 5.0), (11L, 4.0), (12L, 3.0), (13L, 2.0))
      .toDF("doc_id", "score")
    // pin 13 then 99 (99 not in results -> inserted at score 0); exclude 11
    val got = TextOps.elevate(scored, "doc_id", pinned = Seq(13L, 99L),
        excluded = Seq(11L))
      .orderBy(col("elevated").desc, col("pin_pos").asc, col("score").desc, col("doc_id"))
      .select("doc_id", "score", "pin_pos", "elevated")
      .as[(Long, Double, Int, Boolean)].collect().toSeq
    assert(got === Seq(
      (13L, 2.0, 1, true),   // pinned first despite lowest organic score
      (99L, 0.0, 2, true),   // inserted unmatched pin, config order kept
      (10L, 5.0, 0, false),  // organic by score
      (12L, 3.0, 0, false))) // doc 11 excluded entirely
  }

  test("boostByValue multiplies by the clamped feature") {
    val scored = Seq((1L, 2.0), (2L, 3.0)).toDF("doc_id", "score")
    val feats = Seq((1L, 0.5), (2L, -1.0)).toDF("doc_id", "f")
    val got = TextOps.boostByValue(scored, "doc_id", feats, "f")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(1L -> 1.0, 2L -> 0.0)) // negative feature clamps to 0
  }

  test("gatherNodes: first-reach depths over a cyclic graph, bounded hops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (4L, 1L))
      .toDF("src", "dst")
    val got = Relational.gatherNodes(edges, "src", "dst", Seq(1L), hops = 2)
      .as[(Long, Int)].collect().toMap
    // 1 at 0; 2,3 at 1 (3 via the shortcut, NOT depth 2); 4 at 2; cycle ignored
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // zero hops returns just the seeds
    assert(Relational.gatherNodes(edges, "src", "dst", Seq(2L), 0)
      .as[(Long, Int)].collect().toMap === Map(2L -> 0))
  }

  test("shortestPaths: ALL shortest paths, cycles terminate, unreachable is empty") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (2L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Relational.shortestPaths(edges, "src", "dst", 1L, 4L, maxDepth = 5)
      .as[(String, Int)].collect().toSet
    // two depth-2 routes; the depth-3 route 1->2->3->4 is NOT shortest
    assert(got === Set(("1->3->4", 2), ("1->2->4", 2)))
    // cycle route found when it IS the shortest: 3 -> 4 -> 1 -> 2
    assert(Relational.shortestPaths(edges, "src", "dst", 3L, 2L, 5)
      .as[(String, Int)].collect().toSeq === Seq(("3->4->1->2", 3)))
    // unreachable target -> empty (search stops when the frontier dies)
    assert(Relational.shortestPaths(edges, "src", "dst", 1L, 9L, 5).count() === 0)
    // from == to -> the trivial path
    assert(Relational.shortestPaths(edges, "src", "dst", 2L, 2L, 5)
      .as[(String, Int)].collect().toSeq === Seq(("2", 0)))
  }

  test("shortestPaths: dense layered graph — parent-pointer search, full path set") {
    // complete tripartite chain 0 -> {1..6} -> {11..16} -> {21..26} -> 99:
    // 216 shortest paths of depth 4. The search phase only ever carries the
    // per-level (node, parent) edge sets (<= 36 rows), never 216 paths —
    // the path multiplication happens solely in output reconstruction.
    val a = (1L to 6L); val b = (11L to 16L); val c = (21L to 26L)
    val edges = (a.map((0L, _)) ++
      (for (x <- a; y <- b) yield (x, y)) ++
      (for (x <- b; y <- c) yield (x, y)) ++
      c.map((_, 99L))).toDF("src", "dst")
    val got = Relational.shortestPaths(edges, "src", "dst", 0L, 99L, maxDepth = 6)
      .as[(String, Int)].collect()
    assert(got.length === 216)
    assert(got.forall(_._2 === 4))
    assert(got.map(_._1).distinct.length === 216)
    val parts = got.head._1.split("->").map(_.toLong)
    assert(parts.length === 5 && parts.head === 0L && parts.last === 99L)
    // a direct shortcut at depth 2 preempts the deep fan-out entirely
    val cut = edges.union(Seq((0L, 50L), (50L, 99L)).toDF("src", "dst"))
    assert(Relational.shortestPaths(cut, "src", "dst", 0L, 99L, 6)
      .as[(String, Int)].collect().toSeq === Seq(("0->50->99", 2)))
  }

  test("facetPivot nests top-B counts under top-A values with level totals") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "book"), ("en", "wiki"),
      ("fr", "web"), ("fr", "book"),
      ("de", "web")
    ).toDF("lang", "src")
    val got = Relational.facetPivot(df, "lang", "src", topA = 2, topBPerA = 1)
      .select("lang", "count_a", "src", "count_b")
      .as[(String, Long, String, Long)].collect().sortBy(_._1).toSeq
    // top-2 langs by total: en (4), fr (2); per lang top-1 source: web
    assert(got === Seq(("en", 4L, "web", 2L), ("fr", 2L, "book", 1L)))
  }
}
