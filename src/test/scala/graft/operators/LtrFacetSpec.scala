package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LTR linear-model rescoring, interval facets (overlap semantics), and
  * the heatmap facet grid. */
class LtrFacetSpec extends SparkSpec {
  import spark.implicits._

  test("Ltr.rescore: window is top-n of first pass; model reorders within it") {
    val first = Seq((1L, 10.0), (2L, 9.0), (3L, 8.0), (4L, 7.0))
      .toDF("id", "score")
    val src = Seq((1L, 0.0), (2L, 5.0), (3L, 9.0), (4L, 100.0))
      .toDF("id", "boost")
    val model = Ltr.LinearModel(Seq(("first_pass", 1.0), ("boost", 1.0)))
    val got = Ltr.rescore(first, "id", "score", src,
      Seq(("boost", col("boost"))), model, n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // doc 4 (huge boost) is OUTSIDE the top-3 window -> absent;
    // within the window the boost inverts the order
    assert(got.toSeq === Seq((3L, 17.0), (2L, 14.0), (1L, 10.0)))
  }

  test("Ltr.rescore: ties break by id ascending; missing features score 0") {
    val first = Seq((5L, 1.0), (6L, 1.0)).toDF("id", "score")
    val src = Seq((5L, Some(0.0)), (6L, None)).toDF("id", "f")
    val model = Ltr.LinearModel(Seq(("first_pass", 1.0), ("f", 3.0)), intercept = 2.0)
    val got = Ltr.rescore(first, "id", "score", src,
      Seq(("f", col("f"))), model, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.toSeq === Seq((5L, 3.0), (6L, 3.0)))
  }

  test("intervalFacet: overlapping intervals each count their full membership") {
    val df = Seq(10, 20, 30, 40, 50).toDF("v")
    val got = Relational.intervalFacet(df, "v", Seq(
      ("a_low", 0.0, Some(25.0)),     // 10, 20
      ("b_mid", 15.0, Some(45.0)),    // 20, 30, 40 (overlaps a_low on 20)
      ("c_high", 40.0, None)))        // 40, 50 (unbounded above)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a_low" -> 2L, "b_mid" -> 3L, "c_high" -> 2L))
  }

  test("heatmap: grid cells partition the filtered region; counts sum to rows") {
    val pts = Seq((0.5, 0.5), (0.7, 0.1), (1.5, 0.5), (0.5, 1.5), (2.9, 2.9))
      .toDF("lat", "lon")
    val got = Geo.heatmap(pts, "lat", "lon", latMin = 0.0, lonMin = 0.0, cellDeg = 1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === Map((0L, 0L) -> 2L, (1L, 0L) -> 1L, (0L, 1L) -> 1L, (2L, 2L) -> 1L))
    assert(got.values.sum === 5L)
  }

  test("facetSampled: exact when n <= sampleSize; amortized sums approximate n") {
    import org.apache.spark.sql.functions._
    val df = (0L until 400L).map(i => (i, s"v${i % 4}")).toDF("id", "f")
    // n <= sampleSize: rate 1.0, amortized == sampled == exact counts
    val exact = Relational.facetSampled(df, "f", "id", sampleSize = 1000L)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(exact.length == 4 && exact.forall { case (s2, a) => s2 == 100L && a == 100.0 })
    // n > sampleSize: counts scale by 1/rate; totals land near n
    val sampled = Relational.facetSampled(df, "f", "id", sampleSize = 100L)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val totalSampled = sampled.map(_._1).sum
    val totalAmortized = sampled.map(_._2).sum
    assert(totalSampled < 200L, s"sampled $totalSampled of 400")
    assert(math.abs(totalAmortized - 400.0) < 120.0, s"amortized $totalAmortized")
    // deterministic: same call twice, same rows
    val again = Relational.facetSampled(df, "f", "id", sampleSize = 100L)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(sampled.toSeq.sorted == again.toSeq.sorted)
  }

  test("facetTaxonomySum: association sums at every level in one pass") {
    val docs = Seq(("en/web", 10.0), ("en/web", 5.0), ("en/book", 2.0), ("fr/web", 1.0))
      .toDF("path", "v")
    val got = Relational.facetTaxonomySum(docs, "path", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(got(("en", 1)) == (17.0, 3L))
    assert(got(("fr", 1)) == (1.0, 1L))
    assert(got(("en/web", 2)) == (15.0, 2L))
    assert(got(("en/book", 2)) == (2.0, 1L))
    assert(got(("fr/web", 2)) == (1.0, 1L))
    assert(got.size == 5)
  }

  test("facetDomain: filter, blockChildren, blockParent, and excludeTags compose") {
    import org.apache.spark.sql.functions._
    import graft.operators.Relational._
    // parents: (pid, status, price); children: (pid, flag, qty)
    val parents = Seq((1L, "F", 100.0), (2L, "F", 300.0), (3L, "O", 300.0))
      .toDF("pid", "status", "price")
    val children = Seq(
      (1L, "A", 10), (1L, "B", 50), (2L, "A", 60), (2L, "A", 5), (3L, "B", 99))
      .toDF("pid", "flag", "qty")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // parent filter -> children domain -> child filter -> facet flag
    val f1 = counts(facetDomain(parents,
      Seq(TaggedFilter("st", col("status") === "F")),
      Seq(DomainBlockChildren(children, "pid", "pid"),
        DomainFilter(col("qty") >= 50)),
      "flag"))
    assert(f1 === Map("B" -> 1L, "A" -> 1L)) // p1's B(50), p2's A(60)

    // excludeTags drops the price filter; with it kept, only p2 remains
    val withPrice = Seq(TaggedFilter("st", col("status") === "F"),
      TaggedFilter("pr", col("price") > 200))
    val kept = counts(facetDomain(parents, withPrice,
      Seq(DomainBlockChildren(children, "pid", "pid")), "flag"))
    assert(kept === Map("A" -> 2L)) // p2's two A children
    val excl = counts(facetDomain(parents, withPrice,
      Seq(DomainExcludeTags(Set("pr")),
        DomainBlockChildren(children, "pid", "pid")), "flag"))
    assert(excl === Map("A" -> 3L, "B" -> 1L)) // p1+p2 children

    // child query -> DISTINCT parents domain -> parent facet
    val up = counts(facetDomain(children,
      Seq(TaggedFilter("q", col("qty") >= 50)),
      Seq(DomainBlockParent(parents, "pid", "pid")), "status"))
    assert(up === Map("F" -> 2L, "O" -> 1L)) // p1, p2, p3 each ONCE (no doubling)
    // a parent-side domain filter stacks on top of the switch
    val upF = counts(facetDomain(children,
      Seq(TaggedFilter("q", col("qty") >= 50)),
      Seq(DomainBlockParent(parents, "pid", "pid"),
        DomainFilter(col("status") === "F")), "status"))
    assert(upF === Map("F" -> 2L))
  }
}
