package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** RangeField relation semantics, incl. the reference's CROSSES =
  * INTERSECTS && !WITHIN doc-level rule (RangeFieldQuery.java CROSSES
  * .matches — a doc range CONTAINING the query still crosses). */
class RangeFieldSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, 10.0, 20.0),  // within [0,100]
      (2L, -5.0, 5.0),   // crosses the lower edge of [0,100]
      (3L, -10.0, 200.0),// contains [0,100]
      (4L, 300.0, 400.0),// disjoint
      (5L, 0.0, 100.0)   // exactly equal: within AND contains
    ).toDF("id", "lo", "hi")
  }

  private def rel = RangeField.relations(docs, Seq((col("lo"), col("hi"))),
      qMin = Seq(0.0), qMax = Seq(100.0))
    .collect().map(r => r.getLong(0) ->
      ((r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
  // columns: id, lo, hi, intersects, within, contains, crosses

  test("1-D relations: intersects/within/contains/crosses") {
    assert(rel(1L) == ((1, 1, 0, 0)))
    assert(rel(2L) == ((1, 0, 0, 1)))
    assert(rel(3L) == ((1, 0, 1, 1))) // contains but not within -> crosses (reference rule)
    assert(rel(4L) == ((0, 0, 0, 0)))
    assert(rel(5L) == ((1, 1, 1, 0))) // boundary-equal: inclusive both ways, not crosses
  }

  test("multi-dim: every dimension must hold; 4-dim cap enforced") {
    import spark.implicits._
    val d2 = Seq((1L, 10.0, 20.0, 10.0, 20.0), (2L, 10.0, 20.0, 900.0, 950.0))
      .toDF("id", "lo1", "hi1", "lo2", "hi2")
    val got = RangeField.relations(d2,
        Seq((col("lo1"), col("hi1")), (col("lo2"), col("hi2"))),
        qMin = Seq(0.0, 0.0), qMax = Seq(100.0, 100.0))
      .collect().map(r => r.getLong(0) -> r.getInt(5)).toMap // within flag
    assert(got == Map(1L -> 1, 2L -> 0)) // dim-2 miss kills the relation
    intercept[IllegalArgumentException] {
      RangeField.intersects(Seq.fill(5)((col("lo1"), col("hi1"))),
        Seq.fill(5)(0.0), Seq.fill(5)(1.0))
    }
    intercept[IllegalArgumentException] {
      RangeField.intersects(Seq((col("lo1"), col("hi1"))), Seq(0.0), Seq(1.0, 2.0))
    }
  }
}
