package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * DrillSideways semantics (reference lucene/facet DrillSideways.java):
 * dim i's counts apply every OTHER dim's drill-down, not its own; the
 * __hits__ row applies them all.
 */
class DrillSidewaysSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    // (id, color, size, inStock)
    (1L, "red", "s", true),
    (2L, "red", "m", true),
    (3L, "blue", "s", true),
    (4L, "blue", "m", false),
    (5L, "green", "s", true),
    (6L, "red", "s", false)
  ).toDF("id", "color", "size", "st")

  private def run(base: org.apache.spark.sql.Column) =
    Relational.drillSideways(df, base,
      Seq(("color", col("color") === "red"), ("size", col("size") === "s")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("sideways counts per dim drop only that dim's own selection") {
    val got = run(lit(true))
    // color counts under size='s' only: red {1,6}, blue {3}, green {5}
    assert(got(("color", "red")) == 2)
    assert(got(("color", "blue")) == 1)
    assert(got(("color", "green")) == 1)
    // size counts under color='red' only: s {1,6}, m {2}
    assert(got(("size", "s")) == 2)
    assert(got(("size", "m")) == 1)
    // hits: color=red AND size=s -> {1,6}
    assert(got(("__hits__", "")) == 2)
    assert(got.size == 6)
  }

  test("base query gates every count") {
    val got = run(col("st"))                       // drop ids 4 and 6
    assert(got(("color", "red")) == 1)             // {1}
    assert(got(("size", "s")) == 1)                // {1}
    assert(got(("size", "m")) == 1)                // {2}
    assert(got(("__hits__", "")) == 1)             // {1}
    assert(!got.contains(("color", "none")))
  }

  test("one dimension degenerates to plain facet counts over the base query") {
    val got = Relational.drillSideways(df, lit(true), Seq(("color", col("color") === "red")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("color", "red")) == 3)
    assert(got(("color", "blue")) == 2)
    assert(got(("color", "green")) == 1)
    assert(got(("__hits__", "")) == 3)
  }

  test("single corpus pass: one source scan, exchanges only for the count agg + output sort") {
    val plan = Relational.drillSideways(df, lit(true),
      Seq(("color", col("color") === "red"), ("size", col("size") === "s")))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1, plan)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }
}
