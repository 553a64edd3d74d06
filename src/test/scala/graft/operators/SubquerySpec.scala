package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [subquery] response transformer — ordered per-parent doc lists from a
  * parameterized sub-query, unlimited numFound, multi-valued row params. */
class SubquerySpec extends SparkSpec {

  private lazy val depts = {
    import spark.implicits._
    Seq(
      (10L, "eng", 5.0), (11L, "eng", 9.0), (12L, "eng", 7.0), (13L, "eng", 1.0),
      (20L, "ops", 4.0),
      (30L, "hr", 2.0)
    ).toDF("dept_id", "org", "budget")
  }

  test("scalar row param: sub-query sort + rows cap, numFound unlimited") {
    import spark.implicits._
    val emps = Seq((1L, "eng"), (2L, "ops"), (3L, "none")).toDF("emp_id", "org")
    val out = Relational.subqueryTransformer(
      emps, "emp_id", "org", depts, "org", "dept_id",
      sortBy = Seq(col("budget").desc, col("dept_id").asc), rows = 2, name = "d")
      .select(col("emp_id"), col("d_ids"), col("d_numfound"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(out(1L) == ((Seq(11L, 12L), 4L))) // budget-ordered top-2 of 4 matches
    assert(out(2L) == ((Seq(20L), 1L)))
    assert(out(3L) == ((Seq(), 0L)))         // no matches: empty list, 0
  }

  test("multi-valued row param matches ANY value and dedups sub docs") {
    import spark.implicits._
    val emps = Seq(
      (1L, Seq("eng", "ops")),   // matches both orgs
      (2L, Seq("hr", "hr"))      // duplicate values must not double-count
    ).toDF("emp_id", "orgs")
    val out = Relational.subqueryTransformer(
      emps, "emp_id", "orgs", depts, "org", "dept_id",
      sortBy = Seq(col("budget").desc, col("dept_id").asc), rows = 3, name = "d")
      .select(col("emp_id"), col("d_ids"), col("d_numfound"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(out(1L) == ((Seq(11L, 12L, 10L), 5L))) // merged, globally budget-ranked
    assert(out(2L) == ((Seq(30L), 1L)))
  }

  test("sub-query filter applies before ranking and counting") {
    import spark.implicits._
    val emps = Seq((1L, "eng")).toDF("emp_id", "org")
    val out = Relational.subqueryTransformer(
      emps, "emp_id", "org", depts, "org", "dept_id",
      sortBy = Seq(col("budget").desc, col("dept_id").asc), rows = 10,
      subFilter = Some(col("budget") >= 5.0), name = "d")
      .select(col("d_ids"), col("d_numfound")).collect().head
    assert(out.getSeq[Long](0) == Seq(11L, 12L, 10L) && out.getLong(1) == 3L)
  }
}
