package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Solr atomic updates (AtomicUpdateDocumentMerger) — per-command semantics
  * and arrival-order application, checked against the reference contract:
  * `remove` drops ONE occurrence (Collection.remove, doRemove:509-523),
  * `removeregex` drops every value whose WHOLE text matches
  * (Matcher.matches(), doRemoveRegex:525-545), `inc` on a missing value
  * takes the increment as the new value (doInc:505-506), `add-distinct`
  * skips values already present (doAddDistinct:444-477), `set` null removes
  * the field, and commands for one doc apply in ascending seq. */
class AtomicUpdateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", 10L, Seq("a", "b", "a")),
    (2L, "de", 20L, Seq("x")),
    (3L, null.asInstanceOf[String], 30L, null.asInstanceOf[Seq[String]]),
    (4L, "fr", 40L, Seq("keep"))
  ).toDF("id", "lang", "n", "tags")

  private def ups(rows: (Long, Int, String, String, String)*) =
    rows.toDF("id", "seq", "field", "op", "value")

  private def merged(updates: org.apache.spark.sql.DataFrame) =
    AtomicUpdate.merge(docs, "id", updates,
      stringFields = Seq("lang"), longFields = Seq("n"),
      arrayFields = Seq("tags"))

  private def rowOf(df: org.apache.spark.sql.DataFrame, id: Long): Row =
    df.filter(col("id") === id).head()

  test("set replaces; set null removes; untouched docs pass through") {
    val out = merged(ups(
      (1L, 1, "lang", "set", "zz"),
      (2L, 1, "lang", "set", null)))
    val r1 = rowOf(out, 1L)
    assert(r1.getString(1) == "zz" && r1.getLong(2) == 10L &&
      r1.getSeq[String](3) == Seq("a", "b", "a"))
    assert(rowOf(out, 2L).isNullAt(1))
    val r4 = rowOf(out, 4L)
    assert(r4.getString(1) == "fr" && r4.getLong(2) == 40L &&
      r4.getSeq[String](3) == Seq("keep"))
    assert(out.count() == 4)
  }

  test("inc adds; inc on null existing takes the increment as the value") {
    val out = merged(ups(
      (1L, 1, "n", "inc", "5"),
      (1L, 2, "n", "inc", "-2"),
      (3L, 1, "lang", "set", "it"))) // doc 3 n untouched
    assert(rowOf(out, 1L).getLong(2) == 13L)
    assert(rowOf(out, 3L).getLong(2) == 30L)
    // missing existing: null doc value + inc
    val docsNull = Seq((9L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "n").select(col("id"), col("n").cast("long"))
    val out2 = AtomicUpdate.merge(docsNull, "id",
      ups((9L, 1, "n", "inc", "7")), longFields = Seq("n"))
    assert(out2.head().getLong(1) == 7L)
  }

  test("add appends; add-distinct skips present values, sequentially") {
    val out = merged(ups(
      (2L, 1, "tags", "add", "x"),          // duplicate allowed -> [x, x]
      (2L, 2, "tags", "add-distinct", "x"), // present -> no-op
      (2L, 3, "tags", "add-distinct", "y"), // absent -> append
      (2L, 4, "tags", "add-distinct", "y"), // just appended -> no-op
      (3L, 1, "tags", "add", "first")))     // null array -> create
    assert(rowOf(out, 2L).getSeq[String](3) == Seq("x", "x", "y"))
    assert(rowOf(out, 3L).getSeq[String](3) == Seq("first"))
  }

  test("remove drops exactly ONE occurrence; missing value is a no-op") {
    val out = merged(ups(
      (1L, 1, "tags", "remove", "a"),      // [a,b,a] -> [b,a]
      (2L, 1, "tags", "remove", "zz"),     // absent -> unchanged
      (3L, 1, "tags", "remove", "zz")))    // null array -> stays null
    assert(rowOf(out, 1L).getSeq[String](3) == Seq("b", "a"))
    assert(rowOf(out, 2L).getSeq[String](3) == Seq("x"))
    assert(rowOf(out, 3L).isNullAt(3))
  }

  test("removeregex removes ALL whole-string matches, never substrings") {
    val docs2 = Seq((1L, Seq("alpha", "beta", "alphabet", "alp")))
      .toDF("id", "tags")
    val out = AtomicUpdate.merge(docs2, "id",
      ups((1L, 1, "tags", "removeregex", "alpha")), // whole match only
      arrayFields = Seq("tags"))
    assert(out.head().getSeq[String](1) == Seq("beta", "alphabet", "alp"))
    val out2 = AtomicUpdate.merge(docs2, "id",
      ups((1L, 1, "tags", "removeregex", "alp.*")),
      arrayFields = Seq("tags"))
    assert(out2.head().getSeq[String](1) == Seq("beta"))
  }

  test("commands apply in ascending seq regardless of input row order") {
    val out = merged(ups(
      (1L, 3, "lang", "set", "last"),
      (1L, 1, "lang", "set", "first"),
      (1L, 2, "lang", "set", "mid")))
    assert(rowOf(out, 1L).getString(1) == "last")
    // interleave across ops on an array field
    val out2 = merged(ups(
      (2L, 2, "tags", "remove", "q"),
      (2L, 1, "tags", "add", "q"),    // add then remove -> [x]
      (2L, 3, "tags", "add", "z")))
    assert(rowOf(out2, 2L).getSeq[String](3) == Seq("x", "z"))
  }

  test("plan: ops side aggregates once and joins once, no window") {
    val out = merged(ups((1L, 1, "lang", "set", "zz")))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"),
      "atomic merge must not use a window function")
    val joins = "Join".r.findAllIn(
      out.queryExecution.executedPlan.toString).size
    assert(joins <= 2, s"expected a single doc-ops join, got:\n$plan")
  }
}
