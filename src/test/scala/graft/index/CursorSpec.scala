package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.query.Cursor
import java.nio.file.Files

/** CursorMark deep paging (reference solr CursorMark.java): pages walked by
  * totem concatenate to the full field-sorted match set; the end-of-results
  * mark is a fixpoint; marks round-trip through serialization. */
class CursorSpec extends SparkSpec {

  private lazy val built: (String, IndexStore.OpenIndex) = {
    val dir = Files.createTempDirectory("graft-cursor").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 300, 4).toDF(), Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, dir, numSegments = 2, shufflePartitions = 4,
      docValueCols = Seq("lang", "path"))
    (dir, IndexStore.OpenIndex(spark, dir))
  }

  private def walk(sortBys: Seq[(String, Boolean)], k: Int): Seq[Seq[Long]] = {
    val (_, idx) = built
    var mark = Cursor.Start
    val pages = scala.collection.mutable.Buffer[Seq[Long]]()
    var done = false
    while (!done) {
      val (page, next) = idx.cursorPage(Seq("public"), sortBys, k, mark)
      val ids = page.collect().map(_.getAs[Long]("docId")).toSeq
      if (ids.isEmpty) {
        assert(next == mark) // end-of-results: mark is a fixpoint
        done = true
      } else {
        pages += ids
        assert(next != mark)
        mark = next
      }
    }
    pages.toSeq
  }

  test("pages concatenate exactly to the full sorted match set (asc, with field ties)") {
    val (_, idx) = built
    val full = idx.topKByField(Seq("public"), Seq(("lang", true)), 10000)
      .collect().map(_.getAs[Long]("docId")).toSeq
    val pages = walk(Seq(("lang", true)), 37) // ragged page size crosses tie runs
    assert(pages.flatten == full)
    assert(pages.dropRight(1).forall(_.size == 37))
  }

  test("desc sort and multi-field sort page identically to the one-shot ordering") {
    val (_, idx) = built
    val sorts = Seq(("lang", false), ("path", true))
    val full = idx.topKByField(Seq("public"), sorts, 10000)
      .collect().map(_.getAs[Long]("docId")).toSeq
    assert(walk(sorts, 50).flatten == full)
  }

  test("cursor totem round-trips its typed values") {
    val c = Cursor(Seq(42L, -1.5, "héllo|pipe", 7L))
    assert(Cursor.parse(c.serialize).get.values == Seq(42L, -1.5, "héllo|pipe", 7L))
    assert(Cursor.parse(Cursor.Start).isEmpty)
    intercept[IllegalArgumentException](Cursor.parse("x123"))
  }

  test("a page is a fresh bounded top-k, not sort-and-skip: plan shows a limit") {
    val (_, idx) = built
    val (_, m1) = idx.cursorPage(Seq("public"), Seq(("lang", true)), 10)
    // rebuild page-2's lazy plan the way cursorPage does, and audit it
    val after = Cursor.parse(m1).get
    val plan = idx.topKByField(Seq("public"), Seq(("lang", true)), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(Cursor.afterPredicate(Seq(("lang", true)), after.values) != null)
  }
}
