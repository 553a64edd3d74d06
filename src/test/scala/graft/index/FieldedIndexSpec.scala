package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import java.nio.file.Files

/** Per-field indexes + field-routed query strings: cross-field boolean
  * composition over shared docIds, per-field stats, unknown fields match
  * nothing, and the single-index searcher still accepts prefixed terms. */
class FieldedIndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val (dir, idxs, localDocs) = {
    val d = Files.createTempDirectory("graft-fielded").toString
    val n = 200
    val withIds = DocIds.assign(CorpusGen.corpus(spark, n, 4).toDF(),
      Seq("repo", "path", "commit"), 4).cache()
    FieldedIndex.build(spark, withIds, d,
      fields = Seq("content" -> "content", "path" -> "path", "lang" -> "lang"),
      numSegments = 1, shufflePartitions = 4)
    val local = (0L until n.toLong).map(i => CorpusGen.genFile(i))
      .sortBy(f => (f.repo, f.path, f.commit))
      .zipWithIndex.map { case (f, i) => (i.toLong, f) }
    (d, FieldedIndex.open(spark, d), local)
  }

  private def terms(s: String): Set[String] = graft.analysis.Analyzer.terms(s).toSet

  test("open finds every committed field; per-field stats are independent") {
    assert(idxs.keySet === Set("content", "path", "lang"))
    assert(idxs("lang").stats.docCount === 200L)
    // 'lang' docs are one token long; content docs are much longer
    assert(idxs("lang").stats.sumTotalTermFreq === 200L)
    assert(idxs("content").stats.sumTotalTermFreq > 10000L)
  }

  test("field-routed boolean query: +lang:scala +content term") {
    val got = FieldedIndex.search(idxs, "content", "+lang:scala +public", 100000)
      .collect().map(_.getLong(0)).toSet
    val want = localDocs.filter { case (_, f) =>
      f.lang == "scala" && terms(f.content)("public")
    }.map(_._1).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("unscoped clauses hit the default field; unknown fields match nothing") {
    val viaDefault = FieldedIndex.search(idxs, "content", "public import", 50)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val single = idxs("content").topK(Seq("public", "import"), 50)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(viaDefault === single)
    assert(FieldedIndex.search(idxs, "content", "nosuchfield:public", 10).count() === 0)
    // but an unknown field inside a SHOULD does not kill the other clause
    val mixed = FieldedIndex.search(idxs, "content", "nosuchfield:x public", 10)
    assert(mixed.count() === 10)
  }

  test("field-scoped prefix and negation compose") {
    val got = FieldedIndex.search(idxs, "content", "+path:src* -lang:md", 100000)
      .collect().map(_.getLong(0)).toSet
    val want = localDocs.filter { case (_, f) =>
      terms(f.path).exists(_.startsWith("src")) && f.lang != "md"
    }.map(_._1).toSet
    assert(got === want)
  }

  test("single-index search still accepts (and scopes) field prefixes to its one field") {
    val a = idxs("content").search("content:public", 20)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val b = idxs("content").search("public", 20)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(a === b)
  }
}
