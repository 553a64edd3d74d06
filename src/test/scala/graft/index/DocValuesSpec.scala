package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.query.QueryEngine
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Doc-values tier + field-sorted top-k (SortField / TopFieldCollector
  * analogue): brute-force parity, liveDocs exclusion before the limit, and
  * tier survival through compaction. */
class DocValuesSpec extends SparkSpec {
  import spark.implicits._

  val N = 250
  lazy val localDocs: Seq[(Long, String, String, String)] =
    (0L until N.toLong).map(i => CorpusGen.genFile(i))
      .sortBy(f => (f.repo, f.path, f.commit))
      .zipWithIndex.map { case (f, i) => (i.toLong, f.lang, f.path, f.content) }

  private def buildIdx(): (String, IndexStore.OpenIndex) = {
    val dir = Files.createTempDirectory("graft-dv").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, N, 4).toDF(), Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, dir, numSegments = 2, shufflePartitions = 4,
      docValueCols = Seq("lang", "path"))
    (dir, IndexStore.OpenIndex(spark, dir))
  }

  private def brute(terms: Seq[String], k: Int, dead: Set[Long] = Set.empty): Seq[(Long, String, String)] =
    localDocs.filter { case (id, _, _, c) =>
      !dead(id) && {
        val ts = graft.analysis.Analyzer.terms(c).toSet
        terms.forall(ts)
      }
    }.map { case (id, lang, path, _) => (id, lang, path) }
      .sortBy { case (id, lang, _) => (lang, id) }.take(k)

  test("exportSorted: FULL match set, globally ordered across partitions; dvInSet filters") {
    val (_, idx) = buildIdx()
    val got = idx.exportSorted(Seq("public", "import"), Seq(("lang", true)))
      .select("docId", "lang", "path")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // full set (no window) in (lang, docId) order, even across the range
    // repartition boundary
    assert(got === brute(Seq("public", "import"), Int.MaxValue))
    assert(got.size > 25)
    // DocValuesTermsQuery: dv IN-set, constant score
    val langs = localDocs.map(_._2).distinct.sorted.take(2)
    val dv = idx.dvInSet("lang", langs)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(dv.map(_._1).toSet ===
      localDocs.filter(d => langs.contains(d._2)).map(_._1).toSet)
    assert(dv.forall(_._2 === 1f))
  }

  test("topKByField: field sort over doc values matches brute force; deletes excluded pre-limit") {
    val (dir, idx) = buildIdx()
    val terms = Seq("public", "import")
    for (k <- Seq(5, 25, 1000)) {
      val got = idx.topKByField(terms, Seq(("lang", true)), k)
        .select("docId", "lang", "path")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      assert(got === brute(terms, k), s"k=$k")
    }
    // delete the first 3 of the k=5 page: the page must refill from the
    // next live docs, not under-fill
    val first5 = brute(terms, 5).map(_._1)
    IndexStore.delete(spark, dir, first5.take(3))
    val idx2 = IndexStore.OpenIndex(spark, dir)
    val got = idx2.topKByField(terms, Seq(("lang", true)), 5)
      .select("docId", "lang", "path")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === brute(terms, 5, first5.take(3).toSet))
    assert(got.size === 5)
  }

  test("doc-values tier survives compact; descending + multi-field sort") {
    val (dir, idx) = buildIdx()
    val out = dir + "-compacted"
    IndexStore.compact(spark, dir, out, 4)
    val cidx = IndexStore.OpenIndex(spark, out)
    val got = cidx.topKByField(Seq("class"), Seq(("lang", false), ("path", true)), 10)
      .select("docId", "lang", "path")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = localDocs.filter { case (_, _, _, c) =>
      graft.analysis.Analyzer.terms(c).contains("class")
    }.map { case (id, lang, path, _) => (id, lang, path) }
      .sortBy { case (id, lang, path) => (lang, path, id) }(
        Ordering.Tuple3(Ordering[String].reverse, Ordering[String], Ordering[Long]))
      .take(10)
    assert(got === want)
  }

  test("matchingDocs Or/And constant-score filter") {
    val (_, idx) = buildIdx()
    val orGot = QueryEngine.matchingDocs(spark, idx.blocks, Seq("parseconfig", "handler7"))
      .collect().map(_.getLong(0)).toSet
    val andGot = QueryEngine.matchingDocs(spark, idx.blocks, Seq("parseconfig", "handler7"), QueryEngine.And)
      .collect().map(_.getLong(0)).toSet
    val orWant = localDocs.filter { case (_, _, _, c) =>
      val ts = graft.analysis.Analyzer.terms(c).toSet
      ts("parseconfig") || ts("handler7")
    }.map(_._1).toSet
    val andWant = localDocs.filter { case (_, _, _, c) =>
      val ts = graft.analysis.Analyzer.terms(c).toSet
      ts("parseconfig") && ts("handler7")
    }.map(_._1).toSet
    assert(orGot === orWant)
    assert(andGot === andWant)
    assert(andGot.subsetOf(orGot))
  }

  test("index built without docValueCols refuses field sort with a clear error") {
    val dir = Files.createTempDirectory("graft-dv-none").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 40, 2).toDF(), Seq("repo", "path", "commit"), 2)
    IndexStore.build(spark, withIds, dir, numSegments = 1, shufflePartitions = 2)
    val e = intercept[IllegalArgumentException] {
      IndexStore.OpenIndex(spark, dir).topKByField(Seq("public"), Seq(("lang", true)), 5).collect()
    }
    assert(e.getMessage.contains("doc-values"))
  }

  test("facetByFieldOpts: SimpleFacets prefix/contains/exclude/mincount/sort/paging") {
    val (_, idx) = buildIdx()
    // brute: docs matching 'public', their lang counts
    val matching = localDocs.filter(d =>
      graft.analysis.Analyzer.terms(d._4).contains("public"))
    val counts = matching.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    def facet(prefix: Option[String] = None, contains: Option[String] = None,
              ic: Boolean = false, excl: Set[String] = Set.empty,
              min: Long = 1, limit: Int = 100, off: Int = 0,
              sort: String = "count", missing: Boolean = false) =
      idx.facetByFieldOpts(Seq("public"), "lang", prefix = prefix,
        contains = contains, containsIgnoreCase = ic, excludeTerms = excl,
        minCount = min, limit = limit, offset = off, sort = sort,
        missing = missing)
        .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSeq
    // sort=count: (count DESC, value ASC)
    val got = facet()
    val want = counts.toSeq.sortBy { case (v, c) => (-c, v) }
    assert(got.map { case (v, c) => (v.get, c) } == want)
    // sort=index: value order
    assert(facet(sort = "index").map(_._1.get) == counts.keys.toSeq.sorted)
    // prefix + exclude filter values BEFORE paging
    val langs = counts.keys.toSeq.sorted
    val p0 = langs.head.take(1)
    val prefixed = facet(prefix = Some(p0), sort = "index").map(_._1.get)
    assert(prefixed == langs.filter(_.startsWith(p0)))
    val excluded = facet(excl = Set(langs.head), sort = "index").map(_._1.get)
    assert(!excluded.contains(langs.head))
    // offset/limit page the sorted list
    assert(facet(sort = "index", off = 1, limit = 2).map(_._1.get) ==
      counts.keys.toSeq.sorted.slice(1, 3))
    // mincount filters low buckets
    val maxC = counts.values.max
    assert(facet(min = maxC).forall(_._2 >= maxC))
    // missing appends a null bucket (0 here: every doc has a lang)
    val withMissing = facet(missing = true)
    assert(withMissing.last._1.isEmpty && withMissing.last._2 == 0L)
  }
}
