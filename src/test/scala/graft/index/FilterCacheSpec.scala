package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.index.IndexStore.{FqDocValue, FqTerms}
import graft.query.QueryEngine
import java.nio.file.Files

/** Solr fq + filterCache (SolrIndexSearcher.getDocListC): non-scoring
  * filters with DocSets cached per filter and reused across different
  * main queries. */
class FilterCacheSpec extends SparkSpec {

  private lazy val idx: IndexStore.OpenIndex = {
    val dir = Files.createTempDirectory("graft-fq").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 250, 4).toDF(),
      Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, dir, numSegments = 2, shufflePartitions = 4,
      docValueCols = Seq("lang"))
    IndexStore.OpenIndex(spark, dir)
  }

  test("fq restricts the match set WITHOUT changing scores") {
    val fq = FqDocValue("lang", "scala")
    val filtered = idx.topKWithFilter(Seq("public"), 1000, fq)
      .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val unfiltered = idx.topK(Seq("public"), 100000)
      .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val allowed = idx.cachedFilterDocs(fq).collect().map(_.getLong(0)).toSet
    assert(filtered.nonEmpty)
    assert(filtered.keySet.subsetOf(allowed))
    // every filtered doc keeps its EXACT unfiltered score (non-scoring fq)
    filtered.foreach { case (id, s) => assert(unfiltered(id) == s, s"doc $id") }
    // and the filtered set is exactly the intersection
    assert(filtered.keySet == unfiltered.keySet.intersect(allowed))
  }

  test("the filter's DocSet is cached: same instance reused across different main queries") {
    val fq = FqTerms(Seq("public", "import"), QueryEngine.And)
    val first = idx.cachedFilterDocs(fq)
    idx.topKWithFilter(Seq("static"), 10, fq).collect()
    idx.topKWithFilter(Seq("void"), 10, fq).collect()
    val again = idx.cachedFilterDocs(fq)
    assert(first eq again, "filterCache must return the SAME persisted DocSet")
    assert(first.storageLevel.useMemory || first.storageLevel.useDisk,
      "cached DocSet must be persisted")
    // distinct filters get distinct entries
    assert(!(idx.cachedFilterDocs(FqTerms(Seq("public"))) eq first))
  }

  test("term-filter fq equals the boolean AND semantics on the match set") {
    val viaFq = idx.topKWithFilter(Seq("public"), 100000, FqTerms(Seq("import")))
      .collect().map(_.getLong(0)).toSet
    val viaAnd = idx.topK(Seq("public", "import"), 100000, QueryEngine.And)
      .collect().map(_.getLong(0)).toSet
    assert(viaFq == viaAnd && viaFq.nonEmpty)
  }

  // keep LAST: floods the shared index's cache past capacity
  test("filterCache is a bounded LRU; evicted DocSets are unpersisted") {
    val first = idx.cachedFilterDocs(FqDocValue("lang", "evict0"))
    (1 to IndexStore.FilterCacheSize + 5).foreach { i =>
      idx.cachedFilterDocs(FqDocValue("lang", s"evict$i"))
    }
    assert(idx.filterCacheEntries == IndexStore.FilterCacheSize)
    assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "evicted DocSet must be unpersisted")
    val recent = idx.cachedFilterDocs(FqDocValue("lang", s"evict${IndexStore.FilterCacheSize + 5}"))
    assert(recent.storageLevel.useMemory || recent.storageLevel.useDisk,
      "resident DocSet must stay persisted")
  }
}
