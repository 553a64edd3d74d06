package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import java.nio.file.{Files, Paths, Path}
import java.util.Comparator

/** Resumable segmented build: committed segments are never rebuilt; a
  * resumed build converges to the same index as a one-shot build. */
class ResumeSpec extends SparkSpec {

  private def rmTree(p: Path): Unit =
    if (Files.exists(p)) Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  test("build is segment-resumable and idempotent") {
    val dir = Files.createTempDirectory("graft-index").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 400, 5).toDF(), Seq("repo", "path", "commit"), 4).cache()

    IndexStore.build(spark, withIds, dir, numSegments = 4, shufflePartitions = 4)
    assert((0 until 4).forall(IndexStore.isCommitted(dir, _)))
    val idx = IndexStore.OpenIndex(spark, dir)
    val full = idx.topK(Seq("public", "import"), 20).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(full.nonEmpty)
    assert(idx.stats.docCount === 400L)

    // simulate a crash after 2 segments: wipe segments 2,3 and stats
    rmTree(Paths.get(s"$dir/segments/seg=2"))
    rmTree(Paths.get(s"$dir/segments/seg=3"))
    rmTree(Paths.get(s"$dir/stats"))
    val mtime0 = Files.getLastModifiedTime(Paths.get(s"$dir/segments/seg=0/MANIFEST.json"))

    IndexStore.build(spark, withIds, dir, numSegments = 4, shufflePartitions = 4)
    // committed segments untouched (manifest not rewritten)
    assert(Files.getLastModifiedTime(Paths.get(s"$dir/segments/seg=0/MANIFEST.json")) === mtime0)
    val resumed = IndexStore.OpenIndex(spark, dir)
    val again = resumed.topK(Seq("public", "import"), 20).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(again === full)

    // manifests carry lineage + metrics
    val manifests = IndexStore.readManifests(dir)
    assert(manifests.size === 4)
    assert(manifests.forall(m => m.contains("shaXor") && m.contains("docCount") && m.contains("appId")))
    rmTree(Paths.get(dir))
  }

  test("concurrent segment builds produce the same index as sequential") {
    val seqDir = Files.createTempDirectory("graft-seq").toString
    val conDir = Files.createTempDirectory("graft-con").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 300, 4).toDF(), Seq("repo", "path", "commit"), 4).cache()
    IndexStore.build(spark, withIds, seqDir, numSegments = 3, shufflePartitions = 4)
    IndexStore.build(spark, withIds, conDir, numSegments = 3, shufflePartitions = 4,
      segmentConcurrency = 3)
    val a = IndexStore.OpenIndex(spark, seqDir)
    val b = IndexStore.OpenIndex(spark, conDir)
    assert(a.stats === b.stats)
    val ra = a.topK(Seq("public", "import"), 25).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val rb = b.topK(Seq("public", "import"), 25).collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(ra === rb)
    rmTree(Paths.get(seqDir)); rmTree(Paths.get(conDir))
  }
}
