package graft.index

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.corpus.CorpusGen

/** lucene/replicator semantics: replicas converge to the source commit
  * point, only missing files travel, and queries on the replica are
  * bit-identical to the source. */
class ReplicatorSpec extends SparkSpec {

  private lazy val src: String = {
    val d = Files.createTempDirectory("graft-repl-src").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 300, 5).toDF(),
      Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, d, numSegments = 3, shufflePartitions = 4)
    d
  }

  private def topDocs(dir: String): Seq[(Long, Float)] =
    IndexStore.OpenIndex(spark, dir).topK(Seq("public", "static"), 10)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq

  test("fresh replica converges: same version, bit-identical queries") {
    val dst = Files.createTempDirectory("graft-repl-dst1").toString
    val r = Replicator.replicate(src, dst)
    assert(r.version == Replicator.version(src))
    assert(r.copied > 0 && r.removedSegments == 0)
    assert(topDocs(dst) == topDocs(src))
    // second pass is a no-op: everything skips, nothing copies
    val r2 = Replicator.replicate(src, dst)
    assert(r2.copied == 0, r2.toJson)
    assert(r2.skipped >= r.copied, r2.toJson)
  }

  test("incremental pass ships only the delta (requiredFiles semantics)") {
    val srcDelta = Files.createTempDirectory("graft-repl-src2").toString
    graft.util.Fs.copyTree(Paths.get(src), Paths.get(srcDelta))
    val dst = Files.createTempDirectory("graft-repl-dst2").toString
    val r1 = Replicator.replicate(srcDelta, dst)

    // mutate the source: tombstones (deletes/) — an append-only sidecar
    val victims = topDocs(srcDelta).take(2).map(_._1)
    IndexStore.delete(spark, srcDelta, victims)
    assert(Replicator.version(srcDelta) == Replicator.version(dst),
      "tombstones do not move the commit-point version")

    val r2 = Replicator.replicate(srcDelta, dst)
    assert(r2.copied > 0 && r2.copied < r1.copied / 4,
      s"delta pass should ship only the tombstone files: ${r2.toJson} vs ${r1.toJson}")
    assert(topDocs(dst) == topDocs(srcDelta))
    assert(!topDocs(dst).exists(h => victims.contains(h._1)))
  }

  test("a torn copy is invisible and a re-run converges (crash safety)") {
    val dst = Files.createTempDirectory("graft-repl-dst3").toString
    Replicator.replicate(src, dst)
    // simulate a crash mid-copy of a future file: a temp artifact + a
    // missing committed file
    val seg0 = Files.list(Paths.get(dst, "segments")).iterator().next()
    val postings = Files.list(seg0.resolve("postings")).iterator()
    var victim: java.nio.file.Path = null
    while (postings.hasNext) {
      val p = postings.next()
      if (p.getFileName.toString.endsWith(".parquet")) victim = p
    }
    Files.copy(victim, victim.getParent.resolve("." + victim.getFileName + ".repl"))
    Files.delete(victim)
    // manifest also gone => the half-replicated segment is uncommitted
    Files.delete(seg0.resolve("MANIFEST.json"))
    val r = Replicator.replicate(src, dst)
    assert(r.copied >= 2, r.toJson) // the deleted parquet + the manifest
    assert(topDocs(dst) == topDocs(src))
    // the torn temp artifact never shows up as data
    val leftover = Files.list(victim.getParent).iterator()
    var tmpCount = 0
    while (leftover.hasNext) {
      val n = leftover.next().getFileName.toString
      if (n.endsWith(".repl")) tmpCount += 1
    }
    assert(tmpCount == 0, "temp artifacts are consumed by the re-run")
  }

  test("compacted source: stale replica segments are dropped, queries follow") {
    val srcC = Files.createTempDirectory("graft-repl-src4").toString
    graft.util.Fs.copyTree(Paths.get(src), Paths.get(srcC))
    val dst = Files.createTempDirectory("graft-repl-dst4").toString
    Replicator.replicate(srcC, dst)
    assert(IndexStore.committedSegmentDirs(dst).size == 3)

    // compact the source into one segment (different file set, re-used dir)
    val out = Files.createTempDirectory("graft-repl-src4c").toString
    IndexStore.compact(spark, srcC, out, shufflePartitions = 4)
    val r = Replicator.replicate(out, dst)
    assert(IndexStore.committedSegmentDirs(dst).size ==
      IndexStore.committedSegmentDirs(out).size, r.toJson)
    assert(r.removedSegments > 0 || r.removedFiles > 0, r.toJson)
    assert(topDocs(dst) == topDocs(out))
    assert(Replicator.version(dst) == Replicator.version(out))
  }
}
