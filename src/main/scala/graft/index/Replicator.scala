package graft.index

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Index replication (reference lucene/replicator):
  *
  *   - `Revision.java` / `IndexRevision.java:1` — a revision is the file set
  *     of a commit point; files are immutable once written, so identity by
  *     (relative) name is sound.
  *   - `ReplicationClient.java:294` (`requiredFiles`) — "only files that do
  *     not exist in the handler's current revision files are copied".
  *   - `IndexReplicationHandler.java` — the handler copies into the live
  *     directory, syncs, publishes the new commit, then cleans up files of
  *     older commit points.
  *
  * Mapping onto this store's layout (IndexStore.scala:17): the commit point
  * of a segment IS its MANIFEST.json, written last. Replication therefore:
  *
  *   1. copies missing data files of every committed source segment,
  *   2. commits each new segment at the destination by writing MANIFEST.json
  *      LAST (readers at the destination never see a half-copied segment),
  *   3. mirrors the sidecar dirs (stats / deletes / dvpatch) — copy missing
  *      names, drop names gone from the source, so overwrite-style rewrites
  *      (stats/termstats) never leave mixed generations,
  *   4. removes destination segments that no longer exist at the source
  *      (post-compaction cleanup), MANIFEST FIRST so the segment is
  *      uncommitted before its data disappears.
  *
  * Re-running after a crash at any point converges: every step is
  * idempotent and ordered commit-last / uncommit-first. Driver-side file
  * ops like [[IndexStore.snapshot]]; on a real cluster the same walk runs
  * against the object store's list/copy API.
  */
object Replicator {

  final case class Report(version: String, copied: Int, skipped: Int,
                          removedSegments: Int, removedFiles: Int) {
    def toJson: String =
      s"""{"version":"$version","copied":$copied,"skipped":$skipped,""" +
        s""""removedSegments":$removedSegments,"removedFiles":$removedFiles}"""
  }

  /** Relative paths of all regular files under `root/sub`, empty if absent. */
  private def filesUnder(root: Path, sub: String): Seq[String] = {
    val base = root.resolve(sub)
    if (!Files.exists(base)) Nil
    else {
      val s = Files.walk(base)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => root.relativize(p).toString).toList
      finally s.close()
    }
  }

  private def segName(segDir: String): String =
    Paths.get(segDir).getFileName.toString

  /** Revision version: order-independent digest of the committed manifests
    * (IndexRevision versions by commit generation; manifests carry the
    * content hash, so equal version <=> equal committed file set). */
  def version(dir: String): String = {
    val manifests = IndexStore.committedSegmentDirs(dir).sorted.map { seg =>
      new String(Files.readAllBytes(Paths.get(seg, "MANIFEST.json")), "UTF-8")
    }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    manifests.foreach(m => md.update(m.getBytes("UTF-8")))
    md.digest().take(8).map(b => f"$b%02x").mkString
  }

  private def copyFile(src: Path, dst: Path): Unit = {
    Files.createDirectories(dst.getParent)
    // copy to a dotted temp name then ATOMIC_MOVE: a torn copy is never
    // visible under its real name, so name-presence == fully copied
    val tmp = dst.getParent.resolve("." + dst.getFileName.toString + ".repl")
    Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** One replication pass src -> dst. Safe to re-run at any time. */
  def replicate(srcDir: String, dstDir: String): Report = {
    val src = Paths.get(srcDir)
    val dst = Paths.get(dstDir)
    Files.createDirectories(dst)
    var copied = 0; var skipped = 0; var removedFiles = 0

    // -- 1+2: committed segments, data first, manifest last. A segment
    // name can be re-used with NEW content (a compacted source re-emitting
    // seg=0): the manifests then differ, so the destination copy is
    // uncommitted FIRST, its data dir mirrored (part-file names are
    // generation-unique — stale names are dropped, never mixed in), and the
    // new manifest written last.
    val srcSegs = IndexStore.committedSegmentDirs(srcDir).map(segName).toSet
    srcSegs.toSeq.sorted.foreach { name =>
      val mSrc = src.resolve(s"segments/$name/MANIFEST.json")
      val mDst = dst.resolve(s"segments/$name/MANIFEST.json")
      val mBytes = Files.readAllBytes(mSrc)
      val manifestMatches =
        Files.exists(mDst) && java.util.Arrays.equals(Files.readAllBytes(mDst), mBytes)
      if (!manifestMatches && Files.exists(mDst)) Files.delete(mDst)
      val srcRels = filesUnder(src, s"segments/$name")
        .filterNot(_.endsWith("MANIFEST.json")).toSet
      val dstRels = filesUnder(dst, s"segments/$name")
        .filterNot(_.endsWith("MANIFEST.json")).toSet
      (srcRels -- dstRels).toSeq.sorted.foreach { rel =>
        copyFile(src.resolve(rel), dst.resolve(rel)); copied += 1
      }
      skipped += (srcRels & dstRels).size
      (dstRels -- srcRels).toSeq.sorted.foreach { rel =>
        Files.deleteIfExists(dst.resolve(rel)); removedFiles += 1
      }
      if (!manifestMatches) { copyFile(mSrc, mDst); copied += 1 }
      else skipped += 1
    }

    // -- 3: mirror sidecars (name-diff both directions)
    Seq("stats", "deletes", "dvpatch", "dvsorted").foreach { sub =>
      val srcFiles = filesUnder(src, sub).toSet
      val dstFiles = filesUnder(dst, sub).toSet
      (srcFiles -- dstFiles).toSeq.sorted.foreach { rel =>
        copyFile(src.resolve(rel), dst.resolve(rel)); copied += 1
      }
      skipped += (srcFiles & dstFiles).size
      (dstFiles -- srcFiles).toSeq.sorted.foreach { rel =>
        Files.deleteIfExists(dst.resolve(rel)); removedFiles += 1
      }
    }

    // -- 4: stale destination segments (compacted away at the source):
    // uncommit first (manifest), then drop the data
    val staleSegs = IndexStore.committedSegmentDirs(dstDir).map(segName)
      .filterNot(srcSegs.contains)
    staleSegs.foreach { name =>
      Files.deleteIfExists(dst.resolve(s"segments/$name/MANIFEST.json"))
      graft.util.Fs.rmTree(dst.resolve(s"segments/$name").toString)
    }

    Report(version(dstDir), copied, skipped, staleSegs.size, removedFiles)
  }
}
