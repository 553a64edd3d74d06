package graft.sources

import graft.SparkSpec
import graft.index.IndexStore
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}

/** DataImportHandler contract: full/delta imports keyed by uniqueKey,
  * last_index_time checkpoint, delete-wins-over-update, fresh internal
  * docIds per update (Lucene updateDocument model). */
class DataImportSpec extends SparkSpec {

  private def src(rows: (String, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("pk", "content", "mtime")
  }

  private def matchPks(dir: String, term: String): Set[String] =
    IndexStore.OpenIndex(spark, dir).topK(Seq(term), 1000)
      .join(DataImport.pkMap(spark, dir), "docId")
      .select("pk").collect().map(_.getString(0)).toSet

  test("full-import builds, checkpoints, and clean=true replaces") {
    val dir = Files.createTempDirectory("graft-dih").toString
    val s1 = DataImport.fullImport(spark,
      src(("a", "alpha beta", "t"), ("b", "alpha gamma", "t")),
      "pk", "content", dir, "2024-01-01T00:00:00", shufflePartitions = 2)
    assert(s1.imported == 2 && DataImport.lastIndexTime(dir).contains("2024-01-01T00:00:00"))
    assert(matchPks(dir, "alpha") == Set("a", "b"))
    // clean replace: new corpus entirely supersedes
    DataImport.fullImport(spark, src(("a", "delta only", "t")),
      "pk", "content", dir, "2024-01-02T00:00:00", shufflePartitions = 2)
    assert(matchPks(dir, "alpha").isEmpty && matchPks(dir, "delta") == Set("a"))
  }

  test("delta-import: only newer-than-checkpoint rows re-index; deletes win") {
    val dir = Files.createTempDirectory("graft-dih2").toString
    DataImport.fullImport(spark,
      src(("a", "alpha beta", "t"), ("b", "alpha gamma", "t"), ("c", "alpha zeta", "t")),
      "pk", "content", dir, "2024-01-10T00:00:00", shufflePartitions = 2)
    // later source state: a modified, b untouched (stale stamp),
    // c modified AND deleted, d brand new
    val s2 = DataImport.deltaImport(spark, src(
        ("a", "alpha CHANGED", "2024-01-11T00:00:00"),
        ("b", "alpha gamma SHOULDNOTIMPORT", "2024-01-09T00:00:00"),
        ("c", "alpha zeta CHANGED", "2024-01-12T00:00:00"),
        ("d", "alpha fresh", "2024-01-12T00:00:00")),
      "pk", "content", "mtime", dir, "2024-01-13T00:00:00",
      deletedPks = Seq("c"), shufflePartitions = 2)
    assert(s2.imported == 2 && s2.deleted == 1) // a and d; c excluded from upsert
    assert(matchPks(dir, "changed") == Set("a"))       // delete NOT re-created
    assert(matchPks(dir, "fresh") == Set("d"))         // new doc arrived
    assert(matchPks(dir, "shouldnotimport").isEmpty)   // stale stamp skipped
    assert(matchPks(dir, "gamma") == Set("b"))         // untouched doc intact
    assert(matchPks(dir, "zeta").isEmpty)              // deleted doc gone
    assert(matchPks(dir, "beta").isEmpty)              // a's OLD version unsearchable
    assert(DataImport.lastIndexTime(dir).contains("2024-01-13T00:00:00"))
  }

  test("no checkpoint file means epoch: every row is a delta; ids never reuse") {
    val dir = Files.createTempDirectory("graft-dih3").toString
    DataImport.fullImport(spark, src(("a", "seed doc", "t")),
      "pk", "content", dir, "2024-01-01T00:00:00", shufflePartitions = 2)
    Files.delete(Paths.get(s"$dir/dataimport.json")) // legacy/lost props
    val s = DataImport.deltaImport(spark,
      src(("a", "seed doc updated", "2001-01-01T00:00:00")),
      "pk", "content", "mtime", dir, "2024-02-01T00:00:00",
      shufflePartitions = 2)
    assert(s.imported == 1)
    assert(matchPks(dir, "updated") == Set("a"))
    // the pkmap high-water mark prevented internal id reuse
    val ids = DataImport.pkMap(spark, dir).select("docId")
      .collect().map(_.getLong(0))
    assert(ids.forall(_ >= 1L))
  }

  test("consecutive deltas advance the checkpoint monotonically") {
    val dir = Files.createTempDirectory("graft-dih4").toString
    DataImport.fullImport(spark, src(("a", "one", "t")),
      "pk", "content", dir, "2024-01-01T00:00:00", shufflePartitions = 2)
    DataImport.deltaImport(spark, src(("a", "two", "2024-01-05T00:00:00")),
      "pk", "content", "mtime", dir, "2024-01-06T00:00:00", shufflePartitions = 2)
    // same stamp is NOT newer than the new checkpoint: no-op
    val s = DataImport.deltaImport(spark, src(("a", "three", "2024-01-05T00:00:00")),
      "pk", "content", "mtime", dir, "2024-01-07T00:00:00", shufflePartitions = 2)
    assert(s.imported == 0)
    assert(matchPks(dir, "two") == Set("a") && matchPks(dir, "three").isEmpty)
  }
}
