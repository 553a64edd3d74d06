package graft.corpus

import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the Iceberg-shaped source-code corpus (input_hint schema). */
final case class SourceFile(repo: String, path: String, commit: String, lang: String, content: String)

/**
 * Deterministic synthetic source-code corpus (FIXTURES.md §1): content is a
 * pure function of the row index (seeded splitmix64), so the table is
 * identical at any partitioning/parallelism — required for reproducible
 * docIds and rank-identical tie-breaks across local[8]/local[32].
 *
 * Content mixes: (a) Zipf-ish keyword pool (stop-word-like skew for the
 * shuffle/skew tests), (b) mid-frequency identifiers, (c) long-tail unique
 * identifiers `uniq_<i>_<k>` so every doc has discriminative terms,
 * (d) numeric literals, (e) occasional tokens > 255 chars (must be chopped
 * by the analyzer), (f) mixed case to exercise lowercasing.
 */
object CorpusGen {
  val Seed = 42L

  private val keywords = Array(
    "public", "import", "def", "class", "return", "val", "var", "if", "else",
    "for", "while", "new", "static", "void", "int", "string", "match", "case",
    "object", "extends", "override", "private", "final", "try", "catch")

  private val midIdents = Array(
    "parseConfig", "handler", "buildIndex", "queryEngine", "tokenStream",
    "mergePolicy", "flushBuffer", "scoreDocs", "readBlock", "writeShard",
    "checkpoint", "manifest", "rowCount", "shaDigest", "postings", "normValue")

  private val langs = Array("java", "scala", "py", "c", "md")

  /** splitmix64 step. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  final class Rng(seed: Long) {
    private var s = seed
    def nextLong(): Long = { s = mix(s); s }
    def nextInt(bound: Int): Int = (Math.floorMod(nextLong(), bound.toLong)).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
  }

  /** Zipf-ish pick: rank r with prob ~ 1/(r+1). */
  private def zipfPick(rng: Rng, n: Int): Int = {
    val h = math.log(n + 1.0)
    math.min(n - 1, (math.exp(rng.nextDouble() * h) - 1.0).toInt)
  }

  private def hex40(id: Long): String = {
    val a = mix(id ^ 0xc0ffee); val b = mix(a); val c = (mix(b) & 0xFFFFFFFFL)
    f"$a%016x$b%016x$c%08x"
  }

  /** Pure function of the row index -> one source file. `sizeScale`
    * multiplies the token budget (1 = test default; Bench uses larger
    * files, realistic for source corpora, to weight analysis CPU). */
  def genFile(i: Long, sizeScale: Int = 1): SourceFile = {
    val rng = new Rng(mix(Seed ^ i))
    val repo = f"org${i % 37}%04d/repo${(i / 37) % 101}%04d"
    val path = s"src/main/pkg${i % 13}/File${i % 997}.${langs((i % 5).toInt)}"
    val commit = hex40(i)
    // 3 size classes: ~0.5KB, ~5KB, ~50KB of tokens
    val sizeClass = sizeScale * ((i % 10) match { case 0 | 1 | 2 | 3 | 4 | 5 => 80; case 6 | 7 | 8 => 800; case _ => 8000 })
    val nTokens = sizeClass + rng.nextInt(sizeClass / 2 + 1)
    val sb = new java.lang.StringBuilder(nTokens * 8)
    var t = 0
    while (t < nTokens) {
      val r = rng.nextInt(100)
      val tok =
        if (r < 55) keywords(zipfPick(rng, keywords.length))
        else if (r < 75) midIdents(rng.nextInt(midIdents.length)) + (if (rng.nextInt(4) == 0) rng.nextInt(16).toString else "")
        else if (r < 85) rng.nextInt(100000).toString
        else if (r < 95) s"uniq_${i}_${rng.nextInt(8)}"
        else if (r < 98) { val w = midIdents(rng.nextInt(midIdents.length)); if (rng.nextInt(2) == 0) w.toUpperCase else w.capitalize }
        else "x" * (260 + rng.nextInt(20)) // must be chopped at 255 by the analyzer
      sb.append(tok)
      sb.append(if (rng.nextInt(12) == 0) "\n" else " ")
      t += 1
    }
    SourceFile(repo, path, commit, langs((i % 5).toInt), sb.toString)
  }

  /** Distributed generation: `spark.range` -> pure map. */
  def corpus(spark: SparkSession, numDocs: Long, partitions: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0L, numDocs, 1L, partitions).map(i => genFile(i))
  }

  /** Corpus with deterministic dense docIds (= row index): content is a pure
    * function of i, so ids are identical at ANY partitioning/parallelism —
    * the invariant rank-identity across local[8]/local[32] depends on. */
  def corpusWithIds(spark: SparkSession, numDocs: Long, partitions: Int = 32,
                    sizeScale: Int = 1): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.range(0L, numDocs, 1L, partitions)
      .map { i => val f = genFile(i, sizeScale); (i, f.repo, f.path, f.commit, f.lang, f.content) }
      .toDF("docId", "repo", "path", "commit", "lang", "content")
  }
}
