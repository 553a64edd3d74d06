package graft.analysis

import graft.SparkSpec
import graft.index.IndexStore
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** PreAnalyzedField ingestion: wire-format parsing (reference
  * JsonPreAnalyzedParser semantics), overlap/norm contracts, and
  * bit-identity of an externally-analyzed index with the locally-analyzed
  * build that produced the same stream. */
class PreAnalyzedSpec extends SparkSpec {
  import spark.implicits._
  import PreAnalyzed._

  test("parser: positions, auto offsets, overlaps, version check") {
    val p = parse(
      """{"v":"1","str":"Hello, World!","tokens":[
        |{"t":"hello","s":0,"e":5,"i":1},
        |{"t":"world","s":7,"e":12,"i":1},
        |{"t":"earth","i":0},
        |{"t":"end"}]}""".stripMargin)
    assert(p.str === Some("Hello, World!"))
    assert(p.tokens.map(_.term) === Vector("hello", "world", "earth", "end"))
    assert(p.tokens.map(_.pos) === Vector(0, 1, 1, 2)) // i=0 stacks
    // auto offsets: start = prev end + 1, end = start + len
    assert(p.tokens(2).start === 13 && p.tokens(2).end === 18)
    assert(p.tokens(3).start === 19 && p.tokens(3).end === 22)
    assert(p.dl === 3) // overlap token discounted
    intercept[IllegalArgumentException](parse("""{"v":"2","tokens":[]}"""))
    assert(parse("""{"v":"1"}""").tokens.isEmpty)
    // round trip through the serializer
    val rt = parse(toJson(p.str, p.tokens))
    assert(rt.tokens === p.tokens && rt.str === p.str)
  }

  test("pre-analyzed index is bit-identical to the chain-built index of the same stream") {
    val texts = (0L until 80L).map { i =>
      val words = Seq("spark", "query", "join", "data", "scan", "merge")
      (i, (0 until (5 + (i % 7)).toInt)
        .map(j => words(((i * 13 + j * 5) % words.size).toInt)).mkString(" "))
    }
    val rawDir = Files.createTempDirectory("graft-pre-raw").toString
    IndexStore.build(spark, texts.toDF("docId", "content"), rawDir,
      numSegments = 1, shufflePartitions = 2, withPositions = true)
    // externalize the SAME analysis as the wire format
    val preDocs = texts.map { case (id, text) =>
      val toks = Analyzer.analyze(text).map(t =>
        PreToken(t.term, t.pos, 0, 0, overlap = false))
      (id, toJson(Some(text), toks))
    }
    val preDir = Files.createTempDirectory("graft-pre-idx").toString
    IndexStore.build(spark, preDocs.toDF("docId", "content"), preDir,
      numSegments = 1, shufflePartitions = 2, withPositions = true,
      preAnalyzed = true)
    val a = IndexStore.OpenIndex(spark, rawDir)
    val b = IndexStore.OpenIndex(spark, preDir)
    val ha = a.topK(Seq("spark", "query"), 100)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val hb = b.topK(Seq("spark", "query"), 100)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(ha === hb) // scores bit-identical: same postings, same norms
    assert(ha.nonEmpty)
    val pa = a.phrase(Seq("spark", "query")).collect().map(_.getLong(0)).toSet
    val pb = b.phrase(Seq("spark", "query")).collect().map(_.getLong(0)).toSet
    assert(pa === pb)
  }

  test("overlap tokens post like synonyms: match but don't stretch the norm") {
    val doc = """{"v":"1","tokens":[
      |{"t":"fast","i":1},{"t":"quick","i":0},{"t":"sort","i":1}]}""".stripMargin
    val d = Files.createTempDirectory("graft-pre-syn").toString
    IndexStore.build(spark, Seq((0L, doc)).toDF("docId", "content"), d,
      numSegments = 1, shufflePartitions = 1, withPositions = true,
      preAnalyzed = true)
    val idx = IndexStore.OpenIndex(spark, d)
    // both the original and the stacked synonym match
    assert(idx.topK(Seq("quick"), 10).count() === 1)
    assert(idx.topK(Seq("fast"), 10).count() === 1)
    // dl = 2 (overlap discounted), like the SynonymFilter contract
    val ds = idx.docstats.select("dl").head.getInt(0)
    assert(ds === 2)
    // stacked position: phrase "quick sort" matches (same slot as fast)
    assert(idx.phrase(Seq("quick", "sort")).count() === 1)
    assert(idx.phrase(Seq("fast", "sort")).count() === 1)
    intercept[IllegalArgumentException] {
      IndexStore.build(spark, Seq((0L, doc)).toDF("docId", "content"),
        Files.createTempDirectory("graft-pre-off").toString,
        numSegments = 1, shufflePartitions = 1, withOffsets = true,
        preAnalyzed = true)
    }
  }
}
