package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Training-pipeline corpus-preparation operators: benchmark
 * decontamination, token-budget sequence packing, deterministic
 * stratified sampling (Pipeline.scala).
 */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "lang")

  test("decontaminate: flags exactly the docs sharing an n-gram with the eval set") {
    val docs = docsDf(Seq(
      (0L, "alpha beta gamma delta", "en"),      // shares "alpha beta gamma" with frag doc
      (1L, "zeta eta theta iota", "en"),          // clean
      (2L, "xx alpha beta gamma yy", "en"),       // shares mid-doc
      (4L, "alpha gamma beta", "en"),             // same tokens, wrong order -> clean
      (97L + 3, "alpha beta gamma kappa", "en"))) // the eval doc itself (id%97==3)
    val frags = Pipeline.benchmarkFragments(docs, "doc_id", "text", mod = 97, rem = 3, n = 3)
    assert(frags.as[String].collect().toSet === Set("alpha beta gamma"))
    val hit = Pipeline.decontaminate(docs.filter(col("doc_id") % 97 =!= 3), frags,
      "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hit === Map(0L -> 1L, 2L -> 1L))
  }

  test("packSequences: bins match a serial prefix-sum oracle at any partition count") {
    // token counts 1..40; budget 10 -> bins straddle partitions
    val docs = (0L until 40L).map(i => (i, Seq.fill(i.toInt % 7 + 1)("tok").mkString(" "), "en"))
    val df = docsDf(docs)
    val serial = {
      var cum = 0L
      docs.map { case (id, text, _) =>
        val nt = text.split(" ").length.toLong
        val bin = cum / 10
        cum += nt
        id -> bin
      }.toMap
    }
    for (parts <- Seq(1, 3, 8)) {
      val got = Pipeline.packSequences(spark, df, "doc_id", "text",
        budget = 10, partitions = parts)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === serial, s"parts=$parts")
    }
  }

  test("packSequences: every sequence except the last crosses its budget boundary") {
    val docs = docsDf((0L until 100L).map(i => (i, "a b c d e", "en")))
    val packed = Pipeline.packSequences(spark, docs, "doc_id", "text", budget = 17)
      .groupBy("seq_id").agg(sum("n_tokens").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    // chunked packing invariant: the cumulative token count at the END of
    // bin k reaches past the bin's upper boundary (k+1)*B — i.e. each
    // non-final bin is filled up to (and usually past) the boundary, and
    // bin ids are contiguous from 0
    assert(packed.map(_._1) === (0L until packed.size.toLong))
    var cum = 0L
    packed.dropRight(1).foreach { case (seq, toks) =>
      cum += toks
      assert(cum >= (seq + 1) * 17, s"seq=$seq cum=$cum")
    }
    assert(packed.map(_._2).sum === 500L)
  }

  test("duplicatedSpans: cross-doc windows flagged in every doc containing them") {
    val docs = docsDf(Seq(
      (0L, "aa bb cc dd ee", "en"),   // shares "aa bb cc" with doc 1
      (1L, "xx aa bb cc yy", "en"),
      (2L, "pp qq rr ss tt", "en"),   // fully unique
      (3L, "aa bb", "en")))           // too short for n=3 -> absent
    val got = Pipeline.duplicatedSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(0L) === ((3L, 1L))) // windows: aa-bb-cc*, bb-cc-dd, cc-dd-ee
    assert(got(1L) === ((3L, 1L)))
    assert(got(2L) === ((3L, 0L)))
    assert(!got.contains(3L))
  }

  test("repetitionStats: duplicate-shingle fraction; short docs guard to empty") {
    val docs = docsDf(Seq(
      (0L, "a b c a b c a b c", "en"),  // 7 shingles: abc bca cab ×2 + abc -> 4 distinct
      (1L, "x y z w", "en"),            // 2 shingles, all distinct
      (2L, "a b", "en"),                // shorter than n -> 0 shingles, ratio 0
      (3L, "", "en")))
    val got = Pipeline.repetitionStats(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L)._1 === 7L)
    assert(got(0L)._2 === 3L) // "a b c", "b c a", "c a b"
    assert(got(0L)._3 === math.rint((7.0 - 3.0) / 7.0 * 1e5) / 1e5)
    assert(got(1L) === ((2L, 2L, 0.0)))
    assert(got(2L) === ((0L, 0L, 0.0)))
    assert(got(3L) === ((0L, 0L, 0.0)))
  }

  test("redactPii: emails, IPv4s, and long digit runs become typed placeholders") {
    val docs = docsDf(Seq(
      (0L, "mail bob.smith+x@corp.example.org now", "en"),
      (1L, "srv 192.168.001.12 port", "en"),
      (2L, "acct 12345678 ok 123456 keep", "en"),   // 8 digits scrubbed, 6 kept
      (3L, "clean text stays", "en")))
    val got = Pipeline.redactPii(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(0L) === "mail <EMAIL> now")
    assert(got(1L) === "srv <IP> port")
    assert(got(2L) === "acct <NUM> ok 123456 keep")
    assert(got(3L) === "clean text stays")
  }

  test("stratifiedSample: deterministic, per-stratum rate within tolerance, no rand()") {
    val n = 20000
    val docs = (0L until n.toLong).map(i =>
      (i, "text", if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "zh"))
    val df = docsDf(docs)
    val rates = Map("en" -> 0.5, "fr" -> 0.25)
    val s1 = Pipeline.stratifiedSample(df, "doc_id", "lang", rates, 0.1)
      .groupBy("lang").agg(count("*").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s2 = Pipeline.stratifiedSample(df, "doc_id", "lang", rates, 0.1)
      .groupBy("lang").agg(count("*").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 === s2) // reproducible
    val per = n / 3.0
    assert(math.abs(s1("en") / per - 0.5) < 0.05, s"en=${s1("en")}")
    assert(math.abs(s1("fr") / per - 0.25) < 0.05, s"fr=${s1("fr")}")
    assert(math.abs(s1("zh") / per - 0.1) < 0.05, s"zh=${s1("zh")}")
  }
}
