package graft.query

import graft.SparkSpec
import graft.functions.StrDist
import graft.index.IndexStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Solr function-query dialect (ValueSourceParser registry) — parser
  * shapes, reference arithmetic, augmentation joins, and the engine-stat
  * functions over a real built index. */
class FuncParserSpec extends SparkSpec {

  import FuncParser._

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, 10.0, "alpha", "2024-01-03T00:00:00", Some(5.0)),
      (2L, 20.0, "beta", "2024-01-05T00:00:00", None),
      (3L, 30.0, "alpha", "2024-01-09T00:00:00", Some(7.0)),
      (4L, 40.0, "gamma", "2024-01-01T00:00:00", Some(1.0))
    ).toDF("doc_id", "value", "tag", "ts_s", "opt")
      .withColumn("ts", col("ts_s").cast("timestamp"))
  }

  private def evalOne(src: String, env: Env = Env()): Map[Long, Any] = {
    val Compiled(aug, v) = FuncParser.compile(df, src, env)
    aug.select(col("doc_id"), v.as("v")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
  }

  private def d(src: String, id: Long, env: Env = Env()): Double =
    evalOne(src, env)(id).asInstanceOf[Number].doubleValue()

  // ------------------------------------------------------------- parsing

  test("parse shapes: nesting, strings, numbers, params") {
    assert(FuncParser.parse("sum(1,2)") == CallN("sum", List(NumN(1), NumN(2))))
    assert(FuncParser.parse("recip(ms(NOW,ts),3.16e-11,1,1)") ==
      CallN("recip", List(CallN("ms", List(WordN("NOW"), WordN("ts"))),
        NumN(3.16e-11), NumN(1), NumN(1))))
    assert(FuncParser.parse("strdist('abc',tag,edit)") ==
      CallN("strdist", List(StrN("abc"), WordN("tag"), WordN("edit"))))
    assert(FuncParser.parse("sum(value,$boost)", Map("boost" -> "product(2,3)")) ==
      CallN("sum", List(WordN("value"), CallN("product", List(NumN(2), NumN(3))))))
    intercept[IllegalArgumentException](FuncParser.parse("sum(1,2) trailing"))
    intercept[IllegalArgumentException](FuncParser.parse("sum(1,"))
    intercept[IllegalArgumentException](FuncParser.parse("sum(1,$nope)"))
  }

  test("unknown function names fail with a clear error") {
    val e = intercept[IllegalArgumentException](evalOne("nosuchfn(1)"))
    assert(e.getMessage.contains("unknown function"))
  }

  // ---------------------------------------------------------- arithmetic

  test("math battery matches JVM arithmetic") {
    assert(d("sum(value,1,2)", 1L) == 13.0)
    assert(d("sub(product(value,2),5)", 2L) == 35.0)
    assert(d("div(1,0)", 1L).isPosInfinity) // JVM float div, not NULL/ANSI
    assert(d("mod(7,4)", 1L) == 3.0)
    assert(d("log(100)", 1L) == 2.0)  // Solr log = base 10
    assert(math.abs(d("ln(e)", 1L) - 1.0) < 1e-12)
    assert(d("pow(2,10)", 1L) == 1024.0)
    assert(d("hypot(3,4)", 1L) == 5.0)
    assert(d("max(value,25)", 1L) == 25.0 && d("max(value,25)", 3L) == 30.0)
    assert(d("min(value,25)", 1L) == 10.0 && d("min(value,25)", 3L) == 25.0)
    assert(d("rint(2.5)", 1L) == 2.0 && d("rint(3.5)", 1L) == 4.0) // HALF_EVEN like Math.rint
    assert(d("ceil(2.1)", 1L) == 3.0 && d("floor(2.9)", 1L) == 2.0)
    assert(math.abs(d("deg(pi)", 1L) - 180.0) < 1e-9)
    assert(math.abs(d("rad(180)", 1L) - math.Pi) < 1e-12)
  }

  test("map: in-range to target, else identity or explicit default") {
    // RangeMapFloatFunction: (val>=min && val<=max) ? target : (def == null ? val : def)
    val m = evalOne("map(value,15,35,0)")
    assert(m(1L).asInstanceOf[Number].doubleValue() == 10.0)
    assert(m(2L).asInstanceOf[Number].doubleValue() == 0.0)
    assert(m(3L).asInstanceOf[Number].doubleValue() == 0.0)
    val md = evalOne("map(value,15,35,0,-1)")
    assert(md(1L).asInstanceOf[Number].doubleValue() == -1.0)
    assert(md(2L).asInstanceOf[Number].doubleValue() == 0.0)
  }

  test("scale: global min/max bounds, degenerate range maps to target min") {
    // ScaleFloatFunction: (x - minV) * (max-min)/(maxV-minV) + min
    assert(d("scale(value,0,1)", 1L) == 0.0)
    assert(d("scale(value,0,1)", 4L) == 1.0)
    assert(math.abs(d("scale(value,0,1)", 2L) - 1.0 / 3) < 1e-12)
    assert(d("scale(sub(value,value),5,9)", 2L) == 5.0) // maxV==minV -> scale 0 -> min
  }

  test("recip and linear formulas") {
    // ReciprocalFloatFunction: a/(m*x+b)
    assert(d("recip(value,2,100,5)", 1L) == 100.0 / 25.0)
    assert(d("linear(value,2,3)", 3L) == 63.0)
  }

  // --------------------------------------------------------------- dates

  test("ms variants: dd constant, vd, dv, vv (reference DateValueSourceParser)") {
    val env = Env(now = to_timestamp(lit("2024-01-10T00:00:00")))
    val day = 86400000.0
    assert(d("ms(2024-01-02T00:00:00Z,2024-01-01T00:00:00Z)", 1L, env) == day)
    assert(d("ms(ts,2024-01-01T00:00:00Z)", 3L, env) == 8 * day)     // vd
    assert(d("ms(2024-01-09T00:00:00Z,ts)", 1L, env) == 6 * day)     // dv
    assert(d("ms(ts,ts)", 2L, env) == 0.0)                           // vv
    assert(d("ms(NOW,ts)", 3L, env) == day)                          // NOW anchor
    assert(d("ms(NOW/DAY,ts)", 3L, env) == day)                      // date math rounds
    assert(d("ms()", 1L, env) == 1704844800000.0)                    // NOW millis
  }

  // ------------------------------------------------------------- strings

  test("strdist edit = 1 - levenshtein/maxlen (LevenshteinDistance.java:106)") {
    assert(math.abs(d("strdist('kitten','sitting',edit)", 1L) - (1.0 - 3.0 / 7)) < 1e-12)
    assert(d("strdist(tag,tag,edit)", 1L) == 1.0)
  }

  test("strdist jw matches the reference kernel and threshold gate") {
    // classic Winkler pairs (values from JaroWinklerDistance arithmetic)
    assert(math.abs(d("strdist('martha','marhta',jw)", 1L) -
      StrDist.jaroWinkler("martha", "marhta")) < 1e-12)
    assert(math.abs(StrDist.jaroWinkler("martha", "marhta") - 0.9611111f) < 1e-6)
    assert(math.abs(StrDist.jaroWinkler("dwayne", "duane") - 0.84f) < 1e-6)
    assert(StrDist.jaroWinkler("fly", "ant") == 0f)
    // below the 0.7 threshold the common-prefix bonus must NOT apply:
    // jaro("abcdef","abzzzz") has prefix 2 but j < 0.7 stays unboosted
    val j = StrDist.jaroWinkler("abcdxy", "abzzzz")
    assert(j < 0.7f)
  }

  test("strdist ngram matches a brute n-gram DP on pinned pairs") {
    // golden values computed by the reference algorithm's arithmetic
    assert(StrDist.ngram("abc", "abc", 2) == 1.0f)
    assert(StrDist.ngram("ab", "ab", 3) == 1.0f)   // short-string positional path
    assert(StrDist.ngram("ab", "ba", 3) == 0.0f)
    assert(StrDist.ngram("", "", 2) == 1.0f)
    assert(StrDist.ngram("", "x", 2) == 0.0f)
    val v = d("strdist('spark','sprak',ngram,2)", 1L)
    assert(math.abs(v - StrDist.ngram("spark", "sprak", 2)) < 1e-12)
    assert(v > 0.5 && v < 1.0)
  }

  // ----------------------------------------------------------------- geo

  test("geodist returns km; hsin with convert agrees on Earth's radius") {
    // Berlin (52.52, 13.405) -> Paris (48.8566, 2.3522): ~877-878 km
    val km = d("geodist(52.52,13.405,48.8566,2.3522)", 1L)
    assert(km > 870 && km < 885)
    val viaHsin = d("hsin(6371.0088,true,52.52,13.405,48.8566,2.3522)", 1L)
    assert(math.abs(km - viaHsin) < 1.0)
  }

  test("dist: power 0/1/2/generic and sqedist (VectorDistanceFunction.java:149-180)") {
    assert(d("dist(1,1,2,3,4,5,6)", 1L) == 9.0)          // Manhattan |1-4|+|2-5|+|3-6|
    assert(d("dist(2,1,2,3,4,5,6)", 1L) == math.sqrt(27.0))
    assert(d("dist(0,1,2,3,4,2,6)", 1L) == 2.0)          // count of differing dims
    assert(math.abs(d("dist(3,4,5,6,1,2,3)", 1L) - math.pow(81.0, 1.0 / 3)) < 1e-12)
    // reference keeps the signed Math.pow: negative diffs at fractional
    // powers yield NaN there too, so we don't abs() either
    assert(d("sqedist(1,2,3,4,5,6)", 1L) == 27.0)
  }

  // ------------------------------------------------------- bool/missing

  test("exists/def/if/not/and/or/xor and comparisons") {
    val ex = evalOne("if(exists(opt),linear(opt,1,0),-1)")
    assert(ex(1L).asInstanceOf[Number].doubleValue() == 5.0)
    assert(ex(2L).asInstanceOf[Number].doubleValue() == -1.0)
    val de = evalOne("def(opt,99)")
    assert(de(2L).asInstanceOf[Number].doubleValue() == 99.0)
    assert(evalOne("gt(value,15)")(1L) == false)
    assert(evalOne("gt(value,15)")(2L) == true)
    assert(evalOne("xor(gt(value,15),lt(value,35))")(2L) == false)
    assert(evalOne("xor(gt(value,15),lt(value,35))")(1L) == true)
    assert(evalOne("not(eq(tag,'alpha'))")(1L) == false)
    assert(evalOne("and(gt(value,15),lt(value,35))")(3L) == true)
    assert(evalOne("or(gt(value,35),lt(value,15))")(2L) == false)
  }

  // ---------------------------------------------------------------- ords

  test("ord: 0-based value-order ordinal, -1 missing; rord mirrors") {
    import spark.implicits._
    val withNull = Seq((1L, Some("b")), (2L, None), (3L, Some("a")), (4L, Some("b")))
      .toDF("doc_id", "tag2")
    val Compiled(aug, v) = FuncParser.compile(withNull, "ord(tag2)")
    val m = aug.select(col("doc_id"), v.as("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 1L, 2L -> -1L, 3L -> 0L, 4L -> 1L))
    val Compiled(aug2, v2) = FuncParser.compile(withNull, "rord(tag2)")
    val m2 = aug2.select(col("doc_id"), v2.as("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ReverseOrdFieldSource: end - ord - 1; missing -> end (=2 distinct values)
    assert(m2 == Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  // --------------------------------------------------------- index stats

  private lazy val idxEnv: Env = {
    import spark.implicits._
    val corpus = Seq(
      (0L, "spark query engine"),
      (1L, "spark spark runtime"),
      (2L, "query planner"),
      (3L, "storage layer")
    ).toDF("docId", "content")
    val dir = Files.createTempDirectory("graft-funcidx").toString
    IndexStore.build(spark, corpus, dir, numSegments = 1, shufflePartitions = 2)
    Env(index = Some(IndexStore.OpenIndex(spark, dir)))
  }

  /** Frame sharing the index's docId space (dense [0,4)). */
  private lazy val idxDf = {
    import spark.implicits._
    Seq(0L, 1L, 2L, 3L).toDF("doc_id")
  }

  private def di(src: String, id: Long): Double = {
    val Compiled(aug, v) = FuncParser.compile(idxDf, src, idxEnv)
    aug.select(col("doc_id"), v.cast("double").as("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap.apply(id)
  }

  test("termfreq/tf/docfreq/idf/ttf/sttf/maxdoc/numdocs from the engine") {
    assert(di("termfreq(content,'spark')", 1L) == 2.0)
    assert(di("termfreq(content,'spark')", 2L) == 0.0)
    assert(di("tf(content,'spark')", 1L) == math.sqrt(2.0))
    assert(di("docfreq(content,'spark')", 0L) == 2.0)
    assert(di("docfreq(content,'nosuch')", 0L) == 0.0)
    // ClassicSimilarity idf = ln((N+1)/(df+1)) + 1
    assert(math.abs(di("idf(content,'query')", 0L) -
      (math.log(5.0 / 3.0) + 1.0)) < 1e-12)
    assert(di("ttf(content,'spark')", 0L) == 3.0)
    assert(di("sttf(content)", 0L) == 10.0) // 3+3+2+2 tokens
    assert(di("maxdoc()", 0L) == 4.0)
    assert(di("numdocs()", 0L) == 4.0)
  }

  test("norm() decodes the scorer's own SmallFloat byte") {
    // 3-token docs quantize to 3 under int4 (exact below 16)
    assert(di("norm(content)", 0L) == 3.0 && di("norm(content)", 1L) == 3.0)
    assert(di("norm(content)", 2L) == 2.0 && di("norm(content)", 3L) == 2.0)
  }

  // ---------------------------------------------------------- query(...)

  test("query(...) joins sub-query scores with a default for non-matches") {
    import spark.implicits._
    val scores = Seq((1L, 2.5), (3L, 1.5)).toDF("doc_id", "score")
    val env = Env(scorer = Some(_ => scores))
    val m = evalOne("sum(query('anything',0.1),value)", env)
    assert(m(1L).asInstanceOf[Number].doubleValue() == 12.5)
    assert(m(2L).asInstanceOf[Number].doubleValue() == 20.1)
    intercept[IllegalArgumentException](evalOne("query('x')")) // no scorer
  }

  test("payload(): per-doc fold with default; first takes earliest position") {
    import spark.implicits._
    val pdocs = Seq((1L, "x|4 y|9 x|2"), (2L, "y|1"), (3L, "x")).toDF("doc_id", "text")
    val pt = graft.operators.TextOps.payloadTable(pdocs, "doc_id", "text")
    val env = Env(payloads = Some(pt))
    def run(src: String): Map[Long, Double] = {
      val Compiled(aug, v) = FuncParser.compile(pdocs, src, env)
      aug.select(col("doc_id"), v.cast("double").as("v")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(run("payload(text,'x',0.5,average)") == Map(1L -> 3.0, 2L -> 0.5, 3L -> 0.5))
    assert(run("payload(text,'x',0.5,min)") == Map(1L -> 2.0, 2L -> 0.5, 3L -> 0.5))
    assert(run("payload(text,'x',0.5,first)") == Map(1L -> 4.0, 2L -> 0.5, 3L -> 0.5))
    assert(run("payload(text,'x')") == Map(1L -> 3.0, 2L -> 0.0, 3L -> 0.0))
    intercept[IllegalArgumentException](run("payload(text,'x',0,median)"))
  }

  // --------------------------------------------------------- entrypoints

  test("topK ranks all docs by value desc with docId tiebreak") {
    val top = FuncParser.topK(df, "recip(value,1,100,0)", 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(top.toSeq == Seq((1L, 10.0), (2L, 5.0)))
  }

  test("frange keeps values inside the bounds with incl/excl edges") {
    val ids = FuncParser.frange(df, "value", Some(20.0), Some(40.0))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(2L, 3L, 4L))
    val excl = FuncParser.frange(df, "value", Some(20.0), Some(40.0),
      incl = false, incu = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(excl.toSeq == Seq(3L))
  }
}
