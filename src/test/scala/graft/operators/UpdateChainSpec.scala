package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Field-mutating update-processor chain: per-processor contracts (scalar
  * and multi-valued), schemaless parse all-or-nothing, version-constrained
  * upsert, expiration, and chain composition order. */
class UpdateChainSpec extends SparkSpec {
  import spark.implicits._
  import UpdateChain._

  test("value mutators apply to scalars and element-wise to arrays") {
    val df = Seq(
      (1L, "  padded  ", Seq(" a ", "", "b", "a ")),
      (2L, "", Seq("", " ")),
      (3L, null.asInstanceOf[String], null.asInstanceOf[Seq[String]])
    ).toDF("id", "s", "m")
    val trimmed = chain(trimField("s"), trimField("m"))(df)
      .orderBy("id").collect()
    assert(trimmed(0).getString(1) === "padded")
    assert(trimmed(0).getSeq[String](2) === Seq("a", "", "b", "a"))
    // removeBlank after trim: blanks (and emptied arrays) -> null
    val rb = chain(trimField("s"), trimField("m"),
      removeBlankField("s"), removeBlankField("m"))(df).orderBy("id").collect()
    assert(rb(0).getSeq[String](2) === Seq("a", "b", "a"))
    assert(rb(1).isNullAt(1) && rb(1).isNullAt(2))
    assert(rb(2).isNullAt(1) && rb(2).isNullAt(2))
    // uniq preserves first-occurrence order
    val uq = chain(trimField("m"), uniqFieldValues("m"))(df).orderBy("id").collect()
    assert(uq(0).getSeq[String](2) === Seq("a", "", "b"))
    // truncate and length
    val t = chain(truncateField("s", 3), fieldLength("m"))(df).orderBy("id").collect()
    assert(t(0).getString(1) === "  p")
    assert(t(0).getSeq[Int](2) === Seq(3, 0, 1, 2))
  }

  test("regexReplace quotes the replacement literally by default") {
    val df = Seq((1L, "cost: 5")).toDF("id", "s")
    val lit = regexReplace("s", "5", "$0x")(df).head.getString(1)
    assert(lit === "cost: $0x") // '$0' NOT treated as a group reference
    val grp = regexReplace("s", "(5)", "[$1]", literalReplacement = false)(df)
      .head.getString(1)
    assert(grp === "cost: [5]")
  }

  test("cloneField appends, first/last/min/max/concat/count work the values") {
    val df = Seq((1L, "x", Seq("m1", "m2"))).toDF("id", "s", "m")
    val c1 = cloneField("s", "m")(df).head.getSeq[String](2)
    assert(c1 === Seq("m1", "m2", "x")) // existing dest values first
    val c2 = cloneField("s", "fresh")(df).head.getSeq[String](3)
    assert(c2 === Seq("x"))
    val picked = chain(cloneField("s", "m"))(df)
    assert(firstFieldValue("m")(picked).head.getString(2) === "m1")
    assert(lastFieldValue("m")(picked).head.getString(2) === "x")
    assert(minFieldValue("m")(picked).head.getString(2) === "m1")
    assert(maxFieldValue("m")(picked).head.getString(2) === "x")
    assert(concatField("m")(picked).head.getString(2) === "m1; m2; x")
    assert(countFieldValues("m", "n")(picked).head.getAs[Int]("n") === 3)
  }

  test("parse processors mutate only when every value parses") {
    val good = Seq((1L, "41"), (2L, "7")).toDF("id", "v")
    val g = parseNumericField("v", "int")(good)
    assert(g.schema("v").dataType === org.apache.spark.sql.types.IntegerType)
    assert(g.orderBy("id").collect().map(_.getInt(1)).toSeq === Seq(41, 7))
    val mixed = Seq((1L, "41"), (2L, "seven")).toDF("id", "v")
    val m = parseNumericField("v", "int")(mixed)
    assert(m.schema("v").dataType === org.apache.spark.sql.types.StringType)
    // null values don't block mutation (absent field values in the ref)
    val withNull = Seq((1L, "41"), (2L, null.asInstanceOf[String])).toDF("id", "v")
    assert(parseNumericField("v", "long")(withNull).schema("v").dataType ===
      org.apache.spark.sql.types.LongType)
    // booleans with custom value sets, case-insensitive
    val b = Seq((1L, "ON"), (2L, "off")).toDF("id", "v")
    val pb = parseBooleanField("v", Set("on"), Set("off"))(b)
    assert(pb.orderBy("id").collect().map(_.getBoolean(1)).toSeq === Seq(true, false))
    val bad = Seq((1L, "on"), (2L, "maybe")).toDF("id", "v")
    assert(parseBooleanField("v", Set("on"), Set("off"))(bad)
      .schema("v").dataType === org.apache.spark.sql.types.StringType)
  }

  test("defaultValue, ignoreField, fieldNameMutating, ignoreLargeDocuments") {
    val df = Seq((1L, null.asInstanceOf[String], "aaaa"), (2L, "set", "aa"))
      .toDF("id", "opt", "feed_body")
    val d = defaultValue("opt", "dflt")(df).orderBy("id").collect()
    assert(d(0).getString(1) === "dflt" && d(1).getString(1) === "set")
    assert(defaultValue("brand_new", 9)(df).columns.contains("brand_new"))
    assert(!ignoreField("opt")(df).columns.contains("opt"))
    val renamed = fieldNameMutating("^feed_", "")(df)
    assert(renamed.columns.toSeq === Seq("id", "opt", "body"))
    assert(ignoreLargeDocuments("feed_body", 3)(df).collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("expiration: ttl stamps an absolute expiry; the reaper filters by NOW") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), java.lang.Long.valueOf(3600L)),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), null.asInstanceOf[java.lang.Long])
    ).toDF("id", "created", "ttl")
    val stamped = withExpiration("ttl", "created", "expires")(df)
    val e = stamped.orderBy("id").collect()
    assert(e(0).getTimestamp(3) === java.sql.Timestamp.valueOf("2024-01-01 01:00:00"))
    assert(e(1).isNullAt(3)) // no ttl -> never expires
    val after = reapExpired("expires",
      java.sql.Timestamp.valueOf("2024-01-01 02:00:00"))(stamped)
    assert(after.collect().map(_.getLong(0)).toSeq === Seq(2L))
    val before = reapExpired("expires",
      java.sql.Timestamp.valueOf("2024-01-01 00:30:00"))(stamped)
    assert(before.count() === 2)
  }

  test("skipExisting and version-constrained upsert") {
    val docs = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("id", "v", "version")
    val ups = Seq((2L, "b2", 6L), (2L, "b0", 5L), (3L, "c", 1L))
      .toDF("id", "v", "version")
    // skipExisting: only the brand-new id survives
    assert(skipExisting(ups, docs, "id").collect().map(_.getLong(0)).toSeq === Seq(3L))
    // versioned upsert: 6 beats 5; equal 5 loses; new id inserts
    val merged = versionConstrainedUpsert(docs, ups, "id", "version")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(merged.toSeq === Seq((1L, "a", 5L), (2L, "b2", 6L), (3L, "c", 1L)))
  }

  test("regexpBoost: full-match product with the reference's scaled arithmetic") {
    val df = Seq((1L, "http://www.example.com/"), (2L, "https://other.org"),
      (3L, null.asInstanceOf[String])).toDF("id", "url")
    val rules = Seq("https?://www\\..*" -> 2.0, ".*\\.com/?" -> 3.0)
    val out = regexpBoost("url", "boost", rules)(df).orderBy("id").collect()
    // doc 1 matches both rules: ((2*1000)*(1*1000))/1e6 = 2, then
    // ((3*1000)*(2*1000))/1e6 = 6
    assert(out(0).getDouble(2) === 6.0)
    assert(out(1).getDouble(2) === 1.0) // no rule fully matches
    assert(out(2).isNullAt(2))          // null input leaves boost absent
    // partial matches do NOT boost (matcher.matches, not find)
    val partial = regexpBoost("url", "boost", Seq("www" -> 9.0))(df)
      .orderBy("id").collect()
    assert(partial(0).getDouble(2) === 1.0)
  }

  test("realTimeGet applies pending updates to only the requested ids") {
    val docs = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "n")
    val pending = Seq(
      (1L, 1, "v", "set", "a2"),
      (2L, 1, "n", "inc", "5"),
      (3L, 1, "v", "set", "c2"))
      .toDF("id", "seq", "field", "op", "value")
    val got = AtomicUpdate.realTimeGet(docs, "id", pending, ids = Seq(1L, 2L),
        stringFields = Seq("v"), longFields = Seq("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, "a2", 10L), (2L, "b", 25L))) // 3 absent
  }

  test("timestamp stamps only missing values") {
    val now = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
    val df = Seq((1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")),
      (2L, null.asInstanceOf[java.sql.Timestamp])).toDF("id", "ts")
    val out = timestamp("ts", now)(df).orderBy("id").collect()
    assert(out(0).getTimestamp(1) === java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
    assert(out(1).getTimestamp(1) === now)
  }
}
