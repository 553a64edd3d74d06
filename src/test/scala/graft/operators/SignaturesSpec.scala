package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Solr dedup signatures: MD5/Lookup3/TextProfile semantics vs independent
  * references — java.security MD5 for the digest, a brute-force JVM
  * re-implementation of the Nutch profile algorithm for randomized parity,
  * and lookup3ycs64 vectors computed by an independent (Python) port. */
class SignaturesSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Brute-force profile per TextProfileSignature.java:66-141 (canonical
    * count-desc, token-asc tie order). */
  private def bruteProfile(content: String, quantRate: Float = 0.01f,
                           minTokenLen: Int = 2): String = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flush(): Unit = {
      if (cur.length > minTokenLen) toks += cur.toString
      cur.setLength(0)
    }
    content.foreach { ch =>
      if (Character.isLetterOrDigit(ch)) cur.append(Character.toLowerCase(ch))
      else flush()
    }
    flush()
    if (toks.isEmpty) return ""
    val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
    val maxFreq = counts.values.max
    var quant = Math.round(maxFreq * quantRate)
    if (quant < 2) quant = if (maxFreq > 1) 2 else 1
    counts.toSeq
      .map { case (t, c) => (t, (c / quant) * quant) }
      .filter(_._2 >= quant)
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => s"$t $c" }
      .mkString("\n")
  }

  test("md5Signature: digest of name+values concat, null fields skipped") {
    val df = Seq((1L, "en", "src1"), (2L, null.asInstanceOf[String], "src2"))
      .toDF("id", "lang", "source")
    val out = df.select(col("id"), Signatures.md5Signature(
      Seq("lang" -> col("lang"), "source" -> col("source"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == md5Hex("langen" + "sourcesrc1"))
    assert(out(2L) == md5Hex("sourcesrc2")) // null lang: name skipped too
  }

  test("md5SignatureMixed: multi-valued fields contribute every value") {
    val df = Seq((1L, "en", Seq("a", "b"))).toDF("id", "lang", "tags")
    val sig = df.select(Signatures.md5SignatureMixed(Seq(
      ("lang", col("lang"), false), ("tags", col("tags"), true)))).head().getString(0)
    assert(sig == md5Hex("langen" + "tagsab"))
  }

  test("textProfile: quantization, short-token discard, order, ties") {
    // maxFreq 3 -> quant 2; 'aaa'x3 -> 2, 'bbb'x2 -> 2, 'ccc'x1 -> dropped,
    // 'ab' too short; count-desc then token-asc
    val df = Seq("aaa bbb aaa ccc ab aaa bbb").toDF("t")
    val p = df.select(Signatures.textProfile(col("t"))).head().getString(0)
    assert(p == "aaa 2\nbbb 2")
    // all-unique tokens: maxFreq 1 -> quant 1, everything kept, ties by token
    val p2 = Seq("zebra apple mango").toDF("t")
      .select(Signatures.textProfile(col("t"))).head().getString(0)
    assert(p2 == "apple 1\nmango 1\nzebra 1")
    // punctuation splits; case folds; empty content -> empty profile
    val p3 = Seq("Foo,foo;FOO!").toDF("t")
      .select(Signatures.textProfile(col("t"))).head().getString(0)
    assert(p3 == "foo 2")
    val p4 = Seq("a b c").toDF("t")
      .select(Signatures.textProfile(col("t"))).head().getString(0)
    assert(p4 == "")
  }

  test("textProfile: randomized parity with the brute-force reference") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("spark", "data", "the", "ml", "xy", "table", "scan",
      "merge", "row", "filter", "a", "key9", "join")
    val texts = (0 until 60).map { _ =>
      (0 until rnd.nextInt(40)).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(Seq(" ", ", ", "! ")(rnd.nextInt(3)))
    }
    val got = texts.toDF("t")
      .select(Signatures.textProfile(col("t"))).as[String].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g == bruteProfile(t), s"profile mismatch for: $t")
    }
  }

  test("textProfileSignature equals md5 of name-profile + value-profile") {
    val df = Seq((7L, "spark data spark data spark")).toDF("id", "text")
    val sig = df.select(Signatures.textProfileSignature(
      Seq("text" -> col("text")))).head().getString(0)
    assert(sig == md5Hex(bruteProfile("text") + bruteProfile("spark data spark data spark")))
  }

  test("lookup3ycs64: vectors from an independent port; surrogate pairing") {
    import Signatures.lookup3ycs64
    def hex(l: Long) = f"$l%016x"
    assert(hex(lookup3ycs64("", 0L)) == "deadbeefdeadbeef")
    assert(hex(lookup3ycs64("a", 0L)) == "5b51eecb7d6518b0")
    assert(hex(lookup3ycs64("abc", 0L)) == "2219db7be9075109")
    assert(hex(lookup3ycs64("abcd", 0L)) == "eaad4c0e3d37bbe3")
    assert(hex(lookup3ycs64("hello world", 0L)) == "a552a75dbee5ae12")
    assert(hex(lookup3ycs64("a😀b", 0L)) == "f0cdc3a671100c84")
    // chaining is NOT concatenation (each add reseeds the state)
    assert(Signatures.lookup3Hex(Seq("text", "hello")) == "46c68d45ca0263d0")
    assert(Signatures.lookup3Hex(Seq("texthello")) == "8caec22ab23aa789")
    assert(Signatures.lookup3Hex(Seq("lang", "en", "source", "src1")) ==
      "b39009fee9c37dea")
  }

  test("lookup3Signature column: per-field name+value chain, nulls skipped") {
    val df = Seq((1L, "en", "src1"), (2L, null.asInstanceOf[String], "src1"))
      .toDF("id", "lang", "source")
    val out = df.select(col("id"), Signatures.lookup3Signature(
      Seq("lang" -> col("lang"), "source" -> col("source"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == Signatures.lookup3Hex(Seq("lang", "en", "source", "src1")))
    assert(out(2L) == Signatures.lookup3Hex(Seq("source", "src1")))
  }

  test("overwriteDupes: last write per signature wins; single agg, no window") {
    val df = Seq((1L, "en", "x"), (2L, "en", "y"), (3L, "de", "z"))
      .toDF("id", "lang", "payload")
    val out = Signatures.overwriteDupes(df,
      Signatures.md5Signature(Seq("lang" -> col("lang"))), col("id"))
    val rows = out.select("lang", "id", "payload").as[(String, Long, String)]
      .collect().toSet
    assert(rows == Set(("en", 2L, "y"), ("de", 3L, "z")))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"))
  }
}
