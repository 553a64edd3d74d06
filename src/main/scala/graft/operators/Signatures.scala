package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Solr's index-time dedup signatures (SignatureUpdateProcessor), Spark-first.
  *
  * The reference processor (`solr/core/src/java/org/apache/solr/update/
  * processor/SignatureUpdateProcessorFactory.java:135-190`) walks the
  * signature fields in order and, for each NON-NULL field, feeds the field
  * NAME and then every value string into one `Signature`; the digest is
  * rendered as lowercase hex. Three signature classes:
  *
  *  - `MD5Signature` (MD5Signature.java:40-48): one MD5 over the UTF-8
  *    bytes of all added strings, concatenated with no separator.
  *  - `Lookup3Signature` (Lookup3Signature.java:27-35): chains
  *    `Hash.lookup3ycs64` across the added strings (each call seeds with
  *    the running hash); 8-byte big-endian hex.
  *  - `TextProfileSignature` (TextProfileSignature.java:66-141, the Nutch
  *    near-dup profile): per added string — keep letter/digit runs
  *    lowercased, DISCARD tokens of length <= minTokenLen (default 2),
  *    count, quant = round(maxFreq*quantRate) floored at 2 when maxFreq>1
  *    (so freq-1 tokens vanish from any doc with a repeated token), counts
  *    round DOWN to a multiple of quant and drop below quant, then the
  *    profile is "tok cnt" lines joined by \n in decreasing-count order,
  *    fed to the MD5 digest. DETERMINISM FIX vs the reference: its
  *    count-tie order is HashMap iteration order (TokenComparator:158
  *    compares counts only), which is not reproducible across JVMs — here
  *    ties break by token ascending, a stable canonical order (same class
  *    of replayability fix as the engine's HitQueue docId tie rule).
  *
  * Everything but lookup3 stays in whole-stage codegen: the profile is
  * built with array higher-order functions (no shuffle, no UDF) and the
  * digest is Spark's native `md5`. lookup3ycs64 is an intentional
  * arithmetic re-derivation (like codec/SmallFloat) — the exact published
  * Bob Jenkins/lookup3 variant, needed bit-for-bit — exposed as a scalar
  * UDF over the packed content array.
  */
object Signatures {

  /** One signature-field contribution: field name + all values, skipped
    * entirely (name too) when the field is null. */
  private def contrib(name: String, v: Column): Column =
    when(v.isNull, lit("")).otherwise(concat(lit(name), v.cast("string")))

  private def contribArr(name: String, v: Column): Column =
    when(v.isNull, lit(""))
      .otherwise(concat(lit(name), array_join(transform(v, _.cast("string")), "")))

  /** MD5Signature over scalar fields, in the given field order (the
    * factory sorts names only when no explicit field list is configured).
    * Returns lowercase hex, Solr's rendering. */
  def md5Signature(fields: Seq[(String, Column)]): Column =
    md5(concat(fields.map { case (n, v) => contrib(n, v) }: _*).cast("binary"))

  /** MD5Signature where some fields are multi-valued (array columns). */
  def md5SignatureMixed(fields: Seq[(String, Column, Boolean)]): Column =
    md5(concat(fields.map {
      case (n, v, true)  => contribArr(n, v)
      case (n, v, false) => contrib(n, v)
    }: _*).cast("binary"))

  /** The Nutch text profile of one content string (the exact string the
    * reference feeds to its MD5 digest), as a codegen'd Column. */
  def textProfile(content: Column, quantRate: Double = 0.01,
                  minTokenLen: Int = 2): Column = {
    val toks = filter(
      split(lower(content), "[^\\p{L}\\p{Nd}]+", -1),
      t => length(t) > minTokenLen)
    val counted = transform(array_distinct(toks), t =>
      struct(size(filter(toks, x => x === t)).as("cnt"), t.as("val")))
    val maxFreq = coalesce(
      array_max(transform(counted, c => c("cnt"))), lit(0))
    // Math.round(maxFreq * quantRate) with the reference's float arithmetic
    val rawQuant = round(maxFreq.cast("float") * lit(quantRate.toFloat))
      .cast("int")
    val quant = when(rawQuant < 2,
      when(maxFreq > 1, lit(2)).otherwise(lit(1))).otherwise(rawQuant)
    val quantized = transform(counted, c =>
      struct((floor(c("cnt") / quant).cast("int") * quant).as("cnt"),
        c("val").as("val")))
    val kept = filter(quantized, c => c("cnt") >= quant)
    val sorted = array_sort(kept, (l, r) =>
      when(l("cnt") > r("cnt"), -1).when(l("cnt") < r("cnt"), 1)
        .otherwise(when(l("val") < r("val"), -1)
          .when(l("val") > r("val"), 1).otherwise(0)))
    array_join(
      transform(sorted, c =>
        concat(c("val"), lit(" "), c("cnt").cast("string"))), "\n")
  }

  /** TextProfileSignature over scalar fields: each field contributes the
    * profile of its NAME then the profile of its value (faithful to the
    * factory's sig.add(field); sig.add(value) call pair — the name profile
    * is a constant Catalyst folds away). */
  def textProfileSignature(fields: Seq[(String, Column)],
                           quantRate: Double = 0.01,
                           minTokenLen: Int = 2): Column =
    md5(concat(fields.map { case (n, v) =>
      when(v.isNull, lit("")).otherwise(concat(
        textProfile(lit(n), quantRate, minTokenLen),
        textProfile(v.cast("string"), quantRate, minTokenLen)))
    }: _*).cast("binary"))

  /** lookup3ycs64 (solrj common/util/Hash.java:185-236): the 64-bit
    * lookup3 variant over UTF-16 chars paired into code points, chainable
    * via `initval`. Exact integer semantics of the published algorithm. */
  def lookup3ycs64(s: CharSequence, initval: Long): Long = {
    var a = 0xdeadbeef + initval.toInt
    var b = a
    var c = a + (initval >>> 32).toInt
    val end = s.length
    var i = 0
    var mixed = true
    var done = false
    while (!done) {
      if (i >= end) { done = true }
      else {
        mixed = false
        var ch = s.charAt(i); i += 1
        a += (if (Character.isHighSurrogate(ch) && i < end) {
          val cp = Character.toCodePoint(ch, s.charAt(i)); i += 1; cp
        } else ch.toInt)
        if (i >= end) { done = true }
        else {
          ch = s.charAt(i); i += 1
          b += (if (Character.isHighSurrogate(ch) && i < end) {
            val cp = Character.toCodePoint(ch, s.charAt(i)); i += 1; cp
          } else ch.toInt)
          if (i >= end) { done = true }
          else {
            ch = s.charAt(i); i += 1
            c += (if (Character.isHighSurrogate(ch) && i < end) {
              val cp = Character.toCodePoint(ch, s.charAt(i)); i += 1; cp
            } else ch.toInt)
            if (i >= end) { done = true }
            else {
              // mix(a,b,c)
              a -= c; a ^= Integer.rotateLeft(c, 4);  c += b
              b -= a; b ^= Integer.rotateLeft(a, 6);  a += c
              c -= b; c ^= Integer.rotateLeft(b, 8);  b += a
              a -= c; a ^= Integer.rotateLeft(c, 16); c += b
              b -= a; b ^= Integer.rotateLeft(a, 19); a += c
              c -= b; c ^= Integer.rotateLeft(b, 4);  b += a
              mixed = true
            }
          }
        }
      }
    }
    if (!mixed) {
      // final(a,b,c)
      c ^= b; c -= Integer.rotateLeft(b, 14)
      a ^= c; a -= Integer.rotateLeft(c, 11)
      b ^= a; b -= Integer.rotateLeft(a, 25)
      c ^= b; c -= Integer.rotateLeft(b, 16)
      a ^= c; a -= Integer.rotateLeft(c, 4)
      b ^= a; b -= Integer.rotateLeft(a, 14)
      c ^= b; c -= Integer.rotateLeft(b, 24)
    }
    (c.toLong & 0xffffffffL) + (b.toLong << 32)
  }

  /** Lookup3Signature's chained digest over content strings, as hex. */
  def lookup3Hex(contents: Seq[String]): String = {
    var h = 0L
    contents.foreach { s => h = lookup3ycs64(s, h) }
    f"$h%016x"
  }

  private val lookup3Udf =
    udf((contents: Seq[String]) => lookup3Hex(contents))

  /** Lookup3Signature over scalar fields (name + value per non-null
    * field, like the factory). */
  def lookup3Signature(fields: Seq[(String, Column)]): Column =
    lookup3Udf(flatten(array(fields.map { case (n, v) =>
      when(v.isNull, array().cast("array<string>"))
        .otherwise(array(lit(n), v.cast("string")))
    }: _*)))

  /** overwriteDupes=true semantics at batch scale: within a signature
    * group the LAST write wins (the processor deletes-by-term on the
    * signature before each add). One partial-aggregated max_by shuffle —
    * no window, no sort. `order` is the arrival order (e.g. an update
    * sequence or doc id). */
  def overwriteDupes(docs: DataFrame, sig: Column, order: Column): DataFrame = {
    val cols = docs.columns
    docs.groupBy(sig.as("signature"))
      .agg(max_by(struct(cols.map(col): _*), order).as("__doc"))
      .select(col("signature") +: cols.map(c => col(s"__doc.$c")): _*)
  }
}
