package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.text.Collator
import java.util.Locale

/** CollationKey expression vs the JDK collator it wraps: key-byte
  * identity, strength semantics, and DataFrame-sort == collator-sort. */
class CollationKeySpec extends SparkSpec {

  private def jdk(locale: Locale, strength: Int): Collator = {
    val c = Collator.getInstance(locale)
    c.setStrength(strength)
    c.setDecomposition(Collator.CANONICAL_DECOMPOSITION)
    c
  }

  test("expression bytes == java.text.CollationKey bytes") {
    import spark.implicits._
    val words = Seq("Müller", "Mueller", "muller", "côte", "coté", "zebra")
    val got = words.toDF("w")
      .select(col("w"), CollationKey(col("w"), "de", "tertiary").as("k"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val c = jdk(new Locale("de"), Collator.TERTIARY)
    words.foreach { w =>
      assert(java.util.Arrays.equals(got(w), c.getCollationKey(w).toByteArray), w)
    }
  }

  test("primary strength folds case and accents into equal keys") {
    val de = (s: String) => CollationKey.key(s, "de", "primary", "canonical")
    assert(java.util.Arrays.equals(de("Müller"), de("muller"))) // ü ~ u, case folded
    assert(java.util.Arrays.equals(de("Straße"), de("strasse"))) // ß ~ ss
    assert(!java.util.Arrays.equals(de("müller"), de("mueller")))
    val tert = (s: String) => CollationKey.key(s, "de", "tertiary", "canonical")
    assert(!java.util.Arrays.equals(tert("Müller"), tert("muller")))
  }

  test("DataFrame sort by key == local collator sort (fr accents)") {
    import spark.implicits._
    val words = Seq("cote", "coté", "côte", "côté", "c", "d", "Cote")
    val sorted = words.toDF("w")
      .orderBy(CollationKey(col("w"), "fr", "tertiary"), col("w"))
      .collect().map(_.getString(0)).toSeq
    val c = jdk(new Locale("fr"), Collator.TERTIARY)
    val local = words.sortWith { (a, b) =>
      val cmp = c.compare(a, b)
      if (cmp != 0) cmp < 0 else a < b
    }
    assert(sorted == local)
  }

  test("invalid strength/decomposition fail fast") {
    intercept[IllegalArgumentException](CollationKey.key("x", "de", "nope", "canonical"))
    intercept[IllegalArgumentException](CollationKey.key("x", "de", "primary", "nope"))
  }
}
