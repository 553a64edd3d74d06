package graft.index

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.query.{FeatureFields, OracleScorer, QueryEngine, SaturationFunction, LogFunction, SigmoidFunction}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** FeatureField (reference lucene document/FeatureField.java): bit-exact
  * quantization, the three scoring functions, and engine ranking parity
  * including static-boost promotion from outside the text-only top-k. */
class FeatureFieldSpec extends SparkSpec {

  test("encode/decode: reference quantization goldens and invariants") {
    assert(FeatureFields.encodeFeatureValue(1.0f) == (java.lang.Float.floatToIntBits(1.0f) >>> 15))
    assert(FeatureFields.decodeFeatureValue(FeatureFields.encodeFeatureValue(1.0f).toFloat) == 1.0f)
    val rnd = new scala.util.Random(7)
    var prev = -1f
    (0 until 2000).map(_ => math.abs(rnd.nextFloat() * 1000) + 1e-3f).sorted.foreach { v =>
      val d = FeatureFields.decodeFeatureValue(FeatureFields.encodeFeatureValue(v).toFloat)
      assert(d <= v, s"decode must round down: $d > $v") // FeatureField quantization drops mantissa bits
      assert(d >= prev, "decode must be monotone")
      prev = d
    }
    assert(FeatureFields.decodeFeatureValue(FeatureFields.MaxFreq + 1f) == Float.MaxValue)
    intercept[IllegalArgumentException](FeatureFields.encodeFeatureValue(0f))
    intercept[IllegalArgumentException](FeatureFields.encodeFeatureValue(Float.PositiveInfinity))
  }

  test("scoring functions match the reference formulas") {
    val f = 3.5f
    assert(SaturationFunction(2f, 1.5f).score(f) == 2f * (1 - 1.5f / (f + 1.5f)))
    assert(LogFunction(2f, 4f).score(f) == (2f * Math.log(4f + f)).toFloat)
    val pivotPa = Math.pow(1.5, 0.6)
    assert(SigmoidFunction(2f, 1.5f, 0.6f).score(f) ==
      (2f * (1 - pivotPa / (Math.pow(f, 0.6f) + pivotPa))).toFloat)
    // monotone non-decreasing in f
    val sat = SaturationFunction(1f, 2f)
    assert((1 to 100).map(i => sat.score(i.toFloat)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("topKWithFeature: parity with brute force; boost promotes docs from outside the text top-k") {
    val dir = Files.createTempDirectory("graft-feat").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 200, 4).toDF(), Seq("repo", "path", "commit"), 4)
    // deterministic static feature: large for docIds ≡ 0 (mod 13), tiny else
    val encodeUdf = udf((id: Long) =>
      FeatureFields.encodeFeatureValue(if (id % 13 == 0) 50f else 0.01f))
    val corpus = withIds.withColumn("feature", encodeUdf(col("docId")))
    IndexStore.build(spark, corpus, dir, numSegments = 2, shufflePartitions = 4,
      docValueCols = Seq("feature"))
    val idx = IndexStore.OpenIndex(spark, dir)

    val fn = SaturationFunction(weight = 5f, pivot = 1f)
    val terms = Seq("public")
    val got = idx.topKWithFeature(terms, 20, "feature", fn)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq

    // brute force: full text scores (reference arithmetic) + decoded boost
    val local = corpus.select("docId", "content").collect()
      .map(r => OracleScorer.Doc(r.getLong(0), r.getString(1))).toSeq
    val baseAll = OracleScorer.topK(local, terms, local.size).toMap
    val expected = baseAll.toSeq.map { case (id, s) =>
      val fv = FeatureFields.decodeFeatureValue(
        FeatureFields.encodeFeatureValue(if (id % 13 == 0) 50f else 0.01f).toFloat)
      (id, (s.toDouble + fn.score(fv).toDouble).toFloat)
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(got == expected)

    // the boost must actually reorder: boosted top-k differs from text-only
    val textOnly = OracleScorer.topK(local, terms, 20).map(_._1)
    assert(got.map(_._1) != textOnly)
    graft.util.Fs.rmTree(dir)
  }
}
