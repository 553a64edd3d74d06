package graft.query

import graft.SparkSpec
import graft.codec.SmallFloat
import graft.corpus.CorpusGen
import graft.index.{DocIds, FieldedIndex}
import java.nio.file.Files

/** BM25F combined-field query vs a bit-exact local re-derivation of the
  * reference arithmetic (sandbox BM25FQuery + MultiNormsLeafSimScorer):
  * weighted blended freq, re-encoded combined norm, max-df pseudo term
  * stats, weighted summed collection stats. */
class Bm25FSpec extends SparkSpec {

  private val N = 150
  private val Fields = Seq(("content", 1f), ("path", 2f))

  lazy val (idxs, localDocs) = {
    import org.apache.spark.sql.functions._
    val d = Files.createTempDirectory("graft-bm25f").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, N, 4).toDF(),
      Seq("repo", "path", "commit"), 4)
      // derived plain-word short field (the ft_bm25f title pattern)
      .withColumn("title",
        array_join(slice(graft.operators.TextOps.tokensOf("content"), 1, 5), " "))
      .cache()
    FieldedIndex.build(spark, withIds, d,
      fields = Seq("content" -> "content", "path" -> "path", "title" -> "title"),
      numSegments = 1, shufflePartitions = 4)
    val local = (0L until N.toLong).map(i => CorpusGen.genFile(i))
      .sortBy(f => (f.repo, f.path, f.commit))
      .zipWithIndex.map { case (f, i) =>
        val title = "[a-z0-9]+".r.findAllIn(f.content.toLowerCase).take(5).mkString(" ")
        (i.toLong, Map("content" -> f.content, "path" -> f.path, "title" -> title))
      }
    (FieldedIndex.open(spark, d), local)
  }

  private def toks(s: String): Seq[String] = graft.analysis.Analyzer.terms(s)

  /** Local reference scorer: returns every matching (docId, score). */
  private def bruteForce(terms: Seq[String]): Seq[(Long, Float)] = {
    val qs = terms.distinct
    // per (field, doc): token list
    val tokd: Map[String, Map[Long, Seq[String]]] =
      Fields.map { case (f, _) =>
        f -> localDocs.map { case (id, m) => id -> toks(m(f)) }.toMap
      }.toMap
    // pseudo term stats: docFreq = max over (field, term)
    val docFreq = (for { (f, _) <- Fields; t <- qs }
      yield tokd(f).values.count(_.contains(t)).toLong).max
    var sumTtf = 0L
    Fields.foreach { case (f, w) =>
      sumTtf = (sumTtf + w.toDouble * tokd(f).values.map(_.size.toLong).sum).toLong
    }
    val docCount = N.toLong
    val scorer = BM25.TermScorer(BM25.idf(docFreq, docCount),
      BM25.normCache(BM25.DefaultK1, BM25.DefaultB,
        BM25.avgFieldLength(sumTtf, docCount)))
    localDocs.flatMap { case (id, _) =>
      var freq = 0f
      Fields.foreach { case (f, w) =>
        qs.foreach(t => freq += w * tokd(f)(id).count(_ == t))
      }
      if (freq == 0f) None
      else {
        var nv = 0f
        Fields.foreach { case (f, w) =>
          nv += w * SmallFloat.byte4ToInt(SmallFloat.intToByte4(tokd(f)(id).size)).toFloat
        }
        val nb = SmallFloat.intToByte4(Math.round(nv))
        Some((id, scorer.score(freq, nb)))
      }
    }
  }

  test("engine scores are bit-identical to the reference arithmetic") {
    val terms = Seq("public", "handler3")
    val want = bruteForce(terms).sortBy { case (id, s) => (-s, id) }.take(30)
    val got = Bm25F.topK(Fields.map { case (f, w) => idxs(f) -> w }, terms, 30)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("path matches blend with content matches (a path-only doc still scores)") {
    // 'src' appears in paths; docs whose content lacks it must still match
    val got = Bm25F.topK(Fields.map { case (f, w) => idxs(f) -> w }, Seq("src"), N)
      .collect().map(_.getLong(0)).toSet
    val wantPath = localDocs.filter { case (_, m) => toks(m("path")).contains("src") }
      .map(_._1).toSet
    assert(wantPath.subsetOf(got))
    assert(got === bruteForce(Seq("src")).map(_._1).toSet)
  }

  test("absent term in every field returns empty; guards hold") {
    assert(Bm25F.topK(Fields.map { case (f, w) => idxs(f) -> w },
      Seq("nosuchterm_xyz"), 10).isEmpty)
    intercept[IllegalArgumentException](
      Bm25F.topK(Seq(idxs("content") -> 1f), Seq("public"), 10))
    intercept[IllegalArgumentException](
      Bm25F.topK(Fields.map { case (f, _) => idxs(f) -> 0.5f }, Seq("public"), 10))
  }

  test("quantized declarative twin ranks identically to the engine") {
    // plain-word corpus (the documents-table shape): the twin's regex
    // tokenizer and the index's UAX#29 chain agree on every token
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vocab = Vector("spark", "query", "join", "data", "scan", "merge", "row")
    val plain = (0L until 120L).map { id =>
      val n = 6 + (id % 17).toInt
      val body = (0 until n).map(j => vocab(((id * 31 + j * 7) % vocab.size).toInt))
      (id, body.mkString(" "))
    }.toDF("docId", "body")
      .withColumn("title",
        array_join(slice(graft.operators.TextOps.tokensOf("body"), 1, 3), " "))
      .cache()
    val d2 = Files.createTempDirectory("graft-bm25f-plain").toString
    FieldedIndex.build(spark, plain, d2,
      fields = Seq("body" -> "body", "title" -> "title"),
      numSegments = 1, shufflePartitions = 4)
    val pidx = FieldedIndex.open(spark, d2)
    val terms = Seq("spark", "query")
    val twin = graft.operators.TextOps.bm25fQuantized(
      plain.withColumnRenamed("docId", "doc_id"), "doc_id",
      Seq(("title", 2.0), ("body", 1.0)), terms)
      .orderBy(desc("score"), asc("doc_id")).limit(25)
      .collect().map(_.getLong(0)).toSeq
    val eng = Bm25F.topK(Seq(pidx("title") -> 2f, pidx("body") -> 1f), terms, 25)
      .collect().map(_.getLong(0)).toSeq
    assert(twin.nonEmpty)
    assert(twin === eng)
  }
}
