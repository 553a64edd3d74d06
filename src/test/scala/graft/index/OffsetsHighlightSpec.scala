package graft.index

import graft.SparkSpec
import graft.analysis.Analyzer
import graft.corpus.CorpusGen
import org.apache.spark.sql.functions._

/** Offsets tier + passage-ranked highlighter: offset-analysis stream
  * identity, brute-force parity for passage selection, weighted ranking. */
class OffsetsHighlightSpec extends SparkSpec {
  import spark.implicits._

  test("analyzeWithOffsets: same terms+positions as analyze; offsets slice the original text") {
    val texts = (0L until 50L).map(i => CorpusGen.genFile(i).content) ++ Seq(
      "The Quick  brown_Fox jumps!", "a.b a. .b can't 'quoted'",
      "x1 42 3.14 v2.0 1,000 12:30 ab:cd", "Größe ÉTÉ", "", "   ",
      "x" * 600 + " tail")
    texts.foreach { t =>
      val base = Analyzer.analyze(t)
      val off = Analyzer.analyzeWithOffsets(t)
      assert(off.map(o => (o.term, o.pos)) === base.map(b => (b.term, b.pos)), t.take(40))
      off.foreach { o =>
        assert(Analyzer.lowercase(t.substring(o.start, o.end)) === o.term,
          s"offset slice mismatch at ${o.pos} in '${t.take(40)}'")
      }
    }
  }

  private lazy val idx: IndexStore.OpenIndex = {
    val dir = "target/test-offsets-idx"
    graft.util.Fs.rmTree(dir)
    IndexStore.build(spark, CorpusGen.corpusWithIds(spark, 300, 4), dir,
      numSegments = 2, shufflePartitions = 8, withOffsets = true)
    IndexStore.OpenIndex(spark, dir)
  }

  /** Local brute force: same passage definition over raw analyzed text. */
  private def bruteForce(terms: Set[String], window: Int, top: Int): Seq[(Long, Int, Long, Int, Int)] = {
    val docs = (0L until 300L).map(i => CorpusGen.genFile(i)).zipWithIndex
    // corpusWithIds assigns ids by spark.range order = generation order
    docs.flatMap { case (f, id) =>
      val occ = Analyzer.analyzeWithOffsets(f.content).filter(t => terms(t.term))
      occ.groupBy(_.pos / window).map { case (p, os) =>
        (id.toLong, p, os.size.toLong, os.map(_.start).min, os.map(_.end).max)
      }.toSeq.sortBy { case (_, p, n, _, _) => (-n, p) }.take(top)
    }
  }

  test("highlightPassages == brute force over raw text") {
    val got = idx.highlightPassages(Seq("public", "static"), window = 20, topPassages = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4)))
      .toSeq.sortBy(x => (x._1, x._2))
    val want = bruteForce(Set("public", "static"), 20, 2).sortBy(x => (x._1, x._2))
    assert(got === want)
    assert(got.nonEmpty)
    // multi-passage docs exist (this is a PASSAGE-RANKED result, not first-match)
    assert(got.groupBy(_._1).exists(_._2.size == 2))
  }

  test("char offsets slice to windows containing the query terms") {
    val rows = idx.highlightPassages(Seq("parseconfig"), window = 16, topPassages = 1)
      .limit(5).collect()
    val byId = (0L until 300L).map(i => CorpusGen.genFile(i).content)
    rows.foreach { r =>
      val frag = byId(r.getLong(0).toInt).substring(r.getInt(3), r.getInt(4))
      assert(frag.toLowerCase.contains("parseconfig"), frag)
    }
    assert(rows.nonEmpty)
  }

  test("weighted passage scores equal the local idf-sum oracle") {
    val common = idx.termstats.orderBy(desc("df"), asc("term")).limit(1)
      .select("term").as[String].collect().head
    val rare = idx.termstats.orderBy(asc("df"), asc("term")).limit(1)
      .select("term").as[String].collect().head
    val cols = idx.highlightPassagesWeighted(Seq(common, rare), 16, 3).columns.toSeq
    assert(cols === Seq("docId", "passage", "score", "char_start", "char_end"))
    val terms = Seq(common, rare)
    val dfs = idx.termstats.filter(col("term").isin(terms: _*))
      .select("term", "df").as[(String, Long)].collect().toMap
    val wByTerm = terms.map(t => t -> graft.query.BM25.idf(dfs(t), idx.stats.docCount)).toMap
    val got = idx.highlightPassagesWeighted(terms, 16, 1000)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    val wantAll = (0L until 300L).flatMap { i =>
      val occ = Analyzer.analyzeWithOffsets(CorpusGen.genFile(i).content)
        .filter(t => wByTerm.contains(t.term))
      occ.groupBy(_.pos / 16).map { case (p, os) =>
        ((i, p), os.map(o => wByTerm(o.term).toDouble).sum)
      }
    }.toMap
    got.foreach { case (k, s) =>
      assert(math.abs(s - wantAll(k)) < 1e-6, s"weighted score at $k")
    }
    assert(got.nonEmpty)
  }
}
