package graft.quality

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.query.OracleScorer

/** IR-quality smoke harness (QualityBenchmark shape): fixed topics + by-
  * construction qrels over the synthetic corpus; the engine's MAP/P@10
  * must equal the brute-force BM25 scorer's metrics exactly (rank
  * identity) AND match checked-in golden numbers (quality regression
  * tripwire — a scoring bug that preserves arithmetic identity but
  * changes ranking semantics shows up here). */
class QualitySpec extends SparkSpec {

  private val N = 500

  private lazy val localDocs: Seq[OracleScorer.Doc] =
    (0L until N).map(i => OracleScorer.Doc(i, CorpusGen.genFile(i).content))

  private lazy val idx: IndexStore.OpenIndex = {
    val dir = "target/test-quality-idx"
    graft.util.Fs.rmTree(dir)
    IndexStore.build(spark, CorpusGen.corpusWithIds(spark, N, 4), dir,
      numSegments = 2, shufflePartitions = 8)
    IndexStore.OpenIndex(spark, dir)
  }

  /** qrels by construction: a doc is relevant iff it contains ALL the
    * topic's terms (AND semantics); the search runs OR-BM25, so metrics
    * are meaningfully below 1 and sensitive to ranking changes. */
  private def topicsWithQrels: Seq[Quality.Topic] = {
    val defs = Seq(
      "t1" -> Seq("public", "static"),
      "t2" -> Seq("import", "handler3"),
      "t3" -> Seq("parseconfig", "checkpoint"),
      "t4" -> Seq("mergepolicy"),
      "t5" -> Seq("class", "object", "return"))
    defs.map { case (id, terms) =>
      val rel = localDocs.filter { d =>
        val toks = graft.analysis.Analyzer.terms(d.content).toSet
        terms.forall(toks)
      }.map(_.docId).toSet
      Quality.Topic(id, terms, rel)
    }
  }

  test("engine MAP/P@10 equals the brute-force scorer's and matches goldens") {
    val topics = topicsWithQrels
    assert(topics.forall(_.relevant.nonEmpty), "degenerate qrels")

    val engine = Quality.run(idx, topics, k = 100)
    // brute-force reference ranking (exact BM25 arithmetic, same tie rule)
    val oracle = Quality.Report(topics.map { t =>
      val ranked = OracleScorer.topK(localDocs, t.terms, 100).map(_._1)
      Quality.judge(t, ranked)
    })

    // rank identity => metric identity, topic by topic
    engine.topics.zip(oracle.topics).foreach { case (e, o) =>
      assert(e === o, s"topic ${e.id}")
    }

    // GOLDEN numbers (measured once, checked in): any ranking-semantics
    // change must reproduce these — MAP sits below 1 because AND-qrels
    // docs beyond the k=100 retrieval window count against AP, exactly
    // the TREC convention
    val goldenMap = 0.41482000851120554
    val goldenP10 = 1.0
    val goldenNdcg10 = 1.0
    info(f"MAP=${engine.map}%.6f meanP@10=${engine.meanP10}%.6f meanNDCG@10=${engine.meanNdcg10}%.6f")
    assert(math.abs(engine.map - goldenMap) < 1e-6,
      f"MAP drifted from golden: ${engine.map}%.8f vs $goldenMap%.8f")
    assert(math.abs(engine.meanP10 - goldenP10) < 1e-6,
      f"P@10 drifted from golden: ${engine.meanP10}%.8f")
    assert(math.abs(engine.meanNdcg10 - goldenNdcg10) < 1e-6,
      f"NDCG@10 drifted from golden: ${engine.meanNdcg10}%.8f")
  }

  test("harness compares ranking models: BM25 vs classic vs LMDirichlet on one index") {
    // the QualityBenchmark use-case the similarity zoo exists for: same
    // index, same topics/qrels, three ranking models judged side by side
    val topics = topicsWithQrels
    val bm25 = Quality.run(idx, topics, k = 100)
    val classic = Quality.run(idx, topics, k = 100, sim = graft.query.ClassicSim)
    val lmd = Quality.run(idx, topics, k = 100, sim = graft.query.LMDirichletSim())
    // every model retrieves and produces sane metrics
    for (r <- Seq(bm25, classic, lmd)) {
      assert(r.topics.size === topics.size)
      assert(r.map > 0.0 && r.map <= 1.0, s"MAP ${r.map}")
    }
    // classic must equal its own brute-force judge (rank identity end-to-end)
    val classicOracle = Report_(topics.map { t =>
      Quality.judge(t, OracleScorer.topKSim(localDocs, t.terms, 100,
        graft.query.ClassicSim).map(_._1))
    })
    assert(math.abs(classic.map - classicOracle.map) < 1e-12)
  }

  private def Report_(rs: Seq[Quality.TopicResult]) = Quality.Report(rs)

  test("harness covers the full similarity zoo: DFI, IB, Axiomatic sane + rank-identical") {
    val topics = topicsWithQrels
    val sims = Seq[graft.query.Similarity](
      graft.query.DfiSim(), graft.query.IBSim(), graft.query.AxiomaticF2ExpSim())
    for (sim <- sims) {
      val r = Quality.run(idx, topics, k = 100, sim = sim)
      assert(r.topics.size === topics.size)
      assert(r.map > 0.0 && r.map <= 1.0, s"MAP ${r.map} for $sim")
      // end-to-end rank identity against the brute-force judge per model
      val oracle = Report_(topics.map { t =>
        Quality.judge(t, OracleScorer.topKSim(localDocs, t.terms, 100, sim).map(_._1))
      })
      assert(math.abs(r.map - oracle.map) < 1e-12, s"$sim")
    }
  }

  test("metric arithmetic: AP and P@k on known lists") {
    val rel = Set(1L, 2L, 3L)
    // ranks 1 and 3 relevant: AP = (1/1 + 2/3)/3
    assert(math.abs(Quality.averagePrecision(Seq(1L, 9L, 2L), rel) - (1.0 + 2.0 / 3) / 3) < 1e-12)
    assert(Quality.precisionAt(Seq(1L, 9L, 2L, 8L), rel, 2) === 0.5)
    assert(Quality.averagePrecision(Nil, rel) === 0.0)
    assert(Quality.averagePrecision(Seq(9L, 8L), rel) === 0.0)
    // perfect ranking of all relevant docs => AP 1
    assert(Quality.averagePrecision(Seq(2L, 1L, 3L), rel) === 1.0)
    // NDCG: perfect ranking => 1; hits at ranks 1,3 of 2 ideal slots
    assert(math.abs(Quality.ndcgAt(Seq(2L, 1L, 3L), rel, 10) - 1.0) < 1e-12)
    val got = Quality.ndcgAt(Seq(1L, 9L, 2L), Set(1L, 2L), 10)
    val expect = (1.0 + math.log(2) / math.log(4)) / (1.0 + math.log(2) / math.log(3))
    assert(math.abs(got - expect) < 1e-12)
    assert(Quality.ndcgAt(Seq(9L, 8L), rel, 10) === 0.0)
    assert(Quality.ndcgAt(Nil, rel, 10) === 0.0)
  }
}
