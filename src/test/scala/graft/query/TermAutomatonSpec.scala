package graft.query

import graft.SparkSpec
import graft.index.IndexStore
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** TermAutomatonQuery: builder validation, determinized thread counting
  * (incl. the reference scorer's ANY-gap behaviors), and BM25 scoring with
  * summed member idfs. */
class TermAutomatonSpec extends SparkSpec {
  import spark.implicits._
  import TermAutomaton._

  private val texts = Seq(
    "data group rows",            // 0: data→group
    "data hash data group",       // 1: data→hash and data→group
    "data data group",            // 2: adjacent query terms in the gap
    "data x group end",           // 3: gap of exactly one non-query token
    "data x y group",             // 4: gap of two -> no ANY match
    "group data end",             // 5: wrong order
    "plain words only here"       // 6: no query terms
  )

  private lazy val idx = {
    val d = Files.createTempDirectory("graft-tautomaton").toString
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("docId", "content")
    IndexStore.build(spark, corpus, d, numSegments = 1, shufflePartitions = 2,
      withPositions = true)
    IndexStore.OpenIndex(spark, d)
  }

  private def syn: Compiled = {
    val b = new Builder
    val s0 = b.createState(); val s1 = b.createState(); val s2 = b.createState()
    b.setAccept(s2, true)
    b.addTransition(s0, s1, "data")
    b.addTransition(s1, s2, "group")
    b.addTransition(s1, s2, "hash")
    b.finish()
  }

  private def anyGap: Compiled = {
    val b = new Builder
    val s0 = b.createState(); val s1 = b.createState()
    val s2 = b.createState(); val s3 = b.createState()
    b.setAccept(s3, true)
    b.addTransition(s0, s1, "data")
    b.addAnyTransition(s1, s2)
    b.addTransition(s2, s3, "group")
    b.finish()
  }

  test("builder validation: leading/trailing ANY and empty string rejected") {
    val b1 = new Builder
    val a = b1.createState(); val c = b1.createState(); val e = b1.createState()
    b1.setAccept(e, true)
    b1.addAnyTransition(a, c); b1.addTransition(c, e, "x")
    intercept[IllegalArgumentException](b1.finish()) // leading ANY

    val b2 = new Builder
    val a2 = b2.createState(); val c2 = b2.createState(); val e2 = b2.createState()
    b2.setAccept(e2, true)
    b2.addTransition(a2, c2, "x"); b2.addAnyTransition(c2, e2)
    intercept[IllegalArgumentException](b2.finish()) // trailing ANY

    val b3 = new Builder
    val a3 = b3.createState()
    b3.setAccept(a3, true)
    b3.addTransition(a3, a3, "x")
    intercept[IllegalArgumentException](b3.finish()) // accepts empty string
  }

  test("synonym-branch automaton: freq = adjacency count of data→(group|hash)") {
    val got = matches(idx, syn).select("docId", "freq")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 1, 1L -> 2, 2L -> 1))
  }

  test("ANY-gap automaton: reference thread counting, incl. the query-term-gap double count") {
    val got = matches(idx, anyGap).select("docId", "freq")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // doc 3 "data x group": one thread crosses the gap -> 1
    // doc 2 "data data group": the middle 'data' is stepped both as a real
    //   token over the expanded ANY arc AND by the gap advance (the
    //   reference scorer does both) -> freq 2
    // doc 1 "data hash data group": data@0 ANY-crosses hash@1? hash steps
    //   s1 via expanded ANY to s2, gap-advance also puts s2@2, then
    //   data@2 is not 'group'; data@2 starts s1@3, group@3 steps it via
    //   ANY-expansion to s2 (no accept) and the advance loop cannot run
    //   (no gap); so only the double-stepped s2@2 dies at data@2 -> 0?
    //   walk it: tokens data@0,hash@1,data@2,group@3
    //   data@0: s1@1. hash@1: step(s1,hash)=s2@2 (ANY arc); start:-1.
    //   data@2: advance lastPos=1<2: ps(1)={s1} any-> s2@2 (again).
    //     ps(2)={s2,s2}: step(s2,data) = -1 (s2 only accepts 'group'...
    //     no: s2-group->s3, expanded? that arc is a real 'group' arc, so
    //     step(s2,data) = -1). start: s1@3.
    //   group@3: ps(3)={s1}: step(s1,group) via ANY arc -> s2@4, not
    //     accept; start: -1. -> freq 0, doc 1 absent
    assert(got === Map(3L -> 1, 2L -> 2))
  }

  test("score is BM25 on freq with summed member idfs") {
    val rows = matches(idx, syn).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getFloat(2))).toSeq
    val dfs = QueryEngine.lookupDfs(idx.termstats, Seq("data", "group", "hash"), None)
    var w = 0.0
    Seq("data", "group", "hash").foreach(t => w += BM25.idf(dfs(t), idx.stats.docCount).toDouble)
    val scorer = BM25.TermScorer(w.toFloat,
      BM25.normCache(BM25.DefaultK1, BM25.DefaultB,
        BM25.avgFieldLength(idx.stats.sumTotalTermFreq, idx.stats.docCount)))
    val toks = texts.map(t => t.split(" ").length)
    rows.foreach { case (id, f, s) =>
      val nb = graft.codec.SmallFloat.intToByte4(toks(id.toInt))
      assert(s === scorer.score(f.toFloat, nb), s"doc $id")
    }
  }

  test("absent member terms drop out of matching and the idf sum") {
    val b = new Builder
    val s0 = b.createState(); val s1 = b.createState(); val s2 = b.createState()
    b.setAccept(s2, true)
    b.addTransition(s0, s1, "data")
    b.addTransition(s1, s2, "group")
    b.addTransition(s0, s2, "zzz_absent_term")
    val got = matches(idx, b.finish()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getFloat(2))).toSeq
    assert(got.map(g => g._1 -> g._2).toMap === Map(0L -> 1, 1L -> 1, 2L -> 1))
    // weight excludes the absent term (allTermStats skips null stats)
    val dfs = QueryEngine.lookupDfs(idx.termstats, Seq("data", "group"), None)
    var w = 0.0
    Seq("data", "group").foreach(t => w += BM25.idf(dfs(t), idx.stats.docCount).toDouble)
    val scorer = BM25.TermScorer(w.toFloat,
      BM25.normCache(BM25.DefaultK1, BM25.DefaultB,
        BM25.avgFieldLength(idx.stats.sumTotalTermFreq, idx.stats.docCount)))
    val toks = texts.map(t => t.split(" ").length)
    got.foreach { case (id, f, s) =>
      assert(s === scorer.score(f.toFloat,
        graft.codec.SmallFloat.intToByte4(toks(id.toInt))), s"doc $id")
    }
  }

  test("nondeterministic branches determinize; topK ranks by score then docId") {
    val b = new Builder
    val s0 = b.createState(); val s1 = b.createState()
    val s2 = b.createState(); val acc = b.createState()
    b.setAccept(acc, true)
    b.addTransition(s0, s1, "data"); b.addTransition(s0, s2, "data")
    b.addTransition(s1, acc, "group"); b.addTransition(s2, acc, "hash")
    val got = matches(idx, b.finish()).select("docId", "freq")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // same accept DFA state reached from the merged subset: one accept
    // event per matching token, not two
    assert(got === Map(0L -> 1, 1L -> 2, 2L -> 1))
    val top = topK(idx, syn, 2).collect().map(_.getLong(0)).toSeq
    assert(top.length === 2)
  }
}
