package graft.operators

import graft.SparkSpec
import graft.operators.Monitor._

/** Reverse search (monitor/percolator): semantics vs a brute-force matcher,
  * plus presearcher-pruning evidence — candidate verifications must stay far
  * below docs x queries. */
class MonitorSpec extends SparkSpec {

  private val docs = Seq(
    (0L, "spark joins data quickly"),
    (1L, "slow scan over the big table"),
    (2L, "data group by key then data group again"),
    (3L, "fast spark join group data"),
    (4L, "nothing relevant here"),
    (5L, "group data is not the phrase"), // 'data group' reversed: no phrase hit
    (6L, ""),
    (7L, "spark spark spark"))

  private val registry: Seq[MQuery] = Seq(
    TermQ("q_term_spark", "spark"),
    AndQ("q_and_spark_join", Seq("spark", "join")),
    OrQ("q_or_slow_fast", Seq("slow", "fast")),
    PhraseQ("q_phrase_data_group", Seq("data", "group")),
    AndQ("q_and_never", Seq("spark", "zzznotaterm")))

  private def tokens(t: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq

  /** Brute force: evaluate every query against every doc. */
  private def bruteForce: Set[(Long, String)] = (for {
    (id, text) <- docs
    toks = tokens(text)
    set = toks.toSet
    q <- registry
    matched = q match {
      case TermQ(_, t)    => set(t)
      case AndQ(_, ts)    => ts.forall(set)
      case OrQ(_, ts)     => ts.exists(set)
      case PhraseQ(_, ts) => toks.sliding(ts.size).exists(_ == ts)
    }
    if matched
  } yield (id, q.id)).toSet

  test("matches == brute force over every (doc, query) pair") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val got = Monitor.matches(df, registry)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === bruteForce)
    // spot semantics: reversed phrase is NOT a phrase match but q5 has both
    // terms -> no q_phrase row for doc 5
    assert(!got.contains((5L, "q_phrase_data_group")))
    assert(got.contains((2L, "q_phrase_data_group")))
    assert(!got.exists(_._2 == "q_and_never"))
  }

  test("presearcher prunes: verified candidates << docs x queries") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("verified")
    // 200 docs, most sharing no terms with the registry
    val many = (0L until 200L).map(i =>
      (i, if (i % 50 == 0) "spark join" else s"filler_${i} words only")).toDF("doc_id", "text")
    val got = Monitor.matches(many, registry, verifiedAcc = Some(acc)).collect()
    assert(got.length === 4 * 2) // 4 docs match q_term_spark + q_and_spark_join
    // anchors: only the 4 spark docs produce candidates; AND anchor is the
    // longest term so 'q_and_never' (anchor zzznotaterm) never gets verified
    assert(acc.value <= 4 * registry.size)
    assert(acc.value < 200L * registry.size / 10)
  }

  test("anchor extraction: conjunctions index ONE term, disjunctions all") {
    import spark.implicits._
    // doc contains only the SHORT term of the AND query: the anchor is the
    // longer 'zzznotaterm', so the doc is never even a candidate
    val acc = spark.sparkContext.longAccumulator("verified2")
    val df = Seq((0L, "spark only")).toDF("doc_id", "text")
    val got = Monitor.matches(df, Seq(AndQ("a", Seq("spark", "zzznotaterm"))),
      verifiedAcc = Some(acc)).collect()
    assert(got.isEmpty)
    assert(acc.value === 0L) // presearcher never surfaced it
    // OR indexes every child: the same doc IS a candidate and a match
    val got2 = Monitor.matches(df, Seq(OrQ("o", Seq("spark", "zzznotaterm"))))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got2.toSeq === Seq((0L, "o")))
  }

  test("wildcard queries ride the ANYTOKEN path: verified on every doc, matched by prefix") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("verifiedW")
    val df = docs.toDF("doc_id", "text")
    val got = Monitor.matches(df, Seq(WildcardQ("w", "spa")), verifiedAcc = Some(acc))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((0L, "w"), (3L, "w"), (7L, "w")))
    // ANYTOKEN: every doc is a candidate (nothing anchors a wildcard);
    // the empty doc (6) contributes a candidate too
    assert(acc.value === docs.size.toLong)
    // a prefix matching nothing still verifies everywhere, matches nowhere
    assert(Monitor.matches(df, Seq(WildcardQ("none", "zzz"))).collect().isEmpty)
  }

  test("NOT queries anchor only the positive part; negation enforced at verification") {
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("verifiedN")
    val df = docs.toDF("doc_id", "text")
    val q = NotQ("n", OrQ("n_inc", Seq("data", "slow")), Seq("spark"))
    val got = Monitor.matches(df, Seq(q), verifiedAcc = Some(acc))
      .collect().map(_.getLong(0)).toSet
    // docs with data|slow: 0,1,2,3,5; minus those containing spark: 0,3
    assert(got === Set(1L, 2L, 5L))
    // only the 5 positive-anchored docs were ever verified — absence of
    // 'spark' never surfaced unanchored candidates
    assert(acc.value === 5L)
    // nested NotQ under AND-include verifies compositionally
    val got2 = Monitor.matches(df, Seq(NotQ("n2", AndQ("a", Seq("data", "group")), Seq("key"))))
      .collect().map(_.getLong(0)).toSet
    assert(got2 === Set(3L, 5L)) // doc 2 has 'key' -> excluded
  }

  test("streaming percolation: matchBatch over a memory stream == batch matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        sink ++= Monitor.matchBatch(registry)(batch)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        (): Unit
      }
      .start()
    mem.addData(docs.take(4): _*)
    q.processAllAvailable()
    mem.addData(docs.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    assert(sink.toSet === bruteForce)
  }

  test("duplicate ids rejected; empty text and repeated-term phrase handled") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Monitor.matches(Seq((0L, "x")).toDF("doc_id", "text"),
        Seq(TermQ("dup", "a"), TermQ("dup", "b")))
    }
    intercept[IllegalArgumentException] {
      Monitor.matches(Seq((0L, "x")).toDF("doc_id", "text"),
        Seq(AndQ("empty", Nil)))
    }
    // repeated-term phrase: 'spark spark' must match doc 7, not doc 0
    val got = Monitor.matches(docs.toDF("doc_id", "text"),
      Seq(PhraseQ("pp", Seq("spark", "spark"))))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(7L))
  }
}
