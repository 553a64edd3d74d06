package graft.operators

import graft.SparkSpec

/** Classification semantics: NB against an independent local reimplementation
  * of the reference arithmetic, kNN against planted vocabulary clusters. */
class ClassifySpec extends SparkSpec {

  private def tokens(t: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq

  /** Local Naive Bayes with the exact reference formula
    * (SimpleNaiveBayesClassifier: class-df likelihood, add-one smoothing,
    * avg-unique-terms denominator, tf-weighted sum). */
  private def localNb(labeled: Seq[(Long, String, String)],
                      text: String): String = {
    val n = labeled.size.toDouble
    val docTerms = labeled.map { case (_, t, c) => (tokens(t).distinct, c) }
    val pairs = docTerms.map(_._1.size).sum
    val avgUnique = pairs / n
    val classes = labeled.map(_._3).distinct
    val toks = tokens(text)
    classes.map { c =>
      val classDocs = labeled.count(_._3 == c).toDouble
      val den = avgUnique * classDocs + n
      val prior = math.log(classDocs / n)
      val llh = toks.map { w =>
        val dfc = docTerms.count { case (ts, cc) => cc == c && ts.contains(w) }
        math.log((dfc + 1.0) / den)
      }.sum
      (c, BigDecimal(prior + llh).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }.maxBy { case (c, s) => (s, c) }._1
  }

  private val labeled = Seq(
    (0L, "spark join shuffle partition executor", "big"),
    (2L, "shuffle spark stage task executor join", "big"),
    (4L, "partition spark executor broadcast join", "big"),
    (6L, "cat dog bird fish pet", "pets"),
    (8L, "dog cat hamster pet food", "pets"),
    (10L, "bird cage cat pet toy", "pets"))

  private val unlabeled = Seq(
    (1L, "spark shuffle join"),
    (3L, "cat dog pet"),
    (5L, "executor partition broadcast task"),
    (7L, "bird fish food"))

  /** Local BM25NB with the exact reference formula (BM25NBClassifier:
    * P(w|c) = class-term BM25 const + best word BM25 over class docs,
    * tf-weighted log sum, prior = ln(class const)). */
  private def localBm25Nb(labeled: Seq[(Long, String, String)],
                          text: String): String = {
    val n = labeled.size.toDouble
    val docToks = labeled.map { case (id, t, c) => (id, tokens(t), c) }
    val dls = docToks.map { case (id, ts, _) => id -> ts.size.toDouble }.toMap
    val avgdl = dls.values.sum / n
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val dfOf = docToks.flatMap { case (_, ts, _) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toDouble }
    val classes = labeled.map(_._3).distinct
    val toks = tokens(text)
    classes.map { c =>
      val classDocs = labeled.count(_._3 == c).toDouble
      val sc = idf(classDocs) / (1.0 + 1.2)
      val llh = toks.map { w =>
        val best = docToks.collect { case (id, ts, cc) if cc == c && ts.contains(w) =>
          val tf = ts.count(_ == w).toDouble
          idf(dfOf(w)) * tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dls(id) / avgdl))
        }
        math.log(sc + (if (best.isEmpty) 0.0 else best.max))
      }.sum
      (c, BigDecimal(llh + math.log(sc)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }.maxBy { case (c, s) => (s, c) }._1
  }

  test("bm25nb matches the reference arithmetic (local oracle)") {
    import spark.implicits._
    val l = labeled.toDF("doc_id", "text", "source")
    val u = unlabeled.toDF("doc_id", "text")
    val got = Classify.bm25nb(l, u).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- unlabeled)
      assert(got(id) === localBm25Nb(labeled, text), s"doc $id")
    assert(got(1L) === "big" && got(3L) === "pets")
    assert(got(5L) === "big" && got(7L) === "pets")
  }

  test("naiveBayes matches the reference arithmetic (local oracle)") {
    import spark.implicits._
    val l = labeled.toDF("doc_id", "text", "source")
    val u = unlabeled.toDF("doc_id", "text")
    val got = Classify.naiveBayes(l, u).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, text) <- unlabeled)
      assert(got(id) === localNb(labeled, text), s"doc $id")
    // sanity: the vocabulary clusters actually separate
    assert(got(1L) === "big" && got(3L) === "pets")
    assert(got(5L) === "big" && got(7L) === "pets")
  }

  test("naiveBayes: unseen-word docs still get the prior-driven prediction") {
    import spark.implicits._
    // all words unseen -> llh identical across classes up to den(c); the
    // majority class with the smaller denominator effect wins — just assert
    // agreement with the local oracle (deterministic tie rule included)
    val u = Seq((99L, "zzz yyy xxx")).toDF("doc_id", "text")
    val got = Classify.naiveBayes(labeled.toDF("doc_id", "text", "source"), u)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(99L) === localNb(labeled, "zzz yyy xxx"))
  }

  test("knn: majority vote of BM25-nearest labeled neighbors") {
    import spark.implicits._
    val l = labeled.toDF("doc_id", "text", "source")
    val u = unlabeled.toDF("doc_id", "text")
    val got = Classify.knn(l, u, k = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "big" && got(5L) === "big")
    assert(got(3L) === "pets" && got(7L) === "pets")
  }

  test("knn maxDfRatio drops stop-word tokens from the candidate join") {
    import spark.implicits._
    // 'common' appears in EVERY labeled doc; with maxDfRatio=0.5 it cannot
    // create candidate pairs, so a test doc with ONLY that token gets no row
    val l = labeled.map { case (id, t, c) => (id, t + " common", c) }
      .toDF("doc_id", "text", "source")
    val u = Seq((50L, "common")).toDF("doc_id", "text")
    assert(Classify.knn(l, u, k = 3).collect().isEmpty)
    // raising the ratio readmits it
    assert(Classify.knn(l, u, k = 3, maxDfRatio = 1.0).collect().nonEmpty)
  }

  test("featuresIGain: perfectly-separating term tops the list, exact arithmetic") {
    import spark.implicits._
    // 6 positive docs all contain "signal"; 6 negatives never do;
    // "noise" appears everywhere (zero gain)
    val docs = ((1 to 6).map(i => (i.toLong, s"signal noise w$i", 1)) ++
      (7 to 12).map(i => (i.toLong, s"noise w$i", 0))).toDF("id", "text", "y")
    val got = Classify.featuresIGain(docs, "id", "text", "y", 1, 5)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(got.head._1 == "signal", got.toSeq)
    // exact IGain for the separator: xc = npos = 6, so both conditional
    // entropies are H(1) and H((6-6)/(12-6+1)) = H(0) = 0 — the full H(0.5)
    def h(x: Double) = if (x <= 0 || x >= 1) 0.0 else -x * math.log(x) - (1 - x) * math.log(1 - x)
    val want = h(0.5) - ((6.0 / 12) * h(1.0) + (1 - 6.0 / 12) * h(0.0 / 7))
    assert(math.abs(got.head._2 - want) < 1e-12, s"got ${got.head._2} want $want")
    // idf = ln(n / (df + 1))
    assert(math.abs(got.head._4 - math.log(12.0 / 7)) < 1e-12)
    // the everywhere-term has zero-ish gain and never outranks the separator
    val noise = got.find(_._1 == "noise")
    noise.foreach(nz => assert(nz._2 < got.head._2))
  }

  test("trainLogistic: deterministic batch GD separates a separable corpus") {
    import spark.implicits._
    val docs = ((1 to 30).map(i => (i.toLong, s"good fine w$i", 1)) ++
      (31 to 60).map(i => (i.toLong, s"bad awful w$i", 0))).toDF("id", "text", "y")
    val feats = Classify.featuresIGain(docs, "id", "text", "y", 1, 4)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    assert(feats.map(_._1).toSet == Set("good", "fine", "bad", "awful"))
    val iters = Classify.trainLogistic(docs, "id", "text", "y", 1, feats,
      iterations = 50, alpha = 0.5)
    assert(iters.size == 50)
    // reported error (sum |sigma - y| under pre-iteration weights) decreases
    assert(iters.last.error < iters.head.error)
    // predictions separate the corpus
    val pred = Classify.logitPredict(docs, "id", "text", iters.last)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val acc = (1 to 60).count(i => pred(i.toLong) == (if (i <= 30) 1 else 0)) / 60.0
    assert(acc >= 0.95, s"accuracy $acc")
    // deterministic: same inputs, bit-identical weights
    val again = Classify.trainLogistic(docs, "id", "text", "y", 1, feats,
      iterations = 50, alpha = 0.5)
    assert(again.last.weights == iters.last.weights)
  }
}
