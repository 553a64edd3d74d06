package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * edismax semantics (reference solr ExtendedDismaxQParser.java +
 * DisMaxQParser.java): cross-field dismax per user clause with per-field
 * stats and boosts, mm over user clauses only, pf2 bigram phrase boosts
 * appended outside the mm'd boolean.
 */
class EdismaxSpec extends SparkSpec {
  import spark.implicits._

  // 4-doc corpus, two fields. body stats: N=4.
  //   d1 body: "alpha beta alpha"   title: "alpha"
  //   d2 body: "beta gamma"         title: "gamma gamma"
  //   d3 body: "alpha beta"         title: "delta"
  //   d4 body: "delta delta"        title: "beta"
  private def corpus = Seq(
    (1L, "alpha beta alpha", "alpha"),
    (2L, "beta gamma", "gamma gamma"),
    (3L, "alpha beta", "delta"),
    (4L, "delta delta", "beta")
  ).toDF("id", "body", "title")

  private def bm25(tf: Double, df: Double, n: Double, dl: Double, avgdl: Double): Double =
    math.log(1 + (n - df + 0.5) / (df + 0.5)) * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

  test("cross-field dismax with per-field stats, boosts, and tie") {
    // query: alpha beta, mm=1, tie=0.5, qf body×1.0 title×3.0
    val got = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0), ("title", 3.0)),
      terms = Seq("alpha", "beta"), mm = 1, tie = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val nB = 4.0; val avgB = (3 + 2 + 2 + 2) / 4.0   // body dls
    val nT = 4.0; val avgT = (1 + 2 + 1 + 1) / 4.0   // title dls
    // d1: alpha matches body (tf2, df2) AND title (tf1, df1) -> dismax;
    //     beta matches body only
    val d1alphaB = bm25(2, 2, nB, 3, avgB) * 1.0
    val d1alphaT = bm25(1, 1, nT, 1, avgT) * 3.0
    val d1alpha = math.max(d1alphaB, d1alphaT) + 0.5 * (d1alphaB + d1alphaT - math.max(d1alphaB, d1alphaT))
    val d1beta = bm25(1, 3, nB, 3, avgB)
    assert(math.abs(got(1L) - round5(d1alpha + d1beta)) < 1e-9)
    // d4: beta in title only
    val d4beta = bm25(1, 1, nT, 1, avgT) * 3.0
    assert(math.abs(got(4L) - round5(d4beta)) < 1e-9)
    assert(got.keySet == Set(1L, 2L, 3L, 4L)) // every doc matches >=1 clause
  }

  test("mm filters on the count of matched user clauses across any field") {
    val got = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0), ("title", 1.0)),
      terms = Seq("alpha", "beta", "gamma"), mm = 2, tie = 0.0)
      .collect().map(_.getLong(0)).toSet
    // d1 alpha+beta, d2 beta+gamma, d3 alpha+beta, d4 beta(title) only
    assert(got == Set(1L, 2L, 3L))
  }

  test("pf2 bigram phrase boost adds only to docs with the adjacent pair, without changing the match set") {
    val base = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0)), terms = Seq("alpha", "beta"), mm = 1, tie = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val boosted = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0)), terms = Seq("alpha", "beta"), mm = 1, tie = 0.0,
      pf2 = Seq(("body", 2.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base.keySet == boosted.keySet)
    // "alpha beta" adjacent in d1 (pos 0-1) and d3; not in d2/d4
    val nB = 4.0; val avgB = 9 / 4.0
    val idfSum = math.log(1 + (nB - 2 + 0.5) / (2 + 0.5)) + math.log(1 + (nB - 3 + 0.5) / (3 + 0.5))
    val d3pb = 2.0 * idfSum * 1 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / avgB))
    assert(math.abs(boosted(3L) - round5(base(3L) + d3pb)) < 2e-5)
    assert(boosted(1L) > base(1L))
    assert(math.abs(boosted(2L) - base(2L)) < 1e-9)
    assert(!boosted.contains(4L)) // d4 matches no user clause — pf2 can't add it
  }

  test("pf2 with 4+ query terms (3+ bigrams) builds the per-bigram idf branch correctly") {
    // regression: the per-bigram idf used to be assembled with
    // reduce(_.otherwise(_)), which throws for 3+ branches; coalesce(when*)
    // must give each bigram its own idf sum.
    val got = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0)), terms = Seq("alpha", "beta", "gamma", "delta"),
      mm = 1, tie = 0.0, pf2 = Seq(("body", 2.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0)), terms = Seq("alpha", "beta", "gamma", "delta"),
      mm = 1, tie = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == base.keySet)
    val nB = 4.0; val avgB = 9 / 4.0
    def idf(df: Double) = math.log(1 + (nB - df + 0.5) / (df + 0.5))
    def pb(idfSum: Double, ptf: Double, dl: Double) =
      2.0 * idfSum * ptf / (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avgB))
    // d2 "beta gamma": only bigram (beta,gamma) matches -> idf(beta)+idf(gamma)
    assert(math.abs(got(2L) - round5(base(2L) + pb(idf(3) + idf(1), 1, 2))) < 2e-5)
    // d3 "alpha beta": only bigram (alpha,beta) -> idf(alpha)+idf(beta)
    assert(math.abs(got(3L) - round5(base(3L) + pb(idf(2) + idf(3), 1, 2))) < 2e-5)
    // d4 "delta delta": no bigram matches (gamma,delta / others absent)
    assert(math.abs(got(4L) - base(4L)) < 1e-9)
  }

  test("blendedBm25 declarative twin with 3+ terms builds the per-term boost branch correctly") {
    // regression: same reduce(_.otherwise(_)) pattern in the boost column.
    val got = TextOps.blendedBm25(corpus.withColumnRenamed("body", "text"), "id", "text",
      Seq(("alpha", 1.0), ("beta", 2.0), ("gamma", 3.0)), tieBreaker = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // blended df = max(df(alpha)=2, df(beta)=3, df(gamma)=1) = 3
    val nB = 4.0; val avgB = 9 / 4.0
    def s(boost: Double, tf: Double, dl: Double) =
      boost * math.log(1 + (nB - 3 + 0.5) / (3 + 0.5)) * tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgB))
    def dismax(subs: Seq[Double]) = subs.max + 0.5 * (subs.sum - subs.max)
    // d1 "alpha beta alpha": alpha tf2 boost1, beta tf1 boost2
    assert(math.abs(got(1L) - round5(dismax(Seq(s(1, 2, 3), s(2, 1, 3))))) < 2e-5)
    // d2 "beta gamma": beta tf1 boost2, gamma tf1 boost3
    assert(math.abs(got(2L) - round5(dismax(Seq(s(2, 1, 2), s(3, 1, 2))))) < 2e-5)
    // d4 "delta delta" matches none of the three terms
    assert(got.keySet == Set(1L, 2L, 3L))
  }

  test("phrase idf for a field-absent term uses df=0 and the bigram simply never matches") {
    // query "beta zzz": bigram (beta, zzz) can't match; main still scores beta
    val got = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0)), terms = Seq("beta", "zzz"), mm = 1, tie = 0.0,
      pf2 = Seq(("body", 5.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = TextOps.edismax(corpus, "id",
      qf = Seq(("body", 1.0)), terms = Seq("beta"), mm = 1, tie = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == base)
  }

  private def round5(x: Double): Double =
    BigDecimal(x).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mm spec grammar matches the reference arithmetic (SolrPluginUtils:671-708)") {
    val f = TextOps.calculateMinShouldMatch _
    assert(f(5, "3") == 3)
    assert(f(5, "-2") == 3)           // all but 2
    assert(f(5, "8") == 5)            // clamp to clause count
    assert(f(5, "-8") == 0)           // clamp to 0
    assert(f(4, "75%") == 3)
    assert(f(5, "75%") == 3)          // 3.75 truncates
    assert(f(4, "-25%") == 3)         // 4 + (-1)
    assert(f(5, "-25%") == 4)         // 5 + (-1.25 -> -1)
    // conditionals: <=2 -> all; 3..5 -> all but one; >5 -> 80%
    val spec = "2<-1 5<80%"
    assert(f(1, spec) == 1)
    assert(f(2, spec) == 2)
    assert(f(3, spec) == 2)
    assert(f(5, spec) == 4)
    assert(f(10, spec) == 8)
    // spaces around '<' tolerated as in the reference
    assert(f(3, "2 < -1") == 2)
  }
}
