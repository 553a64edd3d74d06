package graft.query

import graft.SparkSpec
import graft.query.QueryParser._
import graft.query.{SimpleQueryParser => SQP}

/** SimpleQueryParser dialect (reference queryparser/simple/
  * SimpleQueryParser.java): AST goldens for the state machine's grouping
  * rules, leniency (never throws), flag gating, and engine match-set
  * parity through Searcher on a tiny index. */
class SimpleQueryParserSpec extends SparkSpec {

  test("operation-change grouping: a + b | c == ((a AND b) OR c)") {
    assert(SQP.parse("a + b | c") ==
      BoolQ(Nil, Seq(BoolQ(Seq(TermQ("a"), TermQ("b")), Nil, Nil), TermQ("c")), Nil))
    assert(SQP.parse("a | b + c") ==
      BoolQ(Seq(BoolQ(Nil, Seq(TermQ("a"), TermQ("b")), Nil), TermQ("c")), Nil, Nil))
    // default operator between bare terms is SHOULD
    assert(SQP.parse("a b") == BoolQ(Nil, Seq(TermQ("a"), TermQ("b")), Nil))
    assert(SQP.parse("a b", defaultOperator = "and") ==
      BoolQ(Seq(TermQ("a"), TermQ("b")), Nil, Nil))
  }

  test("negation: pure -a matches everything but a; double negation cancels") {
    assert(SQP.parse("-a") == BoolQ(Nil, Seq(MatchAllQ), Seq(TermQ("a"))))
    assert(SQP.parse("--a") == TermQ("a"))
    assert(SQP.parse("b -a") == BoolQ(Nil,
      Seq(TermQ("b"), BoolQ(Nil, Seq(MatchAllQ), Seq(TermQ("a")))), Nil))
  }

  test("phrase, near, prefix, fuzzy, and the star query") {
    assert(SQP.parse("\"a b\"") == PhraseQ(Seq("a", "b"), 0))
    assert(SQP.parse("\"a b\"~3 c") ==
      BoolQ(Nil, Seq(PhraseQ(Seq("a", "b"), 3), TermQ("c")), Nil))
    assert(SQP.parse("pre*") == PrefixQ("pre"))
    assert(SQP.parse("word~1") == FuzzyQ("word", 1))
    assert(SQP.parse("word~") == FuzzyQ("word", 2))      // empty edit -> 2
    assert(SQP.parse("word~9") == FuzzyQ("word", 2))     // capped at 2
    assert(SQP.parse("word~0") == TermQ("word"))         // 0 -> plain term
    assert(SQP.parse("*") == MatchAllQ)
    assert(SQP.parse("(a b) + c") ==
      BoolQ(Seq(BoolQ(Nil, Seq(TermQ("a"), TermQ("b")), Nil), TermQ("c")), Nil, Nil))
  }

  test("leniency: malformed input degrades, never throws") {
    assert(SQP.parse("(a b") == BoolQ(Nil, Seq(TermQ("a"), TermQ("b")), Nil)) // unbalanced ( ignored
    assert(SQP.parse("\"a b") == BoolQ(Nil, Seq(TermQ("a"), TermQ("b")), Nil)) // unterminated quote
    assert(SQP.parse("") == BoolQ(Nil, Nil, Nil))        // MatchNoDocs
    assert(SQP.parse("+ | a") == TermQ("a"))             // leading ops ignored
    assert(SQP.parse("a + ") == TermQ("a"))              // trailing op ignored
    assert(SQP.parse("()") == BoolQ(Nil, Nil, Nil))      // empty group
    assert(SQP.parse("word~x") == TermQ("word"))         // bad fuzziness -> 0
  }

  test("escape and flag gating") {
    // escaped + is literal; the analyzer splits the token and the parts
    // combine under the DEFAULT operator (QueryBuilder.createBooleanQuery)
    assert(SQP.parse("a\\+b") == BoolQ(Nil, Seq(TermQ("a"), TermQ("b")), Nil))
    assert(SQP.parse("a\\+b", defaultOperator = "and") ==
      BoolQ(Seq(TermQ("a"), TermQ("b")), Nil, Nil))
    // with AND disabled, '+' is part of the token stream (analyzer strips it)
    val noAnd = SQP.parse("a + b", SQP.AllOperators & ~SQP.AndOperator)
    assert(noAnd == BoolQ(Nil, Seq(TermQ("a"), TermQ("b")), Nil))
    // with PREFIX disabled, trailing * is literal (analyzer drops it)
    assert(SQP.parse("pre*", SQP.AllOperators & ~SQP.PrefixOperator) == TermQ("pre"))
  }

  test("leniency fuzz: parse NEVER throws on 2000 random operator-soup strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab \"()+|-*~\\012".toCharArray
    (0 until 2000).foreach { i =>
      val len = rnd.nextInt(24)
      val s = new String(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
      val q = SQP.parse(s) // must not throw, whatever the input
      assert(q != null, s"'$s'")
      // flag-gated parse must not throw either
      SQP.parse(s, rnd.nextInt())
    }
  }

  test("engine match-set parity on a tiny index") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sqp").toString
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha delta"),
      (2L, "beta delta epsilon"),
      (3L, "gamma gamma delta"),
      (4L, "zeta eta")
    ).toDF("docId", "content")
    graft.index.IndexStore.build(spark, docs, dir, numSegments = 1,
      shufflePartitions = 4, withPositions = true)
    val idx = graft.index.IndexStore.OpenIndex(spark, dir)
    def ids(q: String): Set[Long] =
      Searcher.searchSimple(idx, q, 100).collect().map(_.getLong(0)).toSet
    assert(ids("alpha + beta | delta") == Set(0L, 1L, 2L, 3L)) // (alpha AND beta) OR delta
    assert(ids("-delta") == Set(0L, 4L))
    assert(ids("\"alpha beta\"") == Set(0L))
    assert(ids("gamm*") == Set(0L, 3L))
    assert(ids("alpa~1") == Set(0L, 1L))
    assert(ids("*") == Set(0L, 1L, 2L, 3L, 4L))
    assert(ids("alpha + -beta") == Set(1L)) // alpha AND (not beta)
    graft.util.Fs.rmTree(dir)
  }
}
