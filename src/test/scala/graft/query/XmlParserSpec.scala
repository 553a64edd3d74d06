package graft.query

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.index.{DocIds, IndexStore}
import graft.operators.Spans
import graft.query.QueryParser._
import java.nio.file.Files

/** XML query parser (reference queryparser/xml/CoreParser.java): AST
  * goldens, execution parity with the classic parser, dismax/constant
  * semantics, span trees, and malformed-input rejection (incl. XXE). */
class XmlParserSpec extends SparkSpec {

  private lazy val idx: IndexStore.OpenIndex = {
    val dir = Files.createTempDirectory("graft-xml").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 300, 4).toDF(),
      Seq("repo", "path", "commit"), 4)
    IndexStore.build(spark, withIds, dir, numSegments = 2, shufflePartitions = 4)
    IndexStore.OpenIndex(spark, dir)
  }

  private def hits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Float)] =
    df.collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq

  test("AST goldens for every supported element") {
    assert(XmlParser.parseScored("<TermQuery>spark</TermQuery>") === TermQ("spark"))
    assert(XmlParser.parseScored("<TermQuery boost='2.5'>x</TermQuery>") ===
      BoostQ(2.5f, TermQ("x")))
    assert(XmlParser.parseScored("<TermQuery fieldName='body'>x</TermQuery>") ===
      FieldQ("body", TermQ("x")))
    assert(XmlParser.parseScored("<TermsQuery>The Quick-fox</TermsQuery>") ===
      BoolQ(Nil, Seq(TermQ("the"), TermQ("quick"), TermQ("fox")), Nil))
    assert(XmlParser.parseScored("<MatchAllDocsQuery/>") === MatchAllQ)
    assert(XmlParser.parseScored("<UserQuery>+a -b</UserQuery>") ===
      QueryParser.parse("+a -b"))
    assert(XmlParser.parseScored(
      "<RangeQuery lowerTerm='aa' upperTerm='bb'/>") === RangeQ("aa", "bb", inclusive = true))
    assert(XmlParser.parseScored(
      """<BooleanQuery>
        | <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
        | <Clause occurs="should"><TermQuery>b</TermQuery></Clause>
        | <Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>
        |</BooleanQuery>""".stripMargin) ===
      BoolQ(Seq(TermQ("a")), Seq(TermQ("b")), Seq(TermQ("c"))))
    assert(XmlParser.parseScored(
      """<DisjunctionMaxQuery tieBreaker="0.4">
        | <TermQuery>a</TermQuery><TermQuery>b</TermQuery>
        |</DisjunctionMaxQuery>""".stripMargin) ===
      DisMaxQ(Seq(TermQ("a"), TermQ("b")), 0.4f))
    assert(XmlParser.parseScored(
      "<ConstantScoreQuery><TermQuery>a</TermQuery></ConstantScoreQuery>") ===
      ConstQ(TermQ("a")))
    assert(XmlParser.parse(
      """<SpanNear slop="2" inOrder="false">
        | <SpanOrTerms>a b</SpanOrTerms>
        | <SpanNot><Include><SpanTerm>c</SpanTerm></Include>
        |  <Exclude><SpanFirst end="3"><SpanTerm>d</SpanTerm></SpanFirst></Exclude></SpanNot>
        |</SpanNear>""".stripMargin) ===
      XmlParser.Span(Spans.SpanNear(Seq(
        Spans.SpanOr(Seq(Spans.SpanTerm("a"), Spans.SpanTerm("b"))),
        Spans.SpanNot(Spans.SpanTerm("c"),
          Spans.SpanFirst(Spans.SpanTerm("d"), 3))), 2, inOrder = false)))
  }

  test("execution parity: XML boolean == classic syntax on a real index") {
    val xml =
      """<BooleanQuery>
        | <Clause occurs="must"><TermQuery>public</TermQuery></Clause>
        | <Clause occurs="must"><TermQuery>import</TermQuery></Clause>
        | <Clause occurs="mustNot"><TermQuery>uniq_1_0</TermQuery></Clause>
        |</BooleanQuery>""".stripMargin
    assert(hits(idx.searchXml(xml, 50)) === hits(idx.search("+public +import -uniq_1_0", 50)))
    assert(hits(idx.searchXml("<UserQuery>public import</UserQuery>", 25)) ===
      hits(idx.search("public import", 25)))
  }

  test("dismax: max + tie * (sum - max) of the clause scores") {
    val xml =
      """<DisjunctionMaxQuery tieBreaker="0.5">
        | <TermQuery>public</TermQuery><TermQuery>import</TermQuery>
        |</DisjunctionMaxQuery>""".stripMargin
    val got = hits(idx.searchXml(xml, 100000)).toMap
    val a = hits(idx.search("public", 100000)).toMap
    val b = hits(idx.search("import", 100000)).toMap
    assert(got.keySet === a.keySet.union(b.keySet))
    got.foreach { case (id, s) =>
      val subs = Seq(a.get(id), b.get(id)).flatten.map(_.toDouble)
      val want = (subs.max + 0.5 * (subs.sum - subs.max)).toFloat
      assert(math.abs(s - want) <= math.ulp(want), s"doc $id")
    }
  }

  test("constant score: matches gate, scores flatten to boost") {
    val got = hits(idx.searchXml(
      """<ConstantScoreQuery boost="2.0"><UserQuery>public import</UserQuery></ConstantScoreQuery>""",
      100000))
    val want = hits(idx.search("public import", 100000)).map(_._1).toSet
    assert(got.map(_._1).toSet === want)
    assert(got.forall(_._2 === 2.0f))
  }

  test("span root evaluates through the span algebra") {
    import spark.implicits._
    val docs = Seq((0L, "sort then merge"), (1L, "merge before sort"),
      (2L, "hash x y merge"), (3L, "nothing")).toDF("doc_id", "text")
    val q = XmlParser.parse(
      """<SpanNear slop="2" inOrder="true">
        | <SpanOrTerms>sort hash</SpanOrTerms><SpanTerm>merge</SpanTerm>
        |</SpanNear>""".stripMargin).asInstanceOf[XmlParser.Span].q
    val got = Spans.matchingDocs(docs, "doc_id", "text", q)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(0L, 2L))
  }

  test("malformed inputs are rejected with typed errors; DTDs are refused") {
    import XmlParser.XmlParseException
    intercept[XmlParseException](XmlParser.parse("not xml at all"))
    intercept[XmlParseException](XmlParser.parse("<NoSuchQuery>x</NoSuchQuery>"))
    intercept[XmlParseException](XmlParser.parse("<TermQuery></TermQuery>"))
    intercept[XmlParseException](XmlParser.parse(
      "<BooleanQuery><TermQuery>a</TermQuery></BooleanQuery>")) // child must be Clause
    intercept[XmlParseException](XmlParser.parse(
      "<BooleanQuery><Clause occurs='perhaps'><TermQuery>a</TermQuery></Clause></BooleanQuery>"))
    intercept[XmlParseException](XmlParser.parse(
      "<RangeQuery lowerTerm='a' upperTerm='b' includeLower='true' includeUpper='false'/>"))
    // span element buried in a scored tree is a typed error, not mis-scoring
    intercept[XmlParseException](XmlParser.parse(
      "<BooleanQuery><Clause occurs='must'><SpanTerm>a</SpanTerm></Clause></BooleanQuery>"))
    intercept[XmlParseException](XmlParser.parseScored("<SpanTerm>a</SpanTerm>"))
    // XXE: doctype declarations are refused outright
    intercept[XmlParseException](XmlParser.parse(
      """<?xml version="1.0"?><!DOCTYPE q [<!ENTITY x SYSTEM "file:///etc/passwd">]>
        |<TermQuery>&x;</TermQuery>""".stripMargin))
  }
}
