package graft.query

import graft.operators.Spans
import org.w3c.dom.{Element, Node}

/**
 * XML query parser (reference lucene/queryparser/src/java/org/apache/
 * lucene/queryparser/xml/CoreParser.java:55 and its builders/ package):
 * an XML document describes a query tree; element names select builders.
 *
 * Supported elements (the CoreParser core set):
 *  - `<TermQuery>text</TermQuery>` — RAW term (TermQueryBuilder does not
 *    analyze), optional `fieldName`/`boost` attributes
 *  - `<TermsQuery>free text</TermsQuery>` — ANALYZED into should-terms
 *    (TermsQueryBuilder runs the analyzer)
 *  - `<BooleanQuery>` with `<Clause occurs="must|should|mustNot">` children
 *  - `<DisjunctionMaxQuery tieBreaker="0.x">` over sub-queries
 *  - `<ConstantScoreQuery>` wrapping one sub-query
 *  - `<MatchAllDocsQuery/>`
 *  - `<RangeQuery lowerTerm=".." upperTerm=".." includeLower=".."
 *     includeUpper=".."/>` (both bounds must agree on inclusivity — the
 *    term-range leaf has a single inclusive flag)
 *  - `<UserQuery>classic syntax</UserQuery>` — delegates to [[QueryParser]]
 *  - span tree: `<SpanTerm>`, `<SpanOr>`, `<SpanOrTerms>`,
 *    `<SpanNear slop=".." inOrder="..">`, `<SpanNot>` with
 *    `<Include>/<Exclude>`, `<SpanFirst end="..">` — mapped onto
 *    [[Spans.SpanQuery]]. A span tree is supported at the ROOT of the
 *    document (the reference allows spans inside boolean clauses via the
 *    SpanQuery-is-a-Query subtyping; here the two ASTs are distinct and
 *    mixing throws a typed error rather than mis-scoring).
 *
 * XML is parsed with DTDs and external entities disabled (no XXE).
 */
object XmlParser {

  final case class XmlParseException(msg: String)
    extends RuntimeException(msg)

  sealed trait Parsed
  final case class Scored(q: QueryParser.Query) extends Parsed
  final case class Span(q: Spans.SpanQuery) extends Parsed

  private val SpanElems = Set("SpanTerm", "SpanOr", "SpanOrTerms",
    "SpanNear", "SpanNot", "SpanFirst")

  def parse(xml: String): Parsed = {
    val root = rootElement(xml)
    if (SpanElems(root.getTagName)) Span(parseSpan(root))
    else Scored(parseQuery(root))
  }

  /** Convenience: parse and require a scored (non-span) query. */
  def parseScored(xml: String): QueryParser.Query = parse(xml) match {
    case Scored(q) => q
    case Span(_) => throw XmlParseException(
      "document root is a span query; use parse() and evaluate via Spans")
  }

  private def rootElement(xml: String): Element = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // XXE hardening: queries are untrusted user input
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    val doc =
      try f.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
      catch {
        case e: org.xml.sax.SAXException =>
          throw XmlParseException(s"malformed XML: ${e.getMessage}")
      }
    doc.getDocumentElement
  }

  private def children(e: Element): Seq[Element] = {
    val ns = e.getChildNodes
    (0 until ns.getLength).map(ns.item).collect {
      case el: Element => el
    }
  }

  private def text(e: Element): String = e.getTextContent.trim

  private def attr(e: Element, name: String): Option[String] =
    Option(e.getAttributeNode(name)).map(_.getValue)

  private def analyzed(s: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(graft.operators.TextOps.TokenPattern)
      .matcher(s.toLowerCase)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  private def parseQuery(e: Element): QueryParser.Query = {
    import QueryParser._
    if (SpanElems(e.getTagName))
      throw XmlParseException(
        s"span element <${e.getTagName}> inside a scored query tree is not supported; " +
          "put the span tree at the document root")
    val base: Query = e.getTagName match {
      case "TermQuery" =>
        val t = text(e)
        if (t.isEmpty) throw XmlParseException("<TermQuery> needs term text")
        TermQ(t)
      case "TermsQuery" =>
        val ts = analyzed(text(e))
        if (ts.isEmpty) throw XmlParseException("<TermsQuery> analyzed to no terms")
        BoolQ(Nil, ts.map(TermQ), Nil)
      case "MatchAllDocsQuery" => MatchAllQ
      case "UserQuery" => QueryParser.parse(text(e))
      case "BooleanQuery" =>
        val cs = children(e)
        cs.foreach(c => if (c.getTagName != "Clause")
          throw XmlParseException(s"<BooleanQuery> children must be <Clause>, got <${c.getTagName}>"))
        val parsed = cs.map { c =>
          val occurs = attr(c, "occurs").getOrElse("should")
          val inner = children(c) match {
            case Seq(one) => parseQuery(one)
            case other => throw XmlParseException(
              s"<Clause> needs exactly one child query, got ${other.size}")
          }
          (occurs, inner)
        }
        val bad = parsed.collect { case (o, _) if !Set("must", "should", "mustNot")(o) => o }
        if (bad.nonEmpty) throw XmlParseException(s"bad occurs value: ${bad.head}")
        BoolQ(parsed.collect { case ("must", q) => q },
          parsed.collect { case ("should", q) => q },
          parsed.collect { case ("mustNot", q) => q })
      case "DisjunctionMaxQuery" =>
        val tie = attr(e, "tieBreaker").map(_.toFloat).getOrElse(0f)
        val cs = children(e).map(parseQuery)
        if (cs.isEmpty) throw XmlParseException("<DisjunctionMaxQuery> needs children")
        DisMaxQ(cs, tie)
      case "ConstantScoreQuery" =>
        children(e) match {
          case Seq(one) => ConstQ(parseQuery(one))
          case other => throw XmlParseException(
            s"<ConstantScoreQuery> needs exactly one child, got ${other.size}")
        }
      case "RangeQuery" =>
        val lo = attr(e, "lowerTerm").getOrElse(
          throw XmlParseException("<RangeQuery> needs lowerTerm"))
        val hi = attr(e, "upperTerm").getOrElse(
          throw XmlParseException("<RangeQuery> needs upperTerm"))
        val incLo = attr(e, "includeLower").forall(_.toBoolean)
        val incHi = attr(e, "includeUpper").forall(_.toBoolean)
        if (incLo != incHi) throw XmlParseException(
          "mixed includeLower/includeUpper is not supported by the term-range leaf")
        RangeQ(lo, hi, incLo)
      case other =>
        throw XmlParseException(s"unsupported query element <$other>")
    }
    val fielded = attr(e, "fieldName").fold(base)(f => FieldQ(f, base))
    attr(e, "boost").fold(fielded)(b => BoostQ(b.toFloat, fielded))
  }

  private def parseSpan(e: Element): Spans.SpanQuery = e.getTagName match {
    case "SpanTerm" =>
      val t = text(e)
      if (t.isEmpty) throw XmlParseException("<SpanTerm> needs term text")
      Spans.SpanTerm(t)
    case "SpanOr" => Spans.SpanOr(children(e).map(parseSpan))
    case "SpanOrTerms" =>
      val ts = analyzed(text(e))
      if (ts.isEmpty) throw XmlParseException("<SpanOrTerms> analyzed to no terms")
      Spans.SpanOr(ts.map(Spans.SpanTerm))
    case "SpanNear" =>
      val slop = attr(e, "slop").map(_.toInt).getOrElse(0)
      val inOrder = attr(e, "inOrder").forall(_.toBoolean)
      Spans.SpanNear(children(e).map(parseSpan), slop, inOrder)
    case "SpanNot" =>
      val byName = children(e).map(c => c.getTagName -> c).toMap
      (byName.get("Include"), byName.get("Exclude")) match {
        case (Some(i), Some(x)) =>
          (children(i), children(x)) match {
            case (Seq(a), Seq(b)) => Spans.SpanNot(parseSpan(a), parseSpan(b))
            case _ => throw XmlParseException(
              "<Include>/<Exclude> each need exactly one span child")
          }
        case _ => throw XmlParseException("<SpanNot> needs <Include> and <Exclude>")
      }
    case "SpanFirst" =>
      val end = attr(e, "end").map(_.toInt).getOrElse(
        throw XmlParseException("<SpanFirst> needs an end attribute"))
      children(e) match {
        case Seq(one) => Spans.SpanFirst(parseSpan(one), end)
        case other => throw XmlParseException(
          s"<SpanFirst> needs exactly one span child, got ${other.size}")
      }
    case other => throw XmlParseException(s"unsupported span element <$other>")
  }
}
