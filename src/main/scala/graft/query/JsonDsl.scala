package graft.query

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.index.IndexStore.OpenIndex
import org.apache.spark.sql.DataFrame

/**
 * Solr JSON Query DSL (the JSON Request API `query` object — reference
 * solr/core/src/java/org/apache/solr/request/json/JsonQueryConverter
 * .java:30-130 and RequestUtil.java:200): `{"bool": {"must": [...],
 * "must_not": [...]}}`, `{"term": {"f": "lang", "query": "en"}}`, plain
 * strings as lucene-syntax queries, and `"#tagged"` wrappers.
 *
 * The reference string-encodes every JSON node back into local-params
 * (`{!bool must=$_tt0}`) and re-parses; here the JSON maps onto the query
 * AST directly — same dispatch surface as [[LocalParams.toAst]], without
 * the param-indirection round-trip. Tags (`"#name"`) unwrap: they exist
 * for faceting's excludeTags, which this engine's drill-sideways/facet
 * domain machinery handles on the fq frames themselves.
 *
 * Lists under bool clauses hold any number of sub-queries (the converter
 * emits one `$_ttN` param per element; here they are just AST children).
 */
object JsonDsl {

  private val mapper = new ObjectMapper()
  // CLI ergonomics: sbt's command parsing strips double quotes, so the
  // jsonsearch surface sends single-quoted JSON
  mapper.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
  mapper.configure(com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_UNQUOTED_FIELD_NAMES, true)

  import QueryParser._

  def toAst(json: String, request: Map[String, String] = Map.empty,
            idxs: Map[String, OpenIndex] = Map.empty,
            defaultField: String = "content"): Query =
    node(mapper.readTree(json), request, idxs, defaultField)

  /** Parse + rank through the fielded searcher, like LocalParams.search. */
  def search(idxs: Map[String, OpenIndex], defaultField: String,
             json: String, k: Int,
             request: Map[String, String] = Map.empty): DataFrame =
    Searcher.searchFieldedAst(idxs, defaultField,
      toAst(json, request, idxs, defaultField), k)

  private def node(n: JsonNode, request: Map[String, String],
                   idxs: Map[String, OpenIndex], defaultField: String): Query = {
    if (n.isTextual) return strQuery(n.asText, request, idxs, defaultField)
    require(n.isObject, s"JSON query must be a string or object, got: $n")
    require(n.size == 1,
      s"expect exactly one query parser key, found: ${keysOf(n).mkString(",")}")
    var qtype = n.fieldNames().next()
    var body = n.get(qtype)
    if (qtype.startsWith("#")) { // tagged query: unwrap (tag is facet-side)
      if (body.isTextual) return strQuery(body.asText, request, idxs, defaultField)
      require(body.isObject && body.size == 1, s"bad tagged query: $n")
      qtype = body.fieldNames().next()
      body = body.get(qtype)
    }
    qtype match {
      case "lucene" =>
        QueryParser.parse(textParam(body, "query", "v").getOrElse(
          throw new IllegalArgumentException(s"lucene: missing query: $body")))
      case "term" =>
        FieldQ(fieldOf(body, defaultField), TermQ(reqText(body, "term")))
      case "prefix" =>
        FieldQ(fieldOf(body, defaultField), PrefixQ(reqText(body, "prefix")))
      case "field" =>
        val f = fieldOf(body, defaultField)
        val idx = idxs.getOrElse(f,
          throw new IllegalArgumentException(s"no index for field '$f'"))
        idx.analyzeQuery(reqText(body, "field")) match {
          case Seq() => BoolQ(Nil, Nil, Nil)
          case Seq(t) => FieldQ(f, TermQ(t))
          case ts => FieldQ(f, PhraseQ(ts, 0))
        }
      case "bool" =>
        def clause(name: String): Seq[Query] = Option(body.get(name)).toSeq.flatMap { c =>
          val els = if (c.isArray) iterate(c) else Seq(c)
          els.map(e => node(e, request, idxs, defaultField))
        }
        BoolQ(clause("must") ++ clause("filter").map(ConstQ(_)),
          clause("should"), clause("must_not"))
      case other =>
        // route anything else through the local-params dispatch so the two
        // dialects stay in lockstep ({"maxscore": {...}}, {"switch": ...})
        val params = keysOf(body).filterNot(_ == "query").map { k =>
          val v = body.get(k)
          k -> (if (v.isTextual) v.asText else v.asText(v.toString))
        }
        val bodyStr = textParam(body, "query", "v").getOrElse("")
        val lp = params.map { case (k, v) => s"$k='${v.replace("'", "\\'")}'" }
          .mkString(" ")
        LocalParams.toAst(s"{!$other $lp}$bodyStr", request, idxs, defaultField)
    }
  }

  private def strQuery(s: String, request: Map[String, String],
                       idxs: Map[String, OpenIndex], defaultField: String): Query =
    LocalParams.toAst(s, request, idxs, defaultField)

  private def keysOf(n: JsonNode): Seq[String] = {
    val it = n.fieldNames()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def iterate(n: JsonNode): Seq[JsonNode] = {
    val it = n.elements()
    val b = Seq.newBuilder[JsonNode]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def textParam(n: JsonNode, names: String*): Option[String] =
    if (n.isTextual) Some(n.asText)
    else names.flatMap(k => Option(n.get(k)).filter(_.isTextual).map(_.asText))
      .headOption

  private def fieldOf(n: JsonNode, default: String): String =
    if (n.isObject) Option(n.get("f")).map(_.asText).getOrElse(default)
    else default

  /** The query text of a parser body: the bare string form
    * ({"term": "x"} shorthand is not in the reference grammar, but
    * {"term": {"f": .., "query"/"v": ..}} is). */
  private def reqText(n: JsonNode, qtype: String): String =
    textParam(n, "query", "v").getOrElse(
      throw new IllegalArgumentException(s"$qtype: missing query/v in $n"))
}
