package graft.analysis

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * PreAnalyzedField JSON parser — the reference's external-analysis
 * ingestion format (solr/core/src/java/org/apache/solr/schema/
 * JsonPreAnalyzedParser.java:54-207 and PreAnalyzedField.java): documents
 * arrive with their token stream already produced by an outside pipeline,
 * as `{"v":"1","str":"...","tokens":[{"t":term,"s":start,"e":end,
 * "i":posInc,"p":payload,"y":type,"f":flags},...]}`. Exactly the
 * reference's attribute semantics:
 *
 *  - positions accumulate by `i` (default 1); `i`=0 stacks a token on the
 *    previous position (synonym overlap), and overlap tokens do NOT count
 *    toward doc length (discountOverlaps, the norm contract the rest of
 *    this engine already follows)
 *  - offsets: `s` defaults to previous end + 1 (the parser's automatic
 *    one-separator increment), `e` defaults to start + term length
 *  - `str` is the stored (displayable) value; `p`/`y`/`f` are accepted
 *    and ignored here (payloads ride the payloads operator, not norms)
 *
 * Jackson (on the Spark classpath) does the JSON reading.
 */
object PreAnalyzed {

  final case class PreToken(term: String, pos: Int, start: Int, end: Int,
                            overlap: Boolean)

  final case class Parsed(str: Option[String], tokens: IndexedSeq[PreToken]) {
    /** Doc length under discountOverlaps. */
    def dl: Int = tokens.count(!_.overlap)
  }

  private val mapper = new ObjectMapper()

  def parse(json: String): Parsed = {
    val root = mapper.readTree(json)
    val v = root.path("v").asText(null)
    require(v == "1", s"unknown pre-analyzed VERSION '$v', expected 1")
    val str = Option(root.path("str").asText(null))
    val toks = root.path("tokens")
    if (!toks.isArray) return Parsed(str, Vector.empty)
    val out = Vector.newBuilder[PreToken]
    var pos = -1
    var tokenEnd = 0
    val it = toks.elements()
    while (it.hasNext) {
      val t: JsonNode = it.next()
      val term = t.path("t").asText("")
      val posInc = if (t.has("i")) t.path("i").asInt(1) else 1
      pos += posInc
      val start =
        if (t.has("s")) t.path("s").asInt(tokenEnd + 1) else tokenEnd + 1
      tokenEnd =
        if (t.has("e")) t.path("e").asInt(start + term.length)
        else start + term.length
      out += PreToken(term, pos, start, tokenEnd, overlap = posInc == 0)
    }
    Parsed(str, out.result())
  }

  /** Serialize a token stream back to the wire format (the reference
    * parser's toFormattedString counterpart) — handy for round-trip tests
    * and for exporting this engine's analysis to other consumers. */
  def toJson(str: Option[String], tokens: Seq[PreToken]): String = {
    val sb = new StringBuilder("""{"v":"1"""")
    str.foreach { s =>
      sb.append(""","str":""").append(mapper.writeValueAsString(s))
    }
    sb.append(""","tokens":[""")
    var lastPos = -1
    tokens.zipWithIndex.foreach { case (t, i) =>
      if (i > 0) sb.append(',')
      val inc = t.pos - lastPos
      lastPos = t.pos
      sb.append("""{"t":""").append(mapper.writeValueAsString(t.term))
        .append(""","s":""").append(t.start)
        .append(""","e":""").append(t.end)
        .append(""","i":""").append(inc)
        .append('}')
    }
    sb.append("]}")
    sb.toString
  }
}
