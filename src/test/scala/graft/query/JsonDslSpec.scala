package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** JSON Query DSL → AST: shape coverage and lockstep with the
  * local-params dialect (JsonQueryConverter's contract). */
class JsonDslSpec extends AnyFunSuite {
  import QueryParser._

  private def ast(json: String, req: Map[String, String] = Map.empty): Query =
    JsonDsl.toAst(json, req)

  test("strings are lucene-syntax (with optional local-params prologue)") {
    assert(ast(""""+public static"""") === QueryParser.parse("+public static"))
    assert(ast(""""{!term f=lang}en"""") === FieldQ("lang", TermQ("en")))
  }

  test("term/prefix objects with f and query/v") {
    assert(ast("""{"term": {"f": "lang", "query": "en"}}""") ===
      FieldQ("lang", TermQ("en")))
    assert(ast("""{"term": {"f": "lang", "v": "en"}}""") ===
      FieldQ("lang", TermQ("en")))
    assert(ast("""{"prefix": {"f": "text", "query": "quer"}}""") ===
      FieldQ("text", PrefixQ("quer")))
  }

  test("bool with list clauses, filter as constant-score must") {
    val q = ast(
      """{"bool": {
        |  "must": ["spark", {"term": {"f": "lang", "query": "en"}}],
        |  "filter": {"term": {"f": "source", "query": "src1"}},
        |  "should": ["quick"],
        |  "must_not": ["slow", "bad"]
        |}}""".stripMargin)
    assert(q === BoolQ(
      Seq(TermQ("spark"), FieldQ("lang", TermQ("en")),
        ConstQ(FieldQ("source", TermQ("src1")))),
      Seq(TermQ("quick")),
      Seq(TermQ("slow"), TermQ("bad"))))
  }

  test("tagged queries unwrap; unknown parsers route via local-params") {
    assert(ast("""{"#top": {"term": {"f": "lang", "query": "en"}}}""") ===
      FieldQ("lang", TermQ("en")))
    assert(ast("""{"#t2": "public"}""") === TermQ("public"))
    // maxscore routes through LocalParams dispatch
    assert(ast("""{"maxscore": {"tie": "0.5", "query": "+a b c"}}""") ===
      BoolQ(Seq(TermQ("a")), Seq(DisMaxQ(Seq(TermQ("b"), TermQ("c")), 0.5f)), Nil))
  }

  test("errors: multiple keys, non-object parser body, missing query") {
    intercept[IllegalArgumentException](
      ast("""{"term": {"f": "x", "query": "a"}, "prefix": {}}"""))
    intercept[IllegalArgumentException](ast("""{"term": {"f": "x"}}"""))
    intercept[IllegalArgumentException](ast("""[1,2]"""))
  }
}
