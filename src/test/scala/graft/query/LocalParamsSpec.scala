package graft.query

import graft.SparkSpec
import graft.corpus.CorpusGen
import graft.index.{DocIds, FieldedIndex}
import java.nio.file.Files

/** Solr local-params syntax and QParser dispatch: prologue parsing
  * (quotes, $deref, v override, bare type, flags), AST routing for
  * term/prefix/field/bool/switch/maxscore, and graphTerms direct eval. */
class LocalParamsSpec extends SparkSpec {
  import QueryParser._

  lazy val idxs = {
    val d = Files.createTempDirectory("graft-localparams").toString
    val withIds = DocIds.assign(CorpusGen.corpus(spark, 200, 4).toDF(),
      Seq("repo", "path", "commit"), 4)
    FieldedIndex.build(spark, withIds, d,
      fields = Seq("content" -> "content", "lang" -> "lang"),
      numSegments = 1, shufflePartitions = 4)
    FieldedIndex.open(spark, d)
  }

  test("prologue parsing: quotes, bare type, flags, $deref, v override") {
    val p = LocalParams.parse("{!dismax qf='title body' tie=0.1}hello world").get
    assert(p.qtype === "dismax")
    assert(p.params === Map("qf" -> "title body", "tie" -> "0.1"))
    assert(p.body === "hello world")

    val p2 = LocalParams.parse("""{!type=term f="lang"}en""").get
    assert(p2.qtype === "term" && p2.params("f") === "lang" && p2.body === "en")

    val p3 = LocalParams.parse("{!prefix f=content v=$pfx}ignored",
      Map("pfx" -> "hand")).get
    assert(p3.body === "hand") // v overrides the trailing body

    val p4 = LocalParams.parse("{!complexphrase inOrder}query").get
    assert(p4.qtype === "complexphrase" && p4.params("inOrder") === "true")

    assert(LocalParams.parse("plain query").isEmpty)
    intercept[IllegalArgumentException](
      LocalParams.parse("{!term f=$missing}x", Map.empty))
    intercept[IllegalArgumentException](LocalParams.parse("{!term f='x}y"))
  }

  test("AST routing: term, prefix, field, maxscore, bool, switch") {
    def ast(q: String, req: Map[String, String] = Map.empty): Query =
      LocalParams.toAst(q, req, idxs, "content")
    assert(ast("{!term f=lang}scala") === FieldQ("lang", TermQ("scala")))
    assert(ast("{!prefix f=content}hand") === FieldQ("content", PrefixQ("hand")))
    // {!field} analyzes through the field's chain: one token -> term,
    // several -> exact phrase
    assert(ast("{!field f=content}Public") === FieldQ("content", TermQ("public")))
    assert(ast("{!field f=content}Public Static") ===
      FieldQ("content", PhraseQ(Seq("public", "static"), 0)))
    assert(ast("{!maxscore tie=0.5}+a b c") ===
      BoolQ(Seq(TermQ("a")), Seq(DisMaxQ(Seq(TermQ("b"), TermQ("c")), 0.5f)), Nil))
    assert(ast("{!bool must='public' should='{!term f=lang v=scala}' must_not='handler3' filter='import'}") ===
      BoolQ(Seq(TermQ("public"), ConstQ(TermQ("import"))),
        Seq(FieldQ("lang", TermQ("scala"))), Seq(TermQ("handler3"))))
    assert(ast("{!switch case.yes='public' default='import' v=$go}",
      Map("go" -> "yes")) === TermQ("public"))
    assert(ast("{!switch case.yes='public' default='import' v=$go}",
      Map("go" -> "other")) === TermQ("import"))
    intercept[IllegalArgumentException](ast("{!switch case.a=x}b"))
    // {!raw} takes the body verbatim like term; {!query} (nested) parses
    // the (deref'd) body as a complete query
    assert(ast("{!raw f=lang}scala") === FieldQ("lang", TermQ("scala")))
    assert(ast("{!query v=$qq}", Map("qq" -> "{!term f=lang v=scala}")) ===
      FieldQ("lang", TermQ("scala")))
    assert(ast("{!query v=$qq}", Map("qq" -> "+public static")) ===
      QueryParser.parse("+public static"))
  }

  test("dispatch ranks like the equivalent fielded query; graphTerms routes directly") {
    val viaLocal = LocalParams.search(idxs, "content",
      "{!bool must='public' must_not='handler3'}", 1000)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    val direct = FieldedIndex.search(idxs, "content", "+public -handler3", 1000)
      .collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq
    assert(viaLocal === direct)
    assert(viaLocal.nonEmpty)

    val dfs = QueryEngine.lookupDfs(idxs("content").termstats,
      Seq("public", "handler3"), None)
    val cap = (dfs("public") + dfs("handler3")) / 2
    val gt = LocalParams.search(idxs, "content",
      s"{!graphTerms f=content maxDocFreq=$cap}public,handler3", 100000)
      .collect().map(_.getLong(0)).toSet
    val want = Searcher.graphTerms(idxs("content"), Seq("public", "handler3"), cap)
      .collect().map(_.getLong(0)).toSet
    assert(gt === want)
    assert(gt.nonEmpty)
  }
}
