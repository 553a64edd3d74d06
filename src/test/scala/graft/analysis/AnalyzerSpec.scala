package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {
  test("basic segmentation + lowercase, empty stop set") {
    assert(Analyzer.terms("The Quick  brown_Fox jumps!") === Seq("the", "quick", "brown_fox", "jumps"))
    assert(Analyzer.terms("the a an") === Seq("the", "a", "an")) // no stopwords
  }
  test("numbers and mixed alnum") {
    assert(Analyzer.terms("x1 42 3.14 v2.0 a,b 1,000") === Seq("x1", "42", "3.14", "v2.0", "a", "b", "1,000"))
  }
  test("mid-letter joiners need word chars on both sides") {
    assert(Analyzer.terms("a.b a. .b can't 'quoted'") === Seq("a.b", "a", "b", "can't", "quoted"))
    assert(Analyzer.terms("example.com api:v2") === Seq("example.com", "api:v2"))
  }
  test("255-char chop: long runs emitted as <=255-char chunks, each with its own position") {
    val long = "x" * 600
    val toks = Analyzer.analyze(s"start $long end")
    assert(toks.map(_.term.length) === Seq(5, 255, 255, 90, 3))
    assert(toks.map(_.pos) === Seq(0, 1, 2, 3, 4))
  }
  test("positions increment per token") {
    val toks = Analyzer.analyze("a b c")
    assert(toks.map(_.pos) === Seq(0, 1, 2))
  }
  test("unicode letters kept and lowercased per code point") {
    assert(Analyzer.terms("Größe ÉTÉ") === Seq("größe", "été"))
  }
  test("termFreqs counts and doc length") {
    val (tfs, dl) = Analyzer.termFreqs("a b a c a b")
    assert(dl === 6)
    assert(tfs === Map("a" -> 3, "b" -> 2, "c" -> 1))
  }
}
