package graft.query

/**
 * Classic query-string parser — the reference's primary text entry point
 * (reference lucene/queryparser/src/java/org/apache/lucene/queryparser/
 * classic/QueryParser.java:81, used by Solr's QueryComponent.prepare).
 * Supported subset of the classic syntax:
 *
 *   term                      free term (SHOULD by default)
 *   +term / -term             required / prohibited
 *   a AND b, a OR b, NOT a    boolean operators (AND promotes both sides
 *                             to required; NOT == '-')
 *   "a b c"                   exact phrase;  "a b"~N  sloppy phrase
 *   pre*  w?ld*card           prefix / wildcard (dictionary expansion)
 *   term~  term~2             fuzzy (edit distance, default 2)
 *   [a TO b]  {a TO b}        term range (inclusive / exclusive)
 *   ( ... )                   grouping (nested boolean)
 *   atom^2  atom^0.5          boost (score multiplier)
 *   field:term                field scoping (routed by the fielded
 *                             searcher; a single-field index treats the
 *                             prefix as its one field)
 *
 * Terms are lowercased to match the analyzer.
 *
 * The parser builds a small AST ([[Query]]); execution lives in
 * [[Searcher]], which maps each node to the corresponding engine path.
 */
object QueryParser {

  sealed trait Query
  /** Match every live doc at score 1·boost (MatchAllDocsQuery) — emitted by
    * [[SimpleQueryParser]] for `*` and as the positive side of a pure
    * negation. */
  case object MatchAllQ extends Query
  final case class TermQ(term: String) extends Query
  final case class PhraseQ(terms: Seq[String], slop: Int) extends Query
  final case class PrefixQ(prefix: String) extends Query
  final case class WildcardQ(glob: String) extends Query
  final case class FuzzyQ(term: String, maxEdits: Int) extends Query
  final case class RangeQ(lo: String, hi: String, inclusive: Boolean) extends Query
  /** Field-scoped clause (`field:term`): routed to that field's index by
    * the fielded searcher; the single-index searcher evaluates the inner
    * query against its only field. */
  final case class FieldQ(field: String, inner: Query) extends Query
  /** Boost wrapper (`term^2`, `"a b"^0.5`): the child's scores multiply
    * by `boost` (float) — the classic-parser setBoost surface. */
  final case class BoostQ(boost: Float, inner: Query) extends Query
  /** Boolean node: every matching doc's score = sum of its matching
    * clauses' scores (must + should), in clause order. */
  final case class BoolQ(must: Seq[Query], should: Seq[Query], mustNot: Seq[Query]) extends Query

  /** DisjunctionMaxQuery over sub-queries (produced by the XML parser;
    * the classic text grammar has no dismax syntax). */
  final case class DisMaxQ(clauses: Seq[Query], tie: Float) extends Query

  /** ConstantScoreQuery: the child decides the match set, every match
    * scores 1 (times any wrapping boost). */
  final case class ConstQ(inner: Query) extends Query

  final case class ParseException(msg: String, pos: Int)
    extends RuntimeException(s"$msg at position $pos")

  def parse(input: String): Query = {
    val p = new P(input)
    val q = p.parseBool()
    p.skipWs()
    if (!p.eof) throw ParseException(s"unexpected '${p.peek}'", p.pos)
    q
  }

  private sealed trait Occur
  private case object Should extends Occur
  private case object Must extends Occur
  private case object MustNot extends Occur

  private final class P(val in: String) {
    var pos = 0
    def eof: Boolean = pos >= in.length
    def peek: Char = in.charAt(pos)
    def skipWs(): Unit = while (!eof && peek.isWhitespace) pos += 1

    private def isTermChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '*' || c == '?' || c == '.' || c == '-' || c == ':'

    /** One clause list at the current nesting level -> BoolQ (or the sole
      * unsigned child, unwrapped). */
    def parseBool(): Query = {
      var clauses = Vector.empty[(Occur, Query)]
      var pendingMust = false // set by a binary AND: next clause is required
      var done = false
      while (!done) {
        skipWs()
        if (eof || peek == ')') done = true
        else {
          // operator keywords
          if (in.startsWith("AND", pos) && boundary(pos + 3)) {
            if (clauses.isEmpty) throw ParseException("AND with no left operand", pos)
            // promote the previous SHOULD clause (explicit +/- win)
            clauses = clauses.init :+ (clauses.last match {
              case (Should, q) => (Must, q)
              case other => other
            })
            pendingMust = true
            pos += 3
          } else if (in.startsWith("OR", pos) && boundary(pos + 2)) {
            if (clauses.isEmpty) throw ParseException("OR with no left operand", pos)
            pendingMust = false
            pos += 2
          } else if (in.startsWith("NOT", pos) && boundary(pos + 3)) {
            pos += 3
            skipWs()
            val q = parseAtom()
            clauses :+= ((MustNot, q))
            pendingMust = false
          } else {
            val occur0 =
              if (peek == '+') { pos += 1; Must }
              else if (peek == '-') { pos += 1; MustNot }
              else if (pendingMust) Must
              else Should
            val q = parseAtom()
            clauses :+= ((occur0, q))
            pendingMust = false
          }
        }
      }
      if (clauses.isEmpty) throw ParseException("empty query", pos)
      val must = clauses.collect { case (Must, q) => q }
      val should = clauses.collect { case (Should, q) => q }
      val mustNot = clauses.collect { case (MustNot, q) => q }
      if (must.isEmpty && mustNot.isEmpty && should.size == 1) should.head
      else if (must.size == 1 && should.isEmpty && mustNot.isEmpty) must.head
      else BoolQ(must, should, mustNot)
    }

    private def boundary(p: Int): Boolean =
      p >= in.length || in.charAt(p).isWhitespace || in.charAt(p) == '(' || in.charAt(p) == ')'

    def parseAtom(): Query = {
      skipWs()
      if (eof) throw ParseException("expected a clause", pos)
      val q = peek match {
        case '(' =>
          pos += 1
          val inner = parseBool()
          skipWs()
          if (eof || peek != ')') throw ParseException("expected ')'", pos)
          pos += 1
          inner
        case '"' => parsePhrase()
        case '[' | '{' => parseRange()
        case c if isTermChar(c) || c == '+' => parseTerm()
        case c => throw ParseException(s"unexpected '$c'", pos)
      }
      // trailing ^boost applies to any atom (classic-parser setBoost)
      if (!eof && peek == '^') {
        pos += 1
        val start = pos
        while (!eof && (peek.isDigit || peek == '.')) pos += 1
        if (pos == start) throw ParseException("expected a boost value after '^'", pos)
        // any digit/dot run was consumed — validate it (".", "1.2.3" would
        // escape as a raw NumberFormatException, breaking the typed
        // ParseException contract callers like the CLI rely on)
        val raw = in.substring(start, pos)
        val b =
          try raw.toFloat
          catch { case _: NumberFormatException =>
            throw ParseException(s"invalid boost value '$raw'", start) }
        BoostQ(b, q)
      } else q
    }

    private def parsePhrase(): Query = {
      pos += 1 // opening quote
      val start = pos
      while (!eof && peek != '"') pos += 1
      if (eof) throw ParseException("unterminated phrase", start)
      val body = in.substring(start, pos)
      pos += 1 // closing quote
      val terms = graft.analysis.Analyzer.terms(body)
      if (terms.isEmpty) throw ParseException("empty phrase", start)
      var slop = 0
      if (!eof && peek == '~') {
        pos += 1
        slop = readInt(default = 0)
      }
      PhraseQ(terms, slop)
    }

    private def parseRange(): Query = {
      val inclusive = peek == '['
      val close = if (inclusive) ']' else '}'
      pos += 1
      val lo = readWord()
      skipWs()
      if (!in.startsWith("TO", pos)) throw ParseException("expected TO in range", pos)
      pos += 2
      skipWs()
      val hi = readWord()
      skipWs()
      if (eof || peek != close) throw ParseException(s"expected '$close'", pos)
      pos += 1
      RangeQ(lo.toLowerCase, hi.toLowerCase, inclusive)
    }

    private def parseTerm(): Query = {
      val raw0 = readWord()
      if (raw0.isEmpty) throw ParseException("empty term", pos)
      // split off a field prefix (kept in the AST as FieldQ)
      val (field, raw) = raw0.lastIndexOf(':') match {
        case -1 => (None, raw0)
        case i => (Some(raw0.substring(0, i).toLowerCase), raw0.substring(i + 1))
      }
      val w = raw.toLowerCase
      if (w.isEmpty) throw ParseException("empty term after field prefix", pos)
      val leaf: Query = {
        if (!eof && peek == '~') {
          pos += 1
          val edits = readInt(default = 2)
          FuzzyQ(w, math.min(edits, 2))
        } else if (w.contains('*') || w.contains('?')) {
          if (w.endsWith("*") && w.count(c => c == '*' || c == '?') == 1)
            PrefixQ(w.dropRight(1))
          else WildcardQ(w)
        } else TermQ(w)
      }
      field.fold(leaf)(f => FieldQ(f, leaf))
    }

    private def readWord(): String = {
      val start = pos
      while (!eof && isTermChar(peek)) pos += 1
      in.substring(start, pos)
    }

    private def readInt(default: Int): Int = {
      val start = pos
      while (!eof && peek.isDigit) pos += 1
      if (pos == start) default else in.substring(start, pos).toInt
    }
  }

  // ---- complex phrases (lucene/queryparser complexPhrase/
  // ComplexPhraseQueryParser.java: embedded wildcards, fuzzies, and
  // (a b) groups inside quoted phrases) ----

  sealed trait PhraseSlot
  final case class TermSlot(term: String) extends PhraseSlot
  final case class GroupSlot(terms: Seq[String]) extends PhraseSlot
  final case class WildcardSlot(pattern: String) extends PhraseSlot
  final case class FuzzySlot(term: String, maxEdits: Int) extends PhraseSlot

  private val FuzzyAtom = """([^\s~()]+)~(\d+)""".r

  /** Parse the BODY of a complex phrase (no surrounding quotes) into
    * ordered slots: `(a b) jo* word~1 plain`. Plain atoms run through the
    * standard analyzer (one atom may analyze to several consecutive
    * slots); wildcard/fuzzy atoms are lowercased but NOT analyzed, like
    * the reference's multi-term branches. */
  def parseComplexPhrase(body: String): Seq[PhraseSlot] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PhraseSlot]
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (c == '(') {
        val close = body.indexOf(')', i)
        if (close < 0) throw ParseException("unterminated group in phrase", i)
        val terms = graft.analysis.Analyzer.terms(body.substring(i + 1, close))
        if (terms.isEmpty) throw ParseException("empty group in phrase", i)
        out += GroupSlot(terms)
        i = close + 1
      } else {
        var j = i
        while (j < body.length && !Character.isWhitespace(body.charAt(j)) && body.charAt(j) != '(') j += 1
        val atom = body.substring(i, j)
        atom match {
          case FuzzyAtom(t, e) => out += FuzzySlot(t.toLowerCase, e.toInt)
          case a if a.contains('*') || a.contains('?') =>
            out += WildcardSlot(a.toLowerCase)
          case a =>
            graft.analysis.Analyzer.terms(a).foreach(t => out += TermSlot(t))
        }
        i = j
      }
    }
    if (out.isEmpty) throw ParseException("empty phrase", 0)
    out.toSeq
  }
}
