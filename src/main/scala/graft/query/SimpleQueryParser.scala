package graft.query

import QueryParser._

/**
 * SimpleQueryParser — the lenient end-user dialect (reference
 * lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
 * SimpleQueryParser.java:99-560). Unlike the classic parser it NEVER
 * throws: any malformed operator degrades to literal text or is ignored,
 * exactly as the reference's state machine does. Syntax (each operator
 * individually flag-gated, :106-124):
 *
 *   term term        default operator (SHOULD unless configured MUST)
 *   a + b            AND (infix; extra/leading '+' ignored)
 *   a | b            OR
 *   -a               NOT (doubly-negated cancels; pure negation matches
 *                    everything else via the MatchAll SHOULD wrapper :441-447)
 *   "a b"  "a b"~N   phrase / near phrase
 *   pre*             prefix (trailing '*' only)
 *   term~  term~1    fuzzy (empty edit = 2, capped at 2, negative → 0)
 *   ( ... )          precedence; unbalanced parens degrade literally
 *   \x               escape
 *   *                (alone) MatchAllDocsQuery
 *
 * Tree building mirrors buildQueryTree (:435-480): an operation CHANGE
 * wraps the accumulated tree one level deeper, so `a + b | c` groups as
 * ((a AND b) OR c) without any precedence table. Output is the shared
 * [[QueryParser.Query]] AST — executed by [[Searcher]] on any index.
 */
object SimpleQueryParser {

  val AndOperator: Int = 1 << 0
  val NotOperator: Int = 1 << 1
  val OrOperator: Int = 1 << 2
  val PrefixOperator: Int = 1 << 3
  val PhraseOperator: Int = 1 << 4
  val PrecedenceOperators: Int = 1 << 5
  val EscapeOperator: Int = 1 << 6
  val WhitespaceOperator: Int = 1 << 7
  val FuzzyOperator: Int = 1 << 8
  val NearOperator: Int = 1 << 9
  val AllOperators: Int = -1

  /** LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE */
  private val MaxEdits = 2

  private sealed trait Occur
  private case object Must extends Occur
  private case object Should extends Occur
  private case object MustNot extends Occur

  /** Builder tree: a leaf or a boolean with per-clause occurs (the
    * reference's BooleanQuery.Builder shape), flattened to BoolQ last. */
  private sealed trait Node
  private final case class Leaf(q: Query) extends Node
  private final case class Bool(clauses: Vector[(Occur, Node)]) extends Node

  private final class State(val data: Array[Char], var index: Int, val length: Int) {
    var top: Node = _
    var currentOp: Option[Occur] = None
    var previousOp: Option[Occur] = None
    var not: Int = 0
  }

  def parse(queryText: String, flags: Int = AllOperators,
            defaultOperator: String = "should"): Query = {
    val defOp: Occur = defaultOperator.toLowerCase match {
      case "must" | "and" => Must
      case _              => Should
    }
    if (queryText.trim == "*") return MatchAllQ
    val data = queryText.toCharArray
    val state = new State(data, 0, data.length)
    parseSubQuery(state, flags, defOp)
    if (state.top == null) BoolQ(Nil, Nil, Nil) // MatchNoDocs: empty boolean
    else toQuery(state.top)
  }

  private def toQuery(n: Node): Query = n match {
    case Leaf(q) => q
    case Bool(cs) =>
      val must = cs.collect { case (Must, c) => toQuery(c) }
      val should = cs.collect { case (Should, c) => toQuery(c) }
      val mustNot = cs.collect { case (MustNot, c) => toQuery(c) }
      if (must.size == 1 && should.isEmpty && mustNot.isEmpty) must.head
      else if (should.size == 1 && must.isEmpty && mustNot.isEmpty) should.head
      else BoolQ(must, should, mustNot)
  }

  private def has(flags: Int, f: Int): Boolean = (flags & f) != 0

  private def parseSubQuery(state: State, flags: Int, defOp: Occur): Unit = {
    while (state.index < state.length) {
      val c = state.data(state.index)
      if (c == '(' && has(flags, PrecedenceOperators)) {
        consumeSubQuery(state, flags, defOp)
        state.not = 0
      } else if (c == ')' && has(flags, PrecedenceOperators)) {
        state.index += 1; state.not = 0 // extraneous, ignored
      } else if (c == '"' && has(flags, PhraseOperator)) {
        consumePhrase(state, flags, defOp)
        state.not = 0
      } else if (c == '+' && has(flags, AndOperator)) {
        if (state.currentOp.isEmpty && state.top != null) state.currentOp = Some(Must)
        state.index += 1; state.not = 0
      } else if (c == '|' && has(flags, OrOperator)) {
        if (state.currentOp.isEmpty && state.top != null) state.currentOp = Some(Should)
        state.index += 1; state.not = 0
      } else if (c == '-' && has(flags, NotOperator)) {
        state.not += 1; state.index += 1 // NOT resets only on non-'-'
      } else if ((c == ' ' || c == '\t' || c == '\n' || c == '\r') &&
                 has(flags, WhitespaceOperator)) {
        state.index += 1; state.not = 0
      } else {
        consumeToken(state, flags, defOp)
        state.not = 0
      }
    }
  }

  private def consumeSubQuery(state: State, flags: Int, defOp: Occur): Unit = {
    val start = { state.index += 1; state.index }
    var precedence = 1
    var escaped = false
    var break = false
    while (!break && state.index < state.length) {
      if (!escaped) {
        val c = state.data(state.index)
        if (c == '\\' && has(flags, EscapeOperator)) {
          escaped = true; state.index += 1
        } else {
          if (c == '(') precedence += 1
          else if (c == ')') {
            precedence -= 1
            if (precedence == 0) break = true
          }
          if (!break) state.index += 1
        }
      } else { escaped = false; state.index += 1 }
    }
    if (state.index == state.length) {
      state.index = start // unbalanced: '(' is extraneous, reparse literally
    } else if (state.index == start) {
      state.currentOp = None; state.index += 1 // '()' resets the operation
    } else {
      val sub = new State(state.data, start, state.index)
      parseSubQuery(sub, flags, defOp)
      if (sub.top != null) buildQueryTree(state, sub.top, defOp)
      state.index += 1
    }
  }

  private def consumePhrase(state: State, flags: Int, defOp: Occur): Unit = {
    val start = { state.index += 1; state.index }
    val buf = new StringBuilder
    var escaped = false
    var hasSlop = false
    var break = false
    while (!break && state.index < state.length) {
      val c = state.data(state.index)
      if (!escaped && c == '\\' && has(flags, EscapeOperator)) {
        escaped = true; state.index += 1
      } else if (!escaped && c == '"') {
        if (state.length > state.index + 1 && state.data(state.index + 1) == '~' &&
            has(flags, NearOperator)) {
          state.index += 1
          if (state.length > state.index + 1) hasSlop = true
          break = true
        } else break = true
      } else {
        escaped = false
        buf.append(c); state.index += 1
      }
    }
    if (state.index == state.length && !break) {
      state.index = start // unterminated quote degrades literally
    } else if (buf.isEmpty && !hasSlop) {
      state.currentOp = None; state.index += 1 // empty phrase resets op
    } else {
      val slop = if (hasSlop) parseFuzziness(state, flags) else 0
      val terms = tokenize(buf.toString)
      if (terms.nonEmpty) {
        val q = if (terms.size == 1) TermQ(terms.head) else PhraseQ(terms, slop)
        buildQueryTree(state, Leaf(q), defOp)
      }
      state.index += 1 // the reference advances unconditionally (:349)
    }
  }

  private def consumeToken(state: State, flags: Int, defOp: Occur): Unit = {
    val buf = new StringBuilder
    var escaped = false
    var prefix = false
    var fuzzy = false
    var break = false
    while (!break && state.index < state.length) {
      val c = state.data(state.index)
      if (!escaped && c == '\\' && has(flags, EscapeOperator)) {
        escaped = true; prefix = false; state.index += 1
      } else if (!escaped && tokenFinished(state, flags)) {
        break = true
      } else if (!escaped && buf.nonEmpty && c == '~' && has(flags, FuzzyOperator)) {
        fuzzy = true; break = true
      } else {
        // the reference overwrites `prefix` on every char, so it ends up
        // true iff the LAST consumed char was an unescaped '*' (:384-388)
        prefix = !escaped && buf.nonEmpty && c == '*' && has(flags, PrefixOperator)
        escaped = false
        buf.append(c); state.index += 1
      }
    }
    if (buf.nonEmpty) {
      val q: Option[Query] =
        if (fuzzy) {
          val token = buf.toString
          val edits = math.min(parseFuzziness(state, flags), MaxEdits)
          val terms = tokenize(token)
          if (terms.isEmpty) None
          else if (edits == 0) Some(TermQ(terms.head))
          else Some(FuzzyQ(terms.head, edits))
        } else if (prefix) {
          val token = buf.toString.dropRight(1)
          val terms = tokenize(token)
          if (terms.isEmpty) None else Some(PrefixQ(terms.head))
        } else {
          val terms = tokenize(buf.toString)
          if (terms.isEmpty) None
          else if (terms.size == 1) Some(TermQ(terms.head))
          else Some(defOp match {
            // newDefaultQuery → QueryBuilder.createBooleanQuery: a token the
            // analyzer splits becomes a boolean of the parts under the
            // DEFAULT operator (not a phrase)
            case Must => BoolQ(terms.map(TermQ.apply), Nil, Nil)
            case _    => BoolQ(Nil, terms.map(TermQ.apply), Nil)
          })
        }
      q.foreach(x => buildQueryTree(state, Leaf(x), defOp))
    }
  }

  /** buildQueryTree (:435-480): negation wraps the branch as
    * (MUST_NOT branch, SHOULD MatchAll); an operation change pushes the
    * accumulated tree one level down before appending. */
  private def buildQueryTree(state: State, branch0: Node, defOp: Occur): Unit = {
    var branch = branch0
    if (state.not % 2 == 1)
      branch = Bool(Vector((MustNot, branch), (Should, Leaf(MatchAllQ))))
    if (state.top == null) state.top = branch
    else {
      val op = state.currentOp.getOrElse(defOp)
      val base: Bool =
        if (!state.previousOp.contains(op)) Bool(Vector((op, state.top)))
        else state.top.asInstanceOf[Bool]
      state.top = Bool(base.clauses :+ ((op, branch)))
      state.previousOp = Some(op)
    }
    state.currentOp = None
  }

  /** parseFuzziness (:482-521): digits until token end; empty → 2,
    * non-numeric or negative → 0. */
  private def parseFuzziness(state: State, flags: Int): Int = {
    if (state.index >= state.length || state.data(state.index) != '~') return 0
    val buf = new StringBuilder
    var break = false
    while (!break && state.index < state.length) {
      state.index += 1
      if (state.index < state.length) {
        if (tokenFinished(state, flags)) break = true
        else buf.append(state.data(state.index))
      }
    }
    val s = buf.toString
    if (s.isEmpty) 2
    else scala.util.Try(s.toInt).toOption.filter(_ >= 0).getOrElse(0)
  }

  private def tokenFinished(state: State, flags: Int): Boolean = {
    val c = state.data(state.index)
    (c == '"' && has(flags, PhraseOperator)) ||
      (c == '|' && has(flags, OrOperator)) ||
      (c == '+' && has(flags, AndOperator)) ||
      (c == '(' && has(flags, PrecedenceOperators)) ||
      (c == ')' && has(flags, PrecedenceOperators)) ||
      ((c == ' ' || c == '\t' || c == '\n' || c == '\r') && has(flags, WhitespaceOperator))
  }

  /** The default-query analysis step (newDefaultQuery → QueryBuilder): the
    * standard lowercase tokenization shared with the classic parser. */
  private def tokenize(text: String): Seq[String] =
    graft.analysis.Analyzer.terms(text)
}
