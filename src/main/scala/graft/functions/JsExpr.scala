package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lucene expressions module (lucene/expressions): the JavaScript-like
  * numeric expression language compiled to a scoring value source.
  *
  * Reference grammar and semantics:
  *   - `expressions/js/package-info.java:18-41` — operator/function surface
  *   - `expressions/js/JavascriptCompiler.java:330-600` — all arithmetic is
  *     double; boolean contexts cast the operand double→int and test != 0
  *     (so `0.5 ? a : b` picks `b`); comparisons/logical ops push 1.0/0.0;
  *     bitwise ops cast double→long, operate, cast back.
  *   - `expressions/js/JavascriptCompiler.properties` — the DEFAULT_FUNCTIONS
  *     table (abs..tanh, `logn(base,x)` = MathUtil.log, `haversin` =
  *     SloppyMath.haversinKilometers).
  *
  * The reference compiles to JVM bytecode per-document; here the same grammar
  * compiles to a Catalyst `Column` tree, so the expression runs inside
  * whole-stage codegen over the whole DataFrame — no UDF, no per-row
  * interpretation, and Catalyst constant-folds literal subtrees. At 100 TB an
  * expression like `ln(popularity+1)*_score` is just more fused projection.
  *
  * Deviation: `haversin` uses exact `cos`/`asin` rather than SloppyMath's
  * table-driven approximations (error ~1e-15 per SloppyMath.java docs).
  */
object JsExpr {

  import org.apache.spark.sql.graftbridge.{columnOf, exprOf}
  import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode}
  import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

  final case class ExprParseException(msg: String, pos: Int)
    extends RuntimeException(s"$msg at position $pos")

  // The reference compiles to raw JVM double bytecode: 1/0 is Infinity, DREM
  // keeps the dividend sign, d2i/d2l truncate and saturate. Spark 4 defaults
  // to ANSI mode, which instead THROWS on zero divisors and overflowing
  // casts — so divide/remainder/cast are built in legacy eval mode to keep
  // bytecode semantics regardless of the session's ansi setting.
  private def jdiv(a: Column, b: Column): Column =
    columnOf(JvmDiv(exprOf(a.cast("double")), exprOf(b.cast("double"))))
  private def jrem(a: Column, b: Column): Column =
    columnOf(JvmRem(exprOf(a.cast("double")), exprOf(b.cast("double"))))
  private def jcast(c: Column, t: DataType): Column =
    columnOf(Cast(exprOf(c), t, None, EvalMode.LEGACY))

  /** Compile `src` binding every free variable through `bind`.
    * Variable names may contain dots and digits (VariableContext-style
    * `a.b` paths are passed through whole; bracketed indices are not
    * supported — flatten them into the binding name).
    */
  def compile(src: String, bind: String => Column): Column =
    new Parser(src, bind).compileTop()

  /** Compile with the SimpleBindings-style default: each variable is the
    * column of the same name (dots become nested-field access via `col`). */
  def compile(src: String): Column = compile(src, name => col(name))

  /** ExpressionRescorer.java equivalent: rescore the top `rescoreDocs`
    * first-pass hits with a compiled expression. `_score` binds to the
    * first-pass score (SimpleBindings SortField.FIELD_SCORE); any other
    * variable binds to the same-named column of `fields`.
    *
    * Plan shape: the first pass is TakeOrderedAndProject (bounded heap, k
    * rows), so the join against `fields` broadcasts the tiny hit side —
    * `fields` is never shuffled, which is what makes rescoring cheap on a
    * 100 TB doc store.
    */
  def rescore(hits: org.apache.spark.sql.DataFrame,
              fields: org.apache.spark.sql.DataFrame,
              idCol: String, scoreCol: String,
              exprSrc: String, rescoreDocs: Int): org.apache.spark.sql.DataFrame = {
    // aliases keep the join unambiguous when `hits` derives from `fields`
    // (e.g. a first pass computed over the same doc table)
    val top = hits
      .orderBy(col(scoreCol).desc, col(idCol).asc)
      .limit(rescoreDocs)
      .select(col(idCol), col(scoreCol).as("first_pass"))
      .as("__hits")
    val f = fields.as("__fields")
    val c = compile(exprSrc, {
      case "_score" => col("first_pass")
      case other    => col(s"__fields.$other")
    })
    broadcast(top).join(f, col(s"__hits.$idCol") === col(s"__fields.$idCol"))
      .select(col(s"__hits.$idCol").as(idCol), c.as("score"), col("first_pass"))
  }

  /** Solr `{!frange}` — FunctionRangeQParserPlugin.java +
    * ValueSourceRangeFilter (solr/core .../search/function/
    * ValueSourceRangeFilter.java:40-61): keep docs whose compiled function
    * value lies within [l, u] with per-bound inclusivity; matches score a
    * constant `boost` (the reference wraps the filter constant-score).
    * The function compiles to a codegen Column, so the range predicate is
    * a plain WHERE — prunable and pushdown-eligible, never a UDF. */
  def frange(df: org.apache.spark.sql.DataFrame, exprSrc: String,
             l: Option[Double] = None, u: Option[Double] = None,
             incl: Boolean = true, incu: Boolean = true,
             boost: Float = 1f): org.apache.spark.sql.DataFrame = {
    val v = compile(exprSrc)
    val lo = l.map(x => if (incl) v >= lit(x) else v > lit(x)).getOrElse(lit(true))
    val hi = u.map(x => if (incu) v <= lit(x) else v < lit(x)).getOrElse(lit(true))
    df.filter(lo && hi).withColumn("score", lit(boost))
  }

  // ---- semantics helpers (JavascriptCompiler.java:330-600) ----

  /** Boolean context: cast double→int, test != 0 (reference pushes
    * Type.INT_TYPE then IFEQ). */
  private def truthy(c: Column): Column = jcast(c, IntegerType) =!= 0

  /** Comparisons and logical ops evaluate to 1.0 / 0.0 (pushBoolean). */
  private def asDouble(b: Column): Column = when(b, 1.0d).otherwise(0.0d)

  private def bitwise(a: Column, b: Column)(op: (Column, Column) => Column): Column =
    op(jcast(a, LongType), jcast(b, LongType)).cast("double")

  /** Earth mean radius used by SloppyMath.haversinKilometers. */
  private val ToKilometers = 6371.0087714d

  private def haversinKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val x1 = radians(lat1)
    val x2 = radians(lat2)
    val h1 = lit(1.0d) - cos(x1 - x2)
    val h2 = lit(1.0d) - cos(radians(lon1 - lon2))
    val h = h1 + cos(x1) * cos(x2) * h2
    lit(ToKilometers * 2) * asin(least(lit(1.0d), sqrt(h * 0.5d)))
  }

  /** name -> (arity, builder); JavascriptCompiler.properties order. */
  private val Functions: Map[String, (Int, Seq[Column] => Column)] = Map(
    "abs"      -> (1, a => abs(a(0))),
    "acos"     -> (1, a => acos(a(0))),
    "acosh"    -> (1, a => log(sqrt(a(0) * a(0) - 1.0d) + a(0))),
    "asin"     -> (1, a => asin(a(0))),
    "asinh"    -> (1, a => {
      // MathUtil.asinh: sign-symmetric log(sqrt(x^2+1)+|x|)
      val x = abs(a(0))
      signum(a(0)) * log(sqrt(x * x + 1.0d) + x)
    }),
    "atan"     -> (1, a => atan(a(0))),
    "atan2"    -> (2, a => atan2(a(0), a(1))),
    "atanh"    -> (1, a => {
      // MathUtil.atanh: 0.5*log((1+x)/(1-x)), sign-symmetric
      val x = abs(a(0))
      signum(a(0)) * lit(0.5d) * log(jdiv(lit(1.0d) + x, lit(1.0d) - x))
    }),
    "ceil"     -> (1, a => ceil(a(0)).cast("double")),
    "cos"      -> (1, a => cos(a(0))),
    "cosh"     -> (1, a => cosh(a(0))),
    "exp"      -> (1, a => exp(a(0))),
    "floor"    -> (1, a => floor(a(0)).cast("double")),
    "haversin" -> (4, a => haversinKm(a(0), a(1), a(2), a(3))),
    "ln"       -> (1, a => log(a(0))),
    "log10"    -> (1, a => log10(a(0))),
    "logn"     -> (2, a => jdiv(log(a(1)), log(a(0)))), // MathUtil.log(base, x)
    "max"      -> (2, a => greatest(a(0), a(1))),
    "min"      -> (2, a => least(a(0), a(1))),
    "pow"      -> (2, a => pow(a(0), a(1))),
    "sin"      -> (1, a => sin(a(0))),
    "sinh"     -> (1, a => sinh(a(0))),
    "sqrt"     -> (1, a => sqrt(a(0))),
    "tan"      -> (1, a => tan(a(0))),
    "tanh"     -> (1, a => tanh(a(0)))
  )

  // ---- recursive-descent parser (precedence per Javascript.g4) ----

  private final class Parser(src: String, bind: String => Column) {
    private var pos = 0

    def compileTop(): Column = {
      val c = ternary()
      skipWs()
      if (pos < src.length) fail(s"unexpected trailing input '${src.substring(pos)}'")
      c.cast("double")
    }

    private def fail(msg: String): Nothing = throw ExprParseException(msg, pos)

    private def skipWs(): Unit =
      while (pos < src.length && Character.isWhitespace(src.charAt(pos))) pos += 1

    private def peek(): Char = if (pos < src.length) src.charAt(pos) else '\u0000'

    /** Consume `s` if it is next (after ws) and NOT followed by `notFollowed`. */
    private def eat(s: String, notFollowed: String = ""): Boolean = {
      skipWs()
      if (src.startsWith(s, pos)) {
        val nxt = pos + s.length
        if (notFollowed.nonEmpty && nxt < src.length && notFollowed.indexOf(src.charAt(nxt)) >= 0) false
        else { pos += s.length; true }
      } else false
    }

    private def expect(s: String): Unit =
      if (!eat(s)) fail(s"expected '$s'")

    // cond ? a : b — right-associative, lowest precedence
    private def ternary(): Column = {
      val c = boolOr()
      if (eat("?")) {
        val t = ternary()
        expect(":")
        val f = ternary()
        when(truthy(c), t).otherwise(f)
      } else c
    }

    private def boolOr(): Column = {
      var l = boolAnd()
      while (eat("||")) l = asDouble(truthy(l) || truthy(boolAnd()))
      l
    }

    private def boolAnd(): Column = {
      var l = bwOr()
      while (eat("&&")) l = asDouble(truthy(l) && truthy(bwOr()))
      l
    }

    private def bwOr(): Column = {
      var l = bwXor()
      while (eat("|", notFollowed = "|")) l = bitwise(l, bwXor())(_.bitwiseOR(_))
      l
    }

    private def bwXor(): Column = {
      var l = bwAnd()
      while (eat("^")) l = bitwise(l, bwAnd())(_.bitwiseXOR(_))
      l
    }

    private def bwAnd(): Column = {
      var l = equality()
      while (eat("&", notFollowed = "&")) l = bitwise(l, equality())(_.bitwiseAND(_))
      l
    }

    private def equality(): Column = {
      var l = comparison()
      var go = true
      while (go) {
        if (eat("==")) l = asDouble(l === comparison())
        else if (eat("!=")) l = asDouble(l =!= comparison())
        else go = false
      }
      l
    }

    private def comparison(): Column = {
      var l = shift()
      var go = true
      while (go) {
        if (eat("<=")) l = asDouble(l <= shift())
        else if (eat(">=")) l = asDouble(l >= shift())
        else if (eat("<", notFollowed = "<")) l = asDouble(l < shift())
        else if (eat(">", notFollowed = ">")) l = asDouble(l > shift())
        else go = false
      }
      l
    }

    private def shift(): Column = {
      var l = addSub()
      var go = true
      while (go) {
        // JVM long shifts mask the count to 6 bits; Spark's shiftleft/right
        // delegate to the same Java operators, so semantics line up.
        if (eat("<<")) l = call_function("shiftleft", jcast(l, LongType), jcast(addSub(), IntegerType)).cast("double")
        else if (eat(">>>")) l = call_function("shiftrightunsigned", jcast(l, LongType), jcast(addSub(), IntegerType)).cast("double")
        else if (eat(">>")) l = call_function("shiftright", jcast(l, LongType), jcast(addSub(), IntegerType)).cast("double")
        else go = false
      }
      l
    }

    private def addSub(): Column = {
      var l = mulDiv()
      var go = true
      while (go) {
        if (eat("+")) l = l + mulDiv()
        else if (eat("-")) l = l - mulDiv()
        else go = false
      }
      l
    }

    private def mulDiv(): Column = {
      var l = unary()
      var go = true
      while (go) {
        if (eat("*")) l = l * unary()
        else if (eat("/")) l = jdiv(l, unary())
        else if (eat("%")) l = jrem(l, unary())
        else go = false
      }
      l
    }

    private def unary(): Column = {
      skipWs()
      if (eat("!")) asDouble(!truthy(unary()))
      else if (eat("~")) bitwise(unary(), lit(-1.0d))(_.bitwiseXOR(_))
      else if (eat("-")) -unary()
      else if (eat("+")) unary()
      else primary()
    }

    private def primary(): Column = {
      skipWs()
      val c = peek()
      if (c == '(') {
        pos += 1
        val e = ternary()
        expect(")")
        e
      } else if (Character.isDigit(c) || (c == '.' && pos + 1 < src.length && Character.isDigit(src.charAt(pos + 1)))) {
        number()
      } else if (Character.isLetter(c) || c == '_') {
        identifierOrCall()
      } else fail(s"unexpected character '$c'")
    }

    /** Decimal / float / 0x hex / 0 octal literals (Javascript.g4 HEX/OCTAL/DECIMAL). */
    private def number(): Column = {
      val start = pos
      if (src.startsWith("0x", pos) || src.startsWith("0X", pos)) {
        pos += 2
        while (pos < src.length && isHex(src.charAt(pos))) pos += 1
        if (pos == start + 2) fail("malformed hex literal")
        lit(java.lang.Long.parseLong(src.substring(start + 2, pos), 16).toDouble)
      } else {
        var seenDot = false; var seenExp = false
        while (pos < src.length && {
          val ch = src.charAt(pos)
          if (Character.isDigit(ch)) true
          else if (ch == '.' && !seenDot && !seenExp) { seenDot = true; true }
          else if ((ch == 'e' || ch == 'E') && !seenExp && pos > start) {
            seenExp = true
            if (pos + 1 < src.length && (src.charAt(pos + 1) == '+' || src.charAt(pos + 1) == '-')) pos += 1
            true
          } else false
        }) pos += 1
        val text = src.substring(start, pos)
        // leading-0 integer with no dot/exponent is octal in the reference grammar
        if (!seenDot && !seenExp && text.length > 1 && text.charAt(0) == '0') {
          if (!text.drop(1).forall(ch => ch >= '0' && ch <= '7')) fail(s"malformed octal literal '$text'")
          lit(java.lang.Long.parseLong(text.drop(1), 8).toDouble)
        } else {
          val v = try text.toDouble catch {
            case _: NumberFormatException => fail(s"malformed numeric literal '$text'")
          }
          lit(v)
        }
      }
    }

    private def isHex(c: Char): Boolean =
      Character.isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    private def identifierOrCall(): Column = {
      val start = pos
      while (pos < src.length && {
        val ch = src.charAt(pos)
        Character.isLetterOrDigit(ch) || ch == '_' || ch == '.'
      }) pos += 1
      val name = src.substring(start, pos)
      skipWs()
      if (peek() == '(') {
        pos += 1
        val args = scala.collection.mutable.ArrayBuffer.empty[Column]
        skipWs()
        if (peek() != ')') {
          args += ternary()
          while (eat(",")) args += ternary()
        }
        expect(")")
        Functions.get(name) match {
          case Some((arity, build)) =>
            if (args.size != arity)
              fail(s"function '$name' expects $arity argument(s), got ${args.size}")
            build(args.toSeq)
          case None => fail(s"unrecognized function call ($name)")
        }
      } else bind(name).cast("double")
    }
  }
}
