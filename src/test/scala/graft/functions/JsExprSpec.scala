package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity tests for the Lucene-expressions-style compiler: literal-only
  * expressions are evaluated through Spark and compared against values
  * computed with plain Java/Scala double arithmetic (the reference compiles
  * to JVM bytecode, so java.lang.Math IS its semantics). */
class JsExprSpec extends SparkSpec {

  private def eval(src: String): Double = {
    val r = spark.range(1).select(JsExpr.compile(src).as("v")).head()
    r.getDouble(0)
  }

  private def assertEval(src: String, expected: Double): Unit = {
    val got = eval(src)
    if (expected.isNaN) assert(got.isNaN, s"$src => $got, want NaN")
    else if (expected.isInfinity) assert(got == expected, s"$src => $got, want $expected")
    else assert(math.abs(got - expected) <= math.abs(expected) * 1e-12 + 1e-12,
      s"$src => $got, want $expected")
  }

  test("arithmetic precedence and associativity") {
    assertEval("2+3*4", 14.0)
    assertEval("(2+3)*4", 20.0)
    assertEval("2-3-4", -5.0)
    assertEval("2*3%4", 2.0)
    assertEval("7%3", 1.0)
    assertEval("-7%3", -7.0 % 3.0) // JVM DREM keeps the dividend sign
    assertEval("1/0", Double.PositiveInfinity)
    assertEval("0/0", Double.NaN)
    assertEval("-2*-3", 6.0)
    assertEval("1+2e3", 2001.0)
    assertEval("1e+2 + 1e-2", 100.01)
    assertEval(".5*4", 2.0)
  }

  test("hex and octal literals (Javascript.g4 HEX/OCTAL)") {
    assertEval("0xF", 15.0)
    assertEval("0x10", 16.0)
    assertEval("010", 8.0)
    assertEval("0", 0.0)
    assertEval("0.5", 0.5)
  }

  test("comparisons and equality push 1.0/0.0") {
    assertEval("3 < 4", 1.0)
    assertEval("4 <= 4", 1.0)
    assertEval("5 > 6", 0.0)
    assertEval("5 >= 6", 0.0)
    assertEval("2 == 2", 1.0)
    assertEval("2 != 2", 0.0)
    // chained: (1<2)=1.0, then 1.0<3 = 1.0
    assertEval("1 < 2 < 3", 1.0)
  }

  test("boolean ops use double->int truthiness (JavascriptCompiler pushes INT then IFEQ)") {
    assertEval("1 && 2", 1.0)
    assertEval("1 && 0", 0.0)
    assertEval("0 || 3", 1.0)
    assertEval("!0", 1.0)
    assertEval("!7", 0.0)
    // (int)0.5 == 0, so 0.5 is FALSE in a boolean context — reference semantics
    assertEval("0.5 ? 10 : 20", 20.0)
    assertEval("1.5 ? 10 : 20", 10.0)
    assertEval("0.5 && 1", 0.0)
    assertEval("!0.5", 1.0)
    // ternary is right-associative
    assertEval("1 ? 2 : 3 ? 4 : 5", 2.0)
    assertEval("0 ? 2 : 0 ? 4 : 5", 5.0)
  }

  test("bitwise ops operate on long casts") {
    assertEval("5|3", (5L | 3L).toDouble)
    assertEval("5&3", (5L & 3L).toDouble)
    assertEval("5^3", (5L ^ 3L).toDouble)
    assertEval("~5", (~5L).toDouble)
    assertEval("1<<3", (1L << 3).toDouble)
    assertEval("-8>>1", (-8L >> 1).toDouble)
    assertEval("-8>>>60", (-8L >>> 60).toDouble)
    // fractional operands truncate toward zero before the bit op (d2l)
    assertEval("5.9|3.2", (5L | 3L).toDouble)
    // shift count masked to 6 bits, like JVM LSHL
    assertEval("1<<65", (1L << 65).toDouble)
  }

  test("function table parity vs java.lang.Math / MathUtil") {
    assertEval("abs(-3.5)", 3.5)
    assertEval("ceil(2.1)", 3.0)
    assertEval("floor(2.9)", 2.0)
    assertEval("exp(1)", math.exp(1))
    assertEval("ln(10)", math.log(10))
    assertEval("log10(1000)", 3.0)
    assertEval("logn(2, 8)", 3.0) // MathUtil.log(base, x) argument order
    assertEval("sqrt(2)", math.sqrt(2))
    assertEval("pow(2, 10)", 1024.0)
    assertEval("min(3, 4)", 3.0)
    assertEval("max(3, 4)", 4.0)
    assertEval("sin(0.5)", math.sin(0.5))
    assertEval("cos(0.5)", math.cos(0.5))
    assertEval("tan(0.5)", math.tan(0.5))
    assertEval("asin(0.5)", math.asin(0.5))
    assertEval("acos(0.5)", math.acos(0.5))
    assertEval("atan(0.5)", math.atan(0.5))
    assertEval("atan2(1, 2)", math.atan2(1, 2))
    assertEval("sinh(0.5)", math.sinh(0.5))
    assertEval("cosh(0.5)", math.cosh(0.5))
    assertEval("tanh(0.5)", math.tanh(0.5))
    // MathUtil hyperbolic inverses (sign-symmetric forms)
    assertEval("asinh(0.5)", math.log(math.sqrt(0.5 * 0.5 + 1) + 0.5))
    assertEval("asinh(-0.5)", -math.log(math.sqrt(0.5 * 0.5 + 1) + 0.5))
    assertEval("acosh(2)", math.log(math.sqrt(2.0 * 2.0 - 1) + 2.0))
    assertEval("atanh(0.5)", 0.5 * math.log(1.5 / 0.5))
    assertEval("atanh(-0.5)", -0.5 * math.log(1.5 / 0.5))
  }

  test("haversin returns kilometers (SloppyMath.haversinKilometers)") {
    // NYC city hall -> Empire State Building, the classic Lucene test pair
    val (lat1, lon1, lat2, lon2) = (40.7143528, -74.0059731, 40.759011, -73.9844722)
    val x1 = math.toRadians(lat1); val x2 = math.toRadians(lat2)
    val h = (1 - math.cos(x1 - x2)) +
      math.cos(x1) * math.cos(x2) * (1 - math.cos(math.toRadians(lon1 - lon2)))
    val expected = 6371.0087714 * 2 * math.asin(math.min(1, math.sqrt(h * 0.5)))
    assertEval(s"haversin($lat1, $lon1, $lat2, $lon2)", expected)
    assert(expected > 5.0 && expected < 5.5) // ~5.28 km sanity
  }

  test("variables bind to columns; expression runs as one codegen projection") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 2.0), (2L, 20.0, 3.0), (3L, 0.0, 4.0)).toDF("id", "popularity", "boost")
    val c = JsExpr.compile("ln(popularity + 1) * boost + (popularity > 5 ? 1 : 0)")
    val got = df.select($"id", c.as("v")).orderBy("id").as[(Long, Double)].collect()
    val want = Seq(
      1L -> (math.log(11.0) * 2.0 + 1.0),
      2L -> (math.log(21.0) * 3.0 + 1.0),
      3L -> (math.log(1.0) * 4.0 + 0.0))
    got.zip(want).foreach { case ((gi, gv), (wi, wv)) =>
      assert(gi == wi && math.abs(gv - wv) < 1e-12, s"id=$gi got=$gv want=$wv")
    }
  }

  test("custom bindings map names like _score") {
    import spark.implicits._
    val df = Seq((1L, 0.5f), (2L, 2.0f)).toDF("id", "score")
    val c = JsExpr.compile("_score * 2 + doc.len", {
      case "_score"  => col("score")
      case "doc.len" => lit(10.0)
      case other     => throw new IllegalArgumentException(other)
    })
    val got = df.select(c.as("v")).orderBy("id").as[Double].collect()
    assert(got.toSeq == Seq(11.0, 14.0))
  }

  test("parse errors are typed with positions") {
    def bad(src: String): JsExpr.ExprParseException =
      intercept[JsExpr.ExprParseException](JsExpr.compile(src))
    assert(bad("nosuchfn(1)").getMessage.contains("unrecognized function"))
    assert(bad("pow(1)").getMessage.contains("expects 2"))
    assert(bad("1 +").getMessage.nonEmpty)
    assert(bad("(1 + 2").getMessage.contains("expected ')'"))
    assert(bad("1 2").getMessage.contains("trailing"))
    assert(bad("0x").getMessage.contains("hex"))
    assert(bad("09").getMessage.contains("octal"))
    assert(bad("@").getMessage.contains("unexpected character"))
  }

  test("constant subexpressions fold out of the plan") {
    val df = spark.range(2).select(JsExpr.compile("pow(2, 10) + sqrt(16)").as("v"))
    // after optimization the projection is a literal — no function calls left
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("1028.0"), optimized)
  }

  test("frange: per-bound inclusivity on the compiled function value; constant score") {
    import spark.implicits._
    val df = Seq((1L, 4.0), (2L, 9.0), (3L, 16.0), (4L, 25.0)).toDF("id", "x")
    // sqrt(x) in [2, 4) -> ids 1 (2.0), 2 (3.0); 3 excluded by exclusive upper
    val got = JsExpr.frange(df, "sqrt(x)", l = Some(2.0), u = Some(4.0), incu = false)
      .select("id", "score").collect().map(r => (r.getLong(0), r.getFloat(1))).toSeq.sorted
    assert(got == Seq((1L, 1f), (2L, 1f)))
    // open lower bound: only u
    val upper = JsExpr.frange(df, "sqrt(x)", u = Some(3.0)).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(upper == Set(1L, 2L))
    // boost is the constant score
    assert(JsExpr.frange(df, "x", l = Some(25.0), boost = 2.5f)
      .select("score").head().getFloat(0) == 2.5f)
  }
}
