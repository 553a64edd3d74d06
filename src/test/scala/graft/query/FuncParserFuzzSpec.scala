package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fuzz: random function-query expressions rendered to Solr syntax,
  * compiled through FuncParser/Catalyst, and compared BIT-EXACTLY against
  * a local JVM interpreter with the same IEEE semantics (JvmDiv ∞-on-zero
  * included). Catalyst's constant folding and codegen must not change a
  * single ulp anywhere in the arithmetic subset. */
class FuncParserFuzzSpec extends SparkSpec {

  private sealed trait N
  private case class C(v: Double) extends N
  private case object V extends N
  private case class Op(name: String, args: List[N]) extends N

  private def gen(rnd: scala.util.Random, depth: Int): N =
    if (depth == 0) {
      if (rnd.nextBoolean()) V
      else C(math.rint((rnd.nextDouble() - 0.5) * 200) / 4) // mix of signs/fractions
    } else rnd.nextInt(10) match {
      case 0 => Op("sum", List.fill(2 + rnd.nextInt(2))(gen(rnd, depth - 1)))
      case 1 => Op("sub", List(gen(rnd, depth - 1), gen(rnd, depth - 1)))
      case 2 => Op("product", List(gen(rnd, depth - 1), gen(rnd, depth - 1)))
      case 3 => Op("div", List(gen(rnd, depth - 1), gen(rnd, depth - 1)))
      case 4 => Op("abs", List(gen(rnd, depth - 1)))
      case 5 => Op("max", List(gen(rnd, depth - 1), gen(rnd, depth - 1)))
      case 6 => Op("min", List(gen(rnd, depth - 1), gen(rnd, depth - 1)))
      case 7 => Op("linear", List(gen(rnd, depth - 1),
        C(rnd.nextInt(9) - 4), C(rnd.nextInt(9) - 4)))
      case 8 => Op("recip", List(gen(rnd, depth - 1),
        C(1 + rnd.nextInt(3)), C(1 + rnd.nextInt(50)), C(1 + rnd.nextInt(20))))
      case 9 => Op("map", List(gen(rnd, depth - 1),
        C(-50), C(50), C(rnd.nextInt(7)), C(-1)))
    }

  private def render(n: N): String = n match {
    case C(v) => v.toString
    case V => "value"
    case Op(name, args) => args.map(render).mkString(s"$name(", ",", ")")
  }

  private def local(n: N, x: Double): Double = n match {
    case C(v) => v
    case V => x
    case Op("sum", as) => as.map(local(_, x)).reduce(_ + _)
    case Op("sub", List(a, b)) => local(a, x) - local(b, x)
    case Op("product", List(a, b)) => local(a, x) * local(b, x)
    case Op("div", List(a, b)) => local(a, x) / local(b, x) // JVM: ∞/NaN on zero
    case Op("abs", List(a)) => math.abs(local(a, x))
    case Op("max", List(a, b)) => math.max(local(a, x), local(b, x))
    case Op("min", List(a, b)) => math.min(local(a, x), local(b, x))
    case Op("linear", List(a, C(m), C(c))) => m * local(a, x) + c
    case Op("recip", List(a, C(m), C(aa), C(b))) => aa / (m * local(a, x) + b)
    case Op("map", List(a, C(lo), C(hi), C(t), C(d))) =>
      val v = local(a, x); if (v >= lo && v <= hi) t else d
    case other => throw new IllegalStateException(other.toString)
  }

  test("200 random expressions: Catalyst lowering == JVM interpreter, bit-exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260820L)
    val xs = Seq.tabulate(17)(i => (i.toLong, (i - 8) * 3.25))
    val df = xs.toDF("doc_id", "value")
    var checked = 0
    (1 to 200).foreach { _ =>
      val ast = gen(rnd, 1 + rnd.nextInt(3))
      val src = render(ast)
      val c = FuncParser.compile(df, src)
      val got = c.df.select(col("doc_id"), c.value.cast("double").as("v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      xs.foreach { case (id, x) =>
        val want = local(ast, x)
        val g = got(id)
        assert(java.lang.Double.doubleToLongBits(g) ==
          java.lang.Double.doubleToLongBits(want) ||
          (g.isNaN && want.isNaN),
          s"$src at value=$x: got $g want $want")
        checked += 1
      }
    }
    assert(checked == 200 * xs.size)
  }

  test("greatest/least propagate like math.max/min on NaN-free inputs only") {
    // documented divergence guard: Spark greatest/least SKIP nulls but the
    // generator never produces null; max(NaN, x): JVM math.max returns NaN,
    // Spark greatest returns NaN too (NaN is greatest in Spark ordering) —
    // pin the one case where orderings could differ
    import spark.implicits._
    val df = Seq((1L, Double.NaN)).toDF("doc_id", "value")
    val c = FuncParser.compile(df, "max(value,1)")
    val g = c.df.select(c.value.cast("double")).collect()(0).getDouble(0)
    assert(g.isNaN == math.max(Double.NaN, 1.0).isNaN)
  }
}
