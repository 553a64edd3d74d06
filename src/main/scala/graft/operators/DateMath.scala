package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Solr date-math grammar (reference solr/core/src/java/org/apache/solr/util/
 * DateMathParser.java): expressions like `NOW-7DAYS/DAY`, `NOW/HOUR+30MINUTES`
 * compiled to Column arithmetic — each `+N UNIT` / `-N UNIT` is an interval
 * add, each `/UNIT` truncates (rounds down) to the unit, applied left to
 * right exactly as the reference's charAt loop does.
 */
object DateMath {

  private val Units = Map(
    "YEAR" -> "year", "YEARS" -> "year",
    "MONTH" -> "month", "MONTHS" -> "month",
    "DAY" -> "day", "DAYS" -> "day", "DATE" -> "day",
    "HOUR" -> "hour", "HOURS" -> "hour",
    "MINUTE" -> "minute", "MINUTES" -> "minute",
    "SECOND" -> "second", "SECONDS" -> "second")

  private val Op = "([+\\-/])(\\d*)([A-Z]+)".r

  /**
   * Compile a date-math string against a base timestamp column (the `NOW`).
   * `parse("NOW-7DAYS/DAY", col("ts"))` ≡ `date_trunc("day", ts - 7 days)`.
   */
  def parse(expr: String, now: Column): Column = {
    require(expr.startsWith("NOW"), s"date math must start with NOW: $expr")
    val rest = expr.drop(3)
    val ops = Op.findAllMatchIn(rest).toSeq
    val consumed = ops.map(_.matched).mkString
    require(consumed == rest, s"unparsable date math: '$expr' (bad part: '${rest.stripPrefix(consumed)}')")
    ops.foldLeft(now) { (acc, m) =>
      val (op, nStr, unitStr) = (m.group(1), m.group(2), m.group(3))
      val unit = Units.getOrElse(unitStr,
        throw new IllegalArgumentException(s"unknown date-math unit $unitStr in $expr"))
      op match {
        case "/" =>
          require(nStr.isEmpty, s"rounding takes no count: $expr")
          date_trunc(unit, acc)
        case "+" => acc + expr_interval(nStr.toInt, unit)
        case "-" => acc - expr_interval(nStr.toInt, unit)
      }
    }
  }

  private def expr_interval(n: Int, unit: String): Column =
    expr(s"INTERVAL $n ${unit.toUpperCase}")
}
