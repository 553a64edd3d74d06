package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * RangeField queries (reference lucene/core/src/java/org/apache/lucene/
 * document/{DoubleRange.java:39-232, RangeFieldQuery.java:48-200} and
 * Solr's DateRangeField capability): docs carry interval values — one
 * [min,max] per dimension, up to 4 dims — and queries relate a search
 * range to them:
 *
 *  - INTERSECTS: every dimension overlaps (docMin ≤ qMax ∧ docMax ≥ qMin)
 *  - WITHIN: the doc range lies inside the query range in every dim
 *  - CONTAINS: the doc range contains the query range in every dim
 *  - CROSSES: intersects but NOT within (RangeFieldQuery.CROSSES.matches)
 *
 * Spark-first: ranges are plain (min,max) column pairs — the BKD encoding
 * the reference needs for its tree is unnecessary when the predicates are
 * codegen comparisons that push into the parquet scan and prune row
 * groups via min/max stats. Date ranges are the same machinery over
 * timestamp/epoch columns (Solr DateRangeField is a 1-D range per its
 * own docs).
 */
object RangeField {

  /** Per-dimension doc range columns: (minCol, maxCol). */
  type Dims = Seq[(Column, Column)]

  def intersects(dims: Dims, qMin: Seq[Double], qMax: Seq[Double]): Column =
    check(dims, qMin, qMax) { case ((lo, hi), (qlo, qhi)) =>
      lo <= qhi && hi >= qlo
    }

  def within(dims: Dims, qMin: Seq[Double], qMax: Seq[Double]): Column =
    check(dims, qMin, qMax) { case ((lo, hi), (qlo, qhi)) =>
      lo >= qlo && hi <= qhi
    }

  def contains(dims: Dims, qMin: Seq[Double], qMax: Seq[Double]): Column =
    check(dims, qMin, qMax) { case ((lo, hi), (qlo, qhi)) =>
      lo <= qlo && hi >= qhi
    }

  def crosses(dims: Dims, qMin: Seq[Double], qMax: Seq[Double]): Column =
    intersects(dims, qMin, qMax) && !within(dims, qMin, qMax)

  private def check(dims: Dims, qMin: Seq[Double], qMax: Seq[Double])
                   (pred: (((Column, Column), (Double, Double))) => Column): Column = {
    require(dims.nonEmpty && dims.size == qMin.size && qMin.size == qMax.size,
      s"RangeField: ${dims.size} dims need matching query bounds")
    require(dims.size <= 4, "RangeField supports up to 4 dimensions (reference cap)")
    dims.zip(qMin.zip(qMax)).map(pred).reduce(_ && _)
  }

  /** All four relations at once as int flag columns — the shape the
    * indexed-shape relations use (Geo.shapeRelations). */
  def relations(df: DataFrame, dims: Dims,
                qMin: Seq[Double], qMax: Seq[Double]): DataFrame =
    df.withColumn("intersects", intersects(dims, qMin, qMax).cast("int"))
      .withColumn("within", within(dims, qMin, qMax).cast("int"))
      .withColumn("contains", contains(dims, qMin, qMax).cast("int"))
      .withColumn("crosses", crosses(dims, qMin, qMax).cast("int"))
}
