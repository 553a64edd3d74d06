package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Learning-to-rank re-scoring (reference: Solr's LTR plugin,
 * solr/contrib/ltr — FeatureLogger feature extraction + LinearModel
 * re-ranking of the top-N first-pass window).
 *
 * Spark-first shape: the first-pass window is a bounded top-N
 * (TakeOrderedAndProject — per-partition heaps, never a global sort);
 * feature extraction joins that TINY window against the feature source
 * with the window side broadcast, so at 100 TB the big table is probed
 * by a broadcast hash join instead of shuffled; the model itself is pure
 * arithmetic in whole-stage codegen.
 */
object Ltr {

  /** Linear scoring model: score = intercept + Σ weight_i · feature_i.
    * (Solr LinearModel, the default LTR model class.) */
  case class LinearModel(weights: Seq[(String, Double)], intercept: Double = 0.0) {
    def score: Column =
      weights.foldLeft(lit(intercept)) { case (acc, (name, w)) =>
        acc + coalesce(col(name).cast("double"), lit(0.0)) * w
      }
  }

  /**
   * Re-rank the top-`n` of `firstPass` (idCol, scoreCol, ...) by a linear
   * model over features computed from `featureSource` columns. The
   * first-pass score is itself exposed as feature `first_pass`. Output:
   * (idCol, first_pass, ltr_score) ordered (ltr_score DESC, id ASC).
   */
  def rescore(firstPass: DataFrame, idCol: String, scoreCol: String,
              featureSource: DataFrame, features: Seq[(String, Column)],
              model: LinearModel, n: Int): DataFrame = {
    val top = firstPass
      .orderBy(desc(scoreCol), asc(idCol)).limit(n)
      .select(col(idCol), col(scoreCol).cast("double").as("first_pass"))
    val feats = featureSource.select(
      col(idCol) +: features.map { case (nm, c) => c.as(nm) }: _*)
    // inner join is exact here: every first-pass doc exists in the source
    feats.join(broadcast(top), Seq(idCol))
      .withColumn("ltr_score", round(model.score, 5))
      .select(col(idCol), round(col("first_pass"), 5).as("first_pass"), col("ltr_score"))
      .orderBy(desc("ltr_score"), asc(idCol))
  }
}
