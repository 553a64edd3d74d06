package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Geo-distance operators (reference LatLonPoint capability,
 * lucene/core/src/java/org/apache/lucene/document/LatLonPoint.java —
 * newDistanceQuery / nearest): haversine arithmetic as pure codegen
 * Column expressions, so radius filters and distance-sorted top-k ride
 * the normal pushdown/TakeOrderedAndProject machinery.
 *
 * Scale note: Lucene prunes with a BKD tree; the Spark-native analogue is
 * a coarse bounding-box pre-filter (cheap comparisons that push into the
 * parquet scan and enable file/row-group min-max pruning when the table
 * is spatially clustered) followed by exact haversine on survivors —
 * [[withinRadius]] composes exactly that.
 */
object Geo {

  val EarthRadiusMeters: Double = 6371008.8

  /** Haversine great-circle distance in meters (double, codegen). */
  def haversineMeters(latA: Column, lonA: Column, latB: Column, lonB: Column): Column = {
    val dLat = radians(latB - latA)
    val dLon = radians(lonB - lonA)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(latA)) * cos(radians(latB)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusMeters) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Coarse bounding-box predicate around (lat, lon) with `radiusM`:
    * the pushdown-friendly pre-filter (superset of the true circle). */
  def boundingBox(latCol: Column, lonCol: Column,
                  lat: Double, lon: Double, radiusM: Double): Column = {
    val dLat = math.toDegrees(radiusM / EarthRadiusMeters)
    val dLon = math.toDegrees(radiusM / (EarthRadiusMeters *
      math.max(0.01, math.cos(math.toRadians(lat)))))
    latCol.between(lat - dLat, lat + dLat) && lonCol.between(lon - dLon, lon + dLon)
  }

  /** Exact radius filter behind the coarse box (LatLonPoint
    * newDistanceQuery): rows within `radiusM` of (lat, lon), with the
    * exact distance attached. */
  def withinRadius(df: DataFrame, latCol: String, lonCol: String,
                   lat: Double, lon: Double, radiusM: Double): DataFrame =
    df.filter(boundingBox(col(latCol), col(lonCol), lat, lon, radiusM))
      .withColumn("dist_m",
        haversineMeters(col(latCol), col(lonCol), lit(lat), lit(lon)))
      .filter(col("dist_m") <= radiusM)

  /** Distance-sorted top-k (LatLonPoint nearest): bounded heap via
    * orderBy(dist).limit(k), idCol tie-break for determinism. */
  def nearest(df: DataFrame, idCol: String, latCol: String, lonCol: String,
              lat: Double, lon: Double, k: Int): DataFrame =
    df.withColumn("dist_m",
        haversineMeters(col(latCol), col(lonCol), lit(lat), lit(lon)))
      .orderBy(asc("dist_m"), asc(idCol))
      .limit(k)
}
