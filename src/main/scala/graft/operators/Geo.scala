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

  /** Bounding-box predicate around (lat, lon) with `radiusM`: a TRUE
    * superset of the circle (Lucene GeoUtils-style), so [[withinRadius]] can
    * rely on it for exactness while it still pushes into the parquet scan.
    *
    *  - longitude half-width uses the exact spherical formula
    *    dLon = asin(sin(r/R) / cos(lat)) — the tangent-meridian latitude of
    *    the circle's extreme-longitude point sits poleward of the center, so
    *    a linear r/(R*cos(lat)) width clips points near that tangent;
    *  - a circle containing a pole, or whose angular width spans all
    *    longitudes, gets a pass-all longitude predicate;
    *  - a box crossing the antimeridian splits into two longitude ranges
    *    (plain between() at lon ±180 would drop in-radius points on the
    *    other side of the dateline). */
  def boundingBox(latCol: Column, lonCol: Column,
                  lat: Double, lon: Double, radiusM: Double): Column = {
    val (latLo, latHi, lonRanges) = boxBounds(lat, lon, radiusM)
    val latPred = latCol.between(latLo, latHi)
    if (lonRanges.isEmpty) latPred // pole in circle / spans all longitudes
    else latPred && lonRanges.map { case (lo, hi) => lonCol.between(lo, hi) }.reduce(_ || _)
  }

  /** The box bounds as plain doubles: (latLo, latHi, lonRanges); an empty
    * lonRanges means every longitude is inside. Shared by [[boundingBox]]
    * and by oracle-SQL generators so both sides compare against literally
    * identical bounds. */
  def boxBounds(lat: Double, lon: Double, radiusM: Double): (Double, Double, Seq[(Double, Double)]) = {
    val r = radiusM / EarthRadiusMeters // angular radius
    val dLat = math.toDegrees(r)
    val latLo = math.max(-90.0, lat - dLat)
    val latHi = math.min(90.0, lat + dLat)
    val sinRatio = math.sin(math.min(r, math.Pi)) / math.cos(math.toRadians(lat))
    val lonRanges =
      if (latLo <= -90.0 || latHi >= 90.0 || r >= math.Pi / 2 || sinRatio >= 1.0) Nil
      else {
        val dLon = math.toDegrees(math.asin(sinRatio))
        val lo = lon - dLon
        val hi = lon + dLon
        if (lo < -180.0) Seq((-180.0, hi), (lo + 360.0, 180.0))
        else if (hi > 180.0) Seq((lo, 180.0), (-180.0, hi - 360.0))
        else Seq((lo, hi))
      }
    (latLo, latHi, lonRanges)
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

  /** Point-in-polygon predicate (LatLonPoint.newPolygonQuery /
    * geo/Polygon.java, crossing test as in geo/GeoUtils.java): the
    * crossing-number ray cast composed as pure codegen arithmetic — one
    * toggle term per edge — behind the polygon's own bounding box (the
    * pushdown pre-filter; Lucene's BKD plays that role). Vertices are
    * (lat, lon); the closing edge is implicit. Horizontal edges contribute
    * no crossing (their lat test is false; the guarded division then never
    * decides anything — IEEE Inf/NaN comparisons land in an AND that is
    * already false, identically in any engine running the same formula).
    * No antimeridian handling: polygons are given in continuous longitude
    * space like the reference's (Polygon.java requires −180..180 and
    * callers split datelines themselves). */
  def withinPolygon(latCol: Column, lonCol: Column,
                    vertices: Seq[(Double, Double)]): Column = {
    require(vertices.size >= 3, s"polygon needs >= 3 vertices, got ${vertices.size}")
    val lats = vertices.map(_._1)
    val lons = vertices.map(_._2)
    val box = latCol.between(lats.min, lats.max) && lonCol.between(lons.min, lons.max)
    val crossings = polygonEdges(vertices).map { case ((y1, x1), (y2, x2)) =>
      when(((lit(y1) > latCol) =!= (lit(y2) > latCol)) &&
        (lonCol < lit(x2 - x1) * (latCol - y1) / (y2 - y1) + x1), 1).otherwise(0)
    }.reduce(_ + _)
    box && (crossings % 2 === 1)
  }

  /** Closed edge list (v0→v1, …, vN→v0); shared with oracle-SQL generators
    * so both sides evaluate literally identical edge arithmetic. */
  def polygonEdges(vertices: Seq[(Double, Double)]): Seq[((Double, Double), (Double, Double))] =
    vertices.zip(vertices.tail :+ vertices.head)

  /** Spatial heatmap facet (Solr facet.heatmap /
    * HeatmapFacetCounter.java capability): per-grid-cell counts over a
    * degree-grid anchored at (latMin, lonMin) with `cellDeg` cells.
    * One map-side-combined groupBy on two small integer keys — the
    * shuffle carries at most one row per populated cell per partition,
    * independent of row count; order (grid_lat, grid_lon). */
  def heatmap(df: DataFrame, latCol: String, lonCol: String,
              latMin: Double, lonMin: Double, cellDeg: Double): DataFrame =
    df.groupBy(
        floor((col(latCol) - latMin) / cellDeg).cast("long").as("grid_lat"),
        floor((col(lonCol) - lonMin) / cellDeg).cast("long").as("grid_lon"))
      .agg(count("*").as("cnt"))
      .orderBy(asc("grid_lat"), asc("grid_lon"))
}
