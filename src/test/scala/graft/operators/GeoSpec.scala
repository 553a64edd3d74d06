package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Geo operators: haversine against known reference distances, radius
  * filter vs brute force, nearest-k ordering, box pre-filter soundness. */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def havLocal(latA: Double, lonA: Double, latB: Double, lonB: Double): Double = {
    val dLat = math.toRadians(latB - latA)
    val dLon = math.toRadians(lonB - lonA)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(latA)) * math.cos(math.toRadians(latB)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * Geo.EarthRadiusMeters * math.asin(math.min(1.0, math.sqrt(a)))
  }

  test("haversine matches reference city-pair distances within 0.5%") {
    // (from, to, approx great-circle km): Paris-London ~344, NYC-LA ~3936,
    // Sydney-Tokyo ~7823
    val cases = Seq(
      (48.8566, 2.3522, 51.5074, -0.1278, 344.0),
      (40.7128, -74.0060, 34.0522, -118.2437, 3936.0),
      (-33.8688, 151.2093, 35.6762, 139.6503, 7823.0))
    val df = cases.map { case (a, b, c, d, _) => (a, b, c, d) }
      .toDF("latA", "lonA", "latB", "lonB")
      .select(Geo.haversineMeters(col("latA"), col("lonA"), col("latB"), col("lonB")).as("m"))
    val got = df.collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((_, _, _, _, km), m) =>
      assert(math.abs(m / 1000 - km) / km < 0.005, s"expected ~$km km, got ${m / 1000}")
    }
  }

  test("withinRadius == brute force; box pre-filter is a superset of the circle") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 2000).map(i =>
      (i.toLong, rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 358 - 179))
    val df = pts.toDF("id", "lat", "lon")
    val (qLat, qLon, r) = (40.0, -74.0, 800000.0)
    val got = Geo.withinRadius(df, "lat", "lon", qLat, qLon, r)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, la, lo) => havLocal(la, lo, qLat, qLon) <= r }
      .map(_._1).toSet
    assert(got === want)
    assert(want.nonEmpty)
    // the coarse box alone keeps at least everything in the circle
    val boxed = df.filter(Geo.boundingBox(col("lat"), col("lon"), qLat, qLon, r))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(want.subsetOf(boxed))
  }

  test("nearest: distance-ordered bounded top-k with id tie-break") {
    val pts = (0 until 500).map(i => (i.toLong, (i % 50) * 0.5, (i / 50) * 0.5))
    val df = pts.toDF("id", "lat", "lon")
    val got = Geo.nearest(df, "id", "lat", "lon", 5.0, 2.0, 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    val want = pts.map { case (id, la, lo) => (id, havLocal(la, lo, 5.0, 2.0)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    assert(got === want)
  }
}
