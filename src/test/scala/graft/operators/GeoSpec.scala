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

  test("withinRadius across the antimeridian: in-radius points on the other side kept") {
    // center 0.2 deg west of the dateline; points straddle it
    val pts = Seq(
      (1L, 0.0, 179.8), (2L, 0.0, -179.9), (3L, 0.0, -179.5), (4L, 0.1, 179.95),
      (5L, 0.0, 178.0), (6L, 0.0, -178.0), (7L, 45.0, -179.9))
    val df = pts.toDF("id", "lat", "lon")
    val (qLat, qLon, r) = (0.0, 179.8, 60000.0)
    val got = Geo.withinRadius(df, "lat", "lon", qLat, qLon, r)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, la, lo) => havLocal(la, lo, qLat, qLon) <= r }
      .map(_._1).toSet
    assert(got === want)
    assert(want.contains(2L) && want.contains(4L), "points across the dateline must match")
  }

  test("withinRadius at high latitude: asin lon width keeps tangent-edge points") {
    // dense ring of points right at the circle boundary at lat 80 — the old
    // linear r/(R cos lat) width clips near the extreme-longitude tangent
    val (qLat, qLon, r) = (80.0, 10.0, 300000.0)
    val pts = (0 until 720).map { i =>
      val brg = math.toRadians(i * 0.5)
      val d = (r * 0.999) / Geo.EarthRadiusMeters
      val la1 = math.toRadians(qLat)
      val la2 = math.asin(math.sin(la1) * math.cos(d) + math.cos(la1) * math.sin(d) * math.cos(brg))
      val lo2 = math.toRadians(qLon) + math.atan2(
        math.sin(brg) * math.sin(d) * math.cos(la1),
        math.cos(d) - math.sin(la1) * math.sin(la2))
      (i.toLong, math.toDegrees(la2), math.toDegrees(lo2))
    }
    val df = pts.toDF("id", "lat", "lon")
    val got = Geo.withinRadius(df, "lat", "lon", qLat, qLon, r)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, la, lo) => havLocal(la, lo, qLat, qLon) <= r }
      .map(_._1).toSet
    assert(got === want)
    assert(want.size >= 700, "nearly the whole boundary ring is inside")
  }

  test("withinRadius with a pole inside the circle: all longitudes pass") {
    val pts = (0 until 36).map(i => (i.toLong, 89.8, i * 10.0 - 180.0)) :+ (99L, 85.0, 0.0)
    val df = pts.toDF("id", "lat", "lon")
    val (qLat, qLon, r) = (89.9, 0.0, 100000.0)
    val got = Geo.withinRadius(df, "lat", "lon", qLat, qLon, r)
      .select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, la, lo) => havLocal(la, lo, qLat, qLon) <= r }
      .map(_._1).toSet
    assert(got === want)
    assert(want.size > 10, "ring near the pole matches at many longitudes")
  }

  test("withinPolygon: crossing-number ray cast == local oracle, concave notch excluded") {
    // chevron: wings are inside, the notch under the reflex vertex is OUT
    val poly = Seq((0.0, -40.0), (40.0, 0.0), (0.0, 40.0), (20.0, 0.0))
    def localInside(lat: Double, lon: Double): Boolean = {
      val edges = poly.zip(poly.tail :+ poly.head)
      val crossings = edges.count { case ((y1, x1), (y2, x2)) =>
        ((y1 > lat) != (y2 > lat)) && lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
      }
      crossings % 2 == 1
    }
    // hand-checked anchors (NOT on any edge — (10, ±20) sits exactly on the
    // D→A / C→D boundary lines and the strict crossing test excludes it)
    assert(localInside(15.0, -20.0), "left wing")
    assert(localInside(15.0, 20.0), "right wing")
    assert(!localInside(5.0, 0.0), "the notch is outside")
    assert(!localInside(50.0, 0.0) && !localInside(10.0, 100.0), "outside box")
    val rnd = new scala.util.Random(11)
    val pts = (0 until 3000).map(i =>
      (i.toLong, rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 120 - 60))
    val df = pts.toDF("id", "lat", "lon")
    val got = df.filter(Geo.withinPolygon(col("lat"), col("lon"), poly))
      .select("id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, la, lo) => localInside(la, lo) }.map(_._1).toSet
    assert(got === want)
    assert(want.size > 100 && want.size < pts.size, "polygon splits the sample")
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

  test("indexed shapes: box relations over the edge table (convex, concave, crossing)") {
    def poly(vs: (Double, Double)*) = vs.map { case (la, lo) => (la, lo) }
    // query box: lat [0, 10], lon [0, 10]
    val shapes = Seq(
      (1L, poly((2.0, 2.0), (2.0, 4.0), (4.0, 4.0), (4.0, 2.0))),          // fully inside
      (2L, poly((20.0, 20.0), (20.0, 22.0), (22.0, 21.0))),                // far away
      (3L, poly((-2.0, 3.0), (3.0, 3.0), (3.0, -2.0))),                    // straddles corner
      (4L, poly((-5.0, -5.0), (-5.0, 15.0), (15.0, 15.0), (15.0, -5.0))),  // contains the box
      // concave C-shape whose BBOX overlaps the box but whose body does
      // not: bbox pruning alone would call this an intersection
      (5L, poly((-15.0, -6.0), (12.3, -6.0), (12.3, 12.0), (11.7, 12.0),
        (11.7, -5.0), (-15.0, -5.0))),
      // thin sliver crossing straight through: NO vertex of either shape
      // inside the other — only the edge test can see it
      (6L, poly((4.9, -15.0), (5.1, -15.0), (5.1, 15.0), (4.9, 15.0))))
    val df = shapes.toDF("shape_id", "verts")
      .select(col("shape_id"), expr(
        "transform(verts, v -> named_struct('lat', v._1, 'lon', v._2))").as("verts"))
    val edges = graft.operators.Geo.shapeEdges(df, "shape_id", "verts")
    assert(edges.count() === shapes.map(_._2.size).sum)
    val bounds = graft.operators.Geo.shapeBounds(edges, "shape_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(bounds(1L) === ((2.0, 4.0)))
    val rel = graft.operators.Geo.boxRelations(edges, "shape_id", 0, 10, 0, 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    //                    (intersects, within, disjoint, contains)
    assert(rel(1L) === ((1, 1, 0, 0)))
    assert(rel(2L) === ((0, 0, 1, 0)))
    assert(rel(3L) === ((1, 0, 0, 0)))
    assert(rel(4L) === ((1, 0, 0, 1)))
    assert(rel(5L) === ((0, 0, 1, 0)), "bbox-overlapping concave body must stay disjoint")
    assert(rel(6L) === ((1, 0, 0, 0)), "pure edge crossing must intersect")
  }

  test("indexed shapes: shape-vs-shape and line-vs-shape relations") {
    def poly(vs: (Double, Double)*) = vs.toSeq
    def toDf(rows: Seq[(Long, Seq[(Double, Double)])]) =
      rows.toDF("shape_id", "verts").select(col("shape_id"), expr(
        "transform(verts, v -> named_struct('lat', v._1, 'lon', v._2))").as("verts"))
    // query polygon: diamond centered (0,0), L1 radius 10
    val q = poly((10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0))

    val shapes = Seq(
      (1L, poly((1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0))),     // inside
      (2L, poly((30.0, 30.0), (30.0, 32.0), (32.0, 31.0))),           // far away
      (3L, poly((9.0, -3.0), (9.0, 3.0), (12.0, 0.0))),               // straddles the top
      (4L, poly((-20.0, -20.0), (-20.0, 20.0), (20.0, 20.0), (20.0, -20.0)))) // contains q
    val rel = graft.operators.Geo.polyRelations(
      graft.operators.Geo.shapeEdges(toDf(shapes), "shape_id", "verts"), "shape_id", q)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rel(1L) === ((1, 1, 0)))
    assert(rel(2L) === ((0, 0, 1)))
    assert(rel(3L) === ((1, 0, 0)))
    assert(rel(4L) === ((1, 0, 0)), "shape containing the query poly intersects via query-vertex parity")

    val lines = Seq(
      (11L, poly((0.0, -2.0), (1.0, 0.0), (0.0, 2.0))),               // chain inside
      (12L, poly((-15.0, -15.0), (15.0, -15.0))),                     // far away
      (13L, poly((8.0, -8.0), (8.0, 8.0))),                           // crosses the diamond's top edges
      // entirely OUTSIDE the diamond but straddling the horizontal ray
      // from the query vertex (0,-10): parity over an open chain must NOT
      // call this an intersection
      (14L, poly((-3.0, 14.0), (3.0, 14.0))))
    val lrel = graft.operators.Geo.polyRelations(
      graft.operators.Geo.lineEdges(toDf(lines), "shape_id", "verts"), "shape_id", q,
      closed = false)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(lrel(11L) === ((1, 1, 0)))
    assert(lrel(12L) === ((0, 0, 1)))
    assert(lrel(13L) === ((1, 0, 0)))
    assert(lrel(14L) === ((0, 0, 1)), "open-chain ray parity must not fake containment")
  }

  test("pathDistanceMeters == dense-slerp ground truth; nearPath membership") {
    import spark.implicits._
    val path = Seq((48.0, 2.0), (50.0, 8.0), (52.0, 13.0))
    // independent ground truth: min haversine to 20k slerp samples/segment
    def slerpMin(lat: Double, lon: Double): Double = {
      def v(la: Double, lo: Double) = {
        val (a, o) = (math.toRadians(la), math.toRadians(lo))
        (math.cos(a) * math.cos(o), math.cos(a) * math.sin(o), math.sin(a))
      }
      path.sliding(2).flatMap { case Seq(a, b) =>
        val (ax, ay, az) = v(a._1, a._2); val (bx, by, bz) = v(b._1, b._2)
        val omega = math.acos(math.max(-1.0, math.min(1.0, ax * bx + ay * by + az * bz)))
        (0 to 20000).iterator.map { i =>
          val t = i / 20000.0
          val (s1, s2) = (math.sin((1 - t) * omega) / math.sin(omega),
            math.sin(t * omega) / math.sin(omega))
          val (x, y, z) = (s1 * ax + s2 * bx, s1 * ay + s2 * by, s1 * az + s2 * bz)
          havLocal(lat, lon, math.toDegrees(math.asin(z / math.sqrt(x * x + y * y + z * z))),
            math.toDegrees(math.atan2(y, x)))
        }
      }.min
    }
    val pts = Seq(
      (1L, 49.0, 5.0),    // off to the side of segment 1
      (2L, 48.0, 2.0),    // exactly the start vertex
      (3L, 45.0, -5.0),   // before the start: endpoint distance
      (4L, 51.0, 10.5),   // near segment 2
      (5L, 55.0, 20.0))   // past the end
    val got = pts.toDF("id", "lat", "lon")
      .select(col("id"), Geo.pathDistanceMeters(col("lat"), col("lon"), path).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pts.foreach { case (id, la, lo) =>
      val truth = slerpMin(la, lo)
      assert(math.abs(got(id) - truth) < 150.0,
        s"point $id: got ${got(id)} truth $truth") // slerp grid ~60m resolution
    }
    assert(got(2L) < 1.0) // on-path point is (numerically) zero
    val near = Geo.nearPath(pts.toDF("id", "lat", "lon"), "lat", "lon", path,
      widthM = 120000.0).select("id").collect().map(_.getLong(0)).toSet
    assert(near == pts.filter(p => slerpMin(p._2, p._3) <= 120000.0).map(_._1).toSet)
  }
}
