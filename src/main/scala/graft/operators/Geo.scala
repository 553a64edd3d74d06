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

  // ---- Indexed shapes (reference lucene/sandbox .../document/LatLonShape
  // .java:60: polygons indexed as tessellated triangles in a BKD tree;
  // queries relate a box/shape to the indexed shapes). Spark-first
  // decomposition: a shape becomes (a) a per-shape bounding-box summary —
  // the BKD analogue: min/max-prunable columns a parquet scan skips on —
  // and (b) an exploded closed-edge table over which every relation is
  // pure column arithmetic (ray-crossing parity + segment orientation
  // tests aggregated per shape), so relations run as ONE scan + ONE
  // partial+final aggregation at any shape count. ----

  /** Closed edge table of a shapes frame: one row per polygon edge,
    * (idCol, y1, x1, y2, x2). `vertsCol` is array<struct<lat,lon>>; the
    * closing edge vN→v0 is generated. */
  def shapeEdges(shapes: DataFrame, idCol: String, vertsCol: String): DataFrame = {
    val n = size(col(vertsCol))
    val edges = transform(sequence(lit(0), n - 1), i => struct(
      element_at(col(vertsCol), i + 1).getField("lat").as("y1"),
      element_at(col(vertsCol), i + 1).getField("lon").as("x1"),
      element_at(col(vertsCol), pmod(i + 1, n) + 1).getField("lat").as("y2"),
      element_at(col(vertsCol), pmod(i + 1, n) + 1).getField("lon").as("x2")))
    shapes.select(col(idCol), explode(edges).as("e"))
      .select(col(idCol), col("e.y1"), col("e.x1"), col("e.y2"), col("e.x2"))
  }

  /** Per-shape bounding boxes — the prunable index summary. */
  def shapeBounds(edges: DataFrame, idCol: String): DataFrame =
    edges.groupBy(idCol).agg(
      min("y1").as("lat_min"), max("y1").as("lat_max"),
      min("x1").as("lon_min"), max("x1").as("lon_max"))

  /** 2·(signed area) of triangle (a,b,c) — orientation sign. */
  private def orient(ay: Column, ax: Column, by: Column, bx: Column,
                     cy: Column, cx: Column): Column =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Proper segment intersection of the edge (y1,x1)-(y2,x2) with a fixed
    * segment (cy1,cx1)-(cy2,cx2): endpoints strictly straddle each other's
    * carrier lines (general position; boundary-touching inputs are the
    * caller's responsibility, as in the reference's encoded-space tests). */
  private def segCross(y1: Column, x1: Column, y2: Column, x2: Column,
                       cy1: Double, cx1: Double, cy2: Double, cx2: Double): Column = {
    val o1 = orient(y1, x1, y2, x2, lit(cy1), lit(cx1))
    val o2 = orient(y1, x1, y2, x2, lit(cy2), lit(cx2))
    val o3 = orient(lit(cy1), lit(cx1), lit(cy2), lit(cx2), y1, x1)
    val o4 = orient(lit(cy1), lit(cx1), lit(cy2), lit(cx2), y2, x2)
    (signum(o1) =!= signum(o2)) && (signum(o3) =!= signum(o4))
  }

  /** Ray-crossing contribution of an edge for the fixed point (py, px).
    * Division-free (the naive `px < (x2-x1)(py-y1)/(y2-y1)+x1` form trips
    * ANSI divide-by-zero when subexpression elimination hoists the shared
    * division across corner tests and evaluates it on horizontal edges):
    * multiply through by (y2-y1) and flip the comparison with its sign. */
  private def rayCross(y1: Column, x1: Column, y2: Column, x2: Column,
                       py: Double, px: Double): Column = {
    val dy = y2 - y1
    val lhs = (lit(px) - x1) * dy
    val rhs = (x2 - x1) * (lit(py) - y1)
    when(((y1 > py) =!= (y2 > py)) &&
      when(dy > 0, lhs < rhs).otherwise(lhs > rhs), 1).otherwise(0)
  }

  /** Open polyline edge table: like [[shapeEdges]] but WITHOUT the closing
    * edge (LatLonShape's line fields: a line is an open chain of segments). */
  def lineEdges(lines: DataFrame, idCol: String, vertsCol: String): DataFrame = {
    val n = size(col(vertsCol))
    val edges = transform(sequence(lit(0), n - 2), i => struct(
      element_at(col(vertsCol), i + 1).getField("lat").as("y1"),
      element_at(col(vertsCol), i + 1).getField("lon").as("x1"),
      element_at(col(vertsCol), i + 2).getField("lat").as("y2"),
      element_at(col(vertsCol), i + 2).getField("lon").as("x2")))
    lines.select(col(idCol), explode(edges).as("e"))
      .select(col(idCol), col("e.y1"), col("e.x1"), col("e.y2"), col("e.x2"))
  }

  /** Ray-crossing parity of the fixed query polygon for a POINT COLUMN:
    * is (py, px) inside `queryPoly`? Edges of the query polygon are
    * constants, so this is a pure column sum. */
  private def inQueryPoly(py: Column, px: Column,
                          queryPoly: Seq[(Double, Double)]): Column = {
    val crossings = polygonEdges(queryPoly).map { case ((ay, ax), (by, bx)) =>
      // the horizontal-ray test with the EDGE constant and the point a
      // column: same division-free multiply-through as rayCross
      val dy = lit(by - ay)
      val lhs = (px - ax) * dy
      val rhs = lit(bx - ax) * (py - ay)
      when(((lit(ay) > py) =!= (lit(by) > py)) &&
        when(dy > 0, lhs < rhs).otherwise(lhs > rhs), 1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  /**
   * Shape-vs-shape relations: every indexed shape (or open line, via
   * [[lineEdges]]) against a fixed QUERY POLYGON, one pass over the edge
   * table. Returns (idCol, intersects, within, disjoint) 0/1 ints —
   * `within` means the indexed shape lies inside the query polygon (all
   * vertices inside and no boundary crossing, the simple-polygon rule;
   * for lines the same test applies to the chain).
   */
  def polyRelations(edges: DataFrame, idCol: String,
                    queryPoly: Seq[(Double, Double)],
                    closed: Boolean = true): DataFrame = {
    require(queryPoly.size >= 3)
    val vIn = inQueryPoly(col("y1"), col("x1"), queryPoly)
    val v2In = inQueryPoly(col("y2"), col("x2"), queryPoly)
    val anyEdgeCross = polygonEdges(queryPoly).map { case ((ay, ax), (by, bx)) =>
      segCross(col("y1"), col("x1"), col("y2"), col("x2"), ay, ax, by, bx).cast("int")
    }.reduce(greatest(_, _))
    // any query-poly vertex inside the indexed shape: per-vertex crossing
    // parity aggregated over the shape's own edges
    val qCrossings = queryPoly.zipWithIndex.map { case ((py, px), i) =>
      sum(rayCross(col("y1"), col("x1"), col("y2"), col("x2"), py, px)).as(s"q$i")
    }
    val aggCols = Seq(
      min(vIn.cast("int")).as("all_v"),
      max(vIn.cast("int")).as("any_v"),
      // an open line's LAST vertex appears only as y2/x2 — fold both ends
      min(v2In.cast("int")).as("all_v2"),
      max(v2In.cast("int")).as("any_v2"),
      max(anyEdgeCross).as("any_e")) ++ qCrossings
    val agg = edges.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    // a query vertex "inside the shape" only makes sense for CLOSED shapes:
    // ray parity over an open chain is not containment and would
    // false-positive on chains that merely straddle the ray
    val anyQIn =
      if (closed) queryPoly.indices.map(i => (col(s"q$i") % 2) === 1).reduce(_ || _)
      else lit(false)
    val intersects = (col("any_v") === 1) || (col("any_v2") === 1) ||
      (col("any_e") === 1) || anyQIn
    val within = (col("all_v") === 1) && (col("all_v2") === 1) && (col("any_e") === 0)
    agg.select(col(idCol),
      intersects.cast("int").as("intersects"),
      within.cast("int").as("within"),
      (!intersects).cast("int").as("disjoint"))
  }

  /**
   * Relations of every indexed shape against a query box, in one pass over
   * the edge table: returns (idCol, intersects, within, disjoint, contains)
   * as 0/1 ints.
   *  - within:     every vertex inside the (convex) box
   *  - intersects: a vertex inside, a box corner inside the polygon
   *                (crossing parity), or a proper edge/box-edge crossing
   *  - contains:   all four box corners inside AND no edge crossing
   *  - disjoint:   not intersects
   */
  def boxRelations(edges: DataFrame, idCol: String,
                   latLo: Double, latHi: Double,
                   lonLo: Double, lonHi: Double): DataFrame = {
    val inBox = col("y1").between(latLo, latHi) && col("x1").between(lonLo, lonHi)
    val corners = Seq((latLo, lonLo), (latLo, lonHi), (latHi, lonHi), (latHi, lonLo))
    val boxSegs = corners.zip(corners.tail :+ corners.head)
    val anyEdgeCross = boxSegs.map { case ((ay, ax), (by, bx)) =>
      segCross(col("y1"), col("x1"), col("y2"), col("x2"), ay, ax, by, bx).cast("int")
    }.reduce(greatest(_, _))
    val cornerCrossings = corners.zipWithIndex.map { case ((py, px), i) =>
      sum(rayCross(col("y1"), col("x1"), col("y2"), col("x2"), py, px)).as(s"c$i")
    }
    val aggCols = Seq(
      min(inBox.cast("int")).as("all_v"),
      max(inBox.cast("int")).as("any_v"),
      max(anyEdgeCross).as("any_e")) ++ cornerCrossings
    val agg = edges.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    val anyCornerIn = (0 until 4).map(i => (col(s"c$i") % 2) === 1).reduce(_ || _)
    val allCornersIn = (0 until 4).map(i => (col(s"c$i") % 2) === 1).reduce(_ && _)
    val intersects = (col("any_v") === 1) || (col("any_e") === 1) || anyCornerIn
    agg.select(col(idCol),
      intersects.cast("int").as("intersects"),
      (col("all_v") === 1).cast("int").as("within"),
      (!intersects).cast("int").as("disjoint"),
      (allCornersIn && col("any_e") === 0).cast("int").as("contains"))
  }

  // ---- GeoPath / corridor (lucene/spatial3d GeoStandardPath) ----

  /** Exact spherical distance (meters) from a point column to a polyline
    * path — the geo3d corridor shape (reference lucene/spatial3d/src/java/
    * org/apache/lucene/spatial3d/geom/GeoStandardPath.java:30-45: a path
    * with a half-width; membership = distance-to-path ≤ width).
    *
    * Same 3D-unit-vector geometry the reference uses, folded into codegen
    * arithmetic: per segment the constant plane normal n̂ = Â×B̂ is computed
    * at PLAN TIME; per row the cross-track angle is asin(P·n̂), taken when
    * the perpendicular foot falls inside the segment's lune
    * ((A×F)·n̂ ≥ 0 ∧ (F×B)·n̂ ≥ 0 for the projected foot F), otherwise the
    * distance to the nearer endpoint. The path distance is the least over
    * segments — one pure expression, no UDF, no join. */
  def pathDistanceMeters(lat: Column, lon: Column,
                         path: Seq[(Double, Double)]): Column = {
    require(path.size >= 2, "path needs at least two points")
    def vec(latD: Double, lonD: Double): (Double, Double, Double) = {
      val (la, lo) = (math.toRadians(latD), math.toRadians(lonD))
      (math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la))
    }
    val laR = radians(lat)
    val loR = radians(lon)
    val px = cos(laR) * cos(loR)
    val py = cos(laR) * sin(loR)
    val pz = sin(laR)
    def clamp(c: Column): Column = greatest(lit(-1.0), least(lit(1.0), c))
    val segDists = path.sliding(2).map { case Seq(a, b) =>
      val (ax, ay, az) = vec(a._1, a._2)
      val (bx, by, bz) = vec(b._1, b._2)
      // plane normal (normalized at plan time)
      val (cx, cy, cz) = (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)
      val nl = math.sqrt(cx * cx + cy * cy + cz * cz)
      require(nl > 1e-12, s"degenerate path segment $a -> $b")
      val (nx, ny, nz) = (cx / nl, cy / nl, cz / nl)
      val dotPn = px * nx + py * ny + pz * nz
      // perpendicular foot F = P - (P·n̂)n̂ (unnormalized — only signs used)
      val fx = px - dotPn * nx
      val fy = py - dotPn * ny
      val fz = pz - dotPn * nz
      // (A×F)·n̂ ≥ 0: foot is past A going toward B; (F×B)·n̂ ≥ 0: before B
      val pastA = ((lit(ay) * fz - lit(az) * fy) * nx +
        (lit(az) * fx - lit(ax) * fz) * ny +
        (lit(ax) * fy - lit(ay) * fx) * nz) >= 0
      val beforeB = ((fy * bz - fz * by) * nx +
        (fz * bx - fx * bz) * ny +
        (fx * by - fy * bx) * nz) >= 0
      val crossTrack = asin(clamp(abs(dotPn)))
      val toA = acos(clamp(px * ax + py * ay + pz * az))
      val toB = acos(clamp(px * bx + py * by + pz * bz))
      when(pastA && beforeB, crossTrack).otherwise(least(toA, toB))
    }.toSeq
    segDists.reduce(least(_, _)) * EarthRadiusMeters
  }

  /** Corridor filter: rows within `widthM` of the path (GeoStandardPath
    * membership). The distance expression is pure codegen, so the filter
    * rides the scan — compose with [[boundingBox]] over the path's
    * vertices (+width) when a pushed pre-filter is wanted. */
  def nearPath(df: DataFrame, latCol: String, lonCol: String,
               path: Seq[(Double, Double)], widthM: Double): DataFrame =
    df.filter(pathDistanceMeters(col(latCol), col(lonCol), path) <= widthM)
}
