package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The geometry surface through SQL TEXT (GeoSqlNames.scala): every
  * reference ST_* name resolves in the function registry, and a behavior
  * pin per family evaluates through `spark.sql` — the reference registers
  * these as SQL functions (geospatial/GeoFunctions.java:144), so text like
  * `ST_Contains(ST_GeometryFromText(...), ST_Point(x, y))` must work, not
  * just the Column API. */
class GeoSqlSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ready: Unit = functions.GraftFunctions.register(spark)

  private def one(expr: String): Any = {
    ready
    spark.sql(s"SELECT $expr AS v").collect()(0).get(0)
  }
  private def oneD(expr: String): Double = one(expr) match {
    case d: Double => d
    case other => other.toString.toDouble
  }

  test("all 57 reference ST_* names (and the lowercase geo names) resolve") {
    ready
    val reg = spark.sessionState.functionRegistry
    val stNames = Seq("ST_Area", "ST_AsBinary", "ST_AsText", "ST_Boundary",
      "ST_Buffer", "ST_Centroid", "ST_Contains", "ST_ConvexHull",
      "ST_CoordDim", "ST_Crosses", "ST_Difference", "ST_Dimension",
      "ST_Disjoint", "ST_Distance", "ST_EndPoint", "ST_Envelope",
      "ST_EnvelopeAsPts", "ST_Equals", "ST_ExteriorRing",
      "ST_GeomFromBinary", "ST_Geometries", "ST_GeometryFromText",
      "ST_GeometryN", "ST_GeometryType", "ST_InteriorRingN",
      "ST_InteriorRings", "ST_Intersection", "ST_Intersects", "ST_IsClosed",
      "ST_IsEmpty", "ST_IsRing", "ST_IsSimple", "ST_IsValid", "ST_Length",
      "ST_LineFromText", "ST_LineString", "ST_MultiPoint",
      "ST_NumGeometries", "ST_NumInteriorRing", "ST_NumPoints",
      "ST_Overlaps", "ST_Point", "ST_PointN", "ST_Points", "ST_Polygon",
      "ST_Relate", "ST_StartPoint", "ST_SymDifference", "ST_Touches",
      "ST_Union", "ST_Within", "ST_X", "ST_XMax", "ST_XMin", "ST_Y",
      "ST_YMax", "ST_YMin")
    val lower = Seq("geometry_invalid_reason", "line_locate_point",
      "line_interpolate_point", "simplify_geometry", "geometry_union",
      "geometry_nearest_points", "geometry_as_geojson",
      "geometry_from_geojson", "expand_envelope",
      "flatten_geometry_collections", "to_spherical_geography",
      "to_geometry", "bing_tile", "bing_tile_at", "bing_tile_coordinates",
      "bing_tile_polygon", "bing_tile_quadkey", "bing_tile_zoom_level",
      "bing_tile_children", "bing_tile_parent", "bing_tiles_around",
      "geometry_to_bing_tiles", "geometry_to_dissolved_bing_tiles",
      "great_circle_distance", "google_polyline_encode",
      "google_polyline_decode")
    val missing = (stNames ++ lower).filterNot(n =>
      reg.functionExists(FunctionIdentifier(n.toLowerCase)))
    assert(missing.isEmpty, s"unresolved SQL names: $missing")
  }

  test("constructors + WKT round-trip") {
    assert(one("ST_AsText(ST_Point(1, 2))") == "POINT (1.0 2.0)")
    assert(one("ST_AsText(ST_GeometryFromText('LINESTRING (0 0, 3 4)'))") ==
      "LINESTRING (0.0 0.0, 3.0 4.0)")
    assert(one("ST_AsText(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))") ==
      "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))")
    assert(one("ST_GeometryType(ST_GeometryFromText('MULTIPOINT ((1 1), (2 2))'))") ==
      "ST_MultiPoint")
    assert(one("ST_AsText(ST_LineString(array(ST_Point(0,0), ST_Point(1,1))))") ==
      "LINESTRING (0.0 0.0, 1.0 1.0)")
    assert(one("ST_AsText(ST_MultiPoint(array(ST_Point(0,0), ST_Point(1,1))))") ==
      "MULTIPOINT ((0.0 0.0), (1.0 1.0))")
  }

  test("measures: area (holes subtracted), length, distance, centroid") {
    assert(oneD("ST_Area(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))") == 16.0)
    assert(oneD(
      "ST_Area(ST_GeometryFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))") == 99.0)
    assert(oneD(
      "ST_Area(ST_GeometryFromText('MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))'))") == 5.0)
    assert(oneD("ST_Length(ST_GeometryFromText('LINESTRING (0 0, 3 4)'))") == 5.0)
    assert(oneD("ST_Distance(ST_Point(0, 0), ST_Point(3, 4))") == 5.0)
    // point to segment interior: perpendicular projection, not a vertex
    assert(oneD("ST_Distance(ST_Point(0, 0), ST_GeometryFromText('LINESTRING (-5 2, 5 2)'))") == 2.0)
    // disjoint squares: 1 apart
    assert(oneD(
      "ST_Distance(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), ST_GeometryFromText('POLYGON ((2 0, 3 0, 3 1, 2 1, 2 0))'))") == 1.0)
    assert(one("ST_AsText(ST_Centroid(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))") ==
      "POINT (2.0 2.0)")
    assert(one("ST_AsText(ST_Centroid(ST_GeometryFromText('LINESTRING (0 0, 4 0)')))") ==
      "POINT (2.0 0.0)")
  }

  test("accessors") {
    assert(oneD("ST_X(ST_Point(7, 8))") == 7.0)
    assert(oneD("ST_YMax(ST_GeometryFromText('LINESTRING (0 1, 2 9, 3 4)'))") == 9.0)
    assert(one("ST_NumPoints(ST_GeometryFromText('LINESTRING (0 0, 1 1, 2 2)'))") == 3L)
    assert(one("ST_AsText(ST_PointN(ST_GeometryFromText('LINESTRING (0 0, 1 1, 2 2)'), 2))") ==
      "POINT (1.0 1.0)")
    assert(one("ST_PointN(ST_GeometryFromText('LINESTRING (0 0, 1 1)'), 5)") == null)
    assert(one("ST_AsText(ST_StartPoint(ST_GeometryFromText('LINESTRING (3 4, 5 6)')))") ==
      "POINT (3.0 4.0)")
    assert(one("ST_Dimension(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == 2L)
    assert(one("ST_CoordDim(ST_Point(0, 0))") == 2L)
    assert(one("ST_NumGeometries(ST_GeometryFromText('MULTIPOINT ((1 1), (2 2), (3 3))'))") == 3L)
    assert(one("ST_AsText(ST_GeometryN(ST_GeometryFromText('MULTIPOINT ((1 1), (2 2))'), 2))") ==
      "POINT (2.0 2.0)")
    assert(one("ST_NumInteriorRing(ST_GeometryFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))") == 1L)
    assert(one("ST_AsText(ST_ExteriorRing(ST_GeometryFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))") ==
      "LINESTRING (0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 1.0, 0.0 0.0)")
    assert(one("size(ST_Points(ST_GeometryFromText('LINESTRING (0 0, 1 1)')))") == 2)
  }

  test("validity predicates") {
    assert(one("ST_IsValid(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))") == true)
    assert(one("geometry_invalid_reason(ST_GeometryFromText('POLYGON ((0 0, 1 1, 0 0, 1 1, 0 0))'))") != null)
    assert(one("ST_IsClosed(ST_GeometryFromText('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") == true)
    assert(one("ST_IsRing(ST_GeometryFromText('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") == true)
    assert(one("ST_IsSimple(ST_GeometryFromText('LINESTRING (0 0, 2 2, 2 0, 0 2)'))") == false)
    assert(one("ST_IsEmpty(ST_Point(1, 1))") == false)
  }

  test("relation predicates") {
    val poly = "ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')"
    val hole = "ST_GeometryFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))')"
    assert(one(s"ST_Contains($poly, ST_Point(2, 2))") == true)
    assert(one(s"ST_Contains($poly, ST_Point(9, 9))") == false)
    assert(one(s"ST_Contains($hole, ST_Point(3, 3))") == false) // in the hole
    assert(one(s"ST_Contains($hole, ST_Point(1, 1))") == true)
    assert(one(s"ST_Within(ST_Point(2, 2), $poly)") == true)
    assert(one(s"ST_Intersects($poly, ST_GeometryFromText('LINESTRING (-1 2, 5 2)'))") == true)
    assert(one(s"ST_Disjoint($poly, ST_Point(9, 9))") == true)
    assert(one(
      "ST_Crosses(ST_GeometryFromText('LINESTRING (-1 2, 5 2)'), ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'))") == true)
    assert(one(
      "ST_Equals(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'), ST_GeometryFromText('POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))'))") == true)
    assert(one(
      "ST_Touches(ST_GeometryFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'), ST_GeometryFromText('POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))'))") == true)
    assert(one(
      "ST_Overlaps(ST_GeometryFromText('POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))'), ST_GeometryFromText('POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))'))") == true)
  }

  test("set operations on convex rings") {
    val a = "ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')"
    val b = "ST_GeometryFromText('POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))')"
    assert(oneD(s"ST_Area(ST_Intersection($a, $b))") == 4.0)
    assert(oneD(s"ST_Area(ST_Difference($a, $b))") == 12.0)
    assert(oneD(s"ST_Area(ST_Union($a, $b))") == 28.0)
    assert(oneD(s"ST_Area(ST_SymDifference($a, $b))") == 24.0)
    assert(one(s"ST_NumGeometries(ST_Union(ST_Point(1, 1), ST_Point(2, 2)))") == 2L)
  }

  test("hull, envelope, boundary, buffer") {
    assert(one(
      "ST_AsText(ST_ConvexHull(ST_GeometryFromText('MULTIPOINT ((0 0), (4 0), (4 4), (0 4), (2 2))')))") ==
      "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))")
    assert(one(
      "ST_AsText(ST_Envelope(ST_GeometryFromText('LINESTRING (1 1, 5 3)')))") ==
      "POLYGON ((1.0 1.0, 5.0 1.0, 5.0 3.0, 1.0 3.0, 1.0 1.0))")
    assert(one(
      "ST_AsText(ST_Boundary(ST_GeometryFromText('LINESTRING (1 1, 5 3)')))") ==
      "MULTIPOINT ((1.0 1.0), (5.0 3.0))")
    assert(oneD(
      "ST_Area(ST_Buffer(ST_Point(0, 0), 1)) ") > 3.1) // 32-gon ≈ π
    assert(oneD("ST_XMax(expand_envelope(ST_Point(1, 1), 2))") == 3.0)
  }

  test("line referencing, simplify, nearest points") {
    assert(oneD("line_locate_point(ST_GeometryFromText('LINESTRING (0 0, 10 0)'), ST_Point(3, 5))") == 0.3)
    assert(one("ST_AsText(line_interpolate_point(ST_GeometryFromText('LINESTRING (0 0, 10 0)'), 0.3))") ==
      "POINT (3.0 0.0)")
    assert(one("ST_NumPoints(simplify_geometry(ST_GeometryFromText('LINESTRING (0 0, 1 0.01, 2 0, 4 0)'), 0.5))") == 2L)
    assert(one(
      "ST_AsText(geometry_nearest_points(ST_GeometryFromText('LINESTRING (-5 2, 5 2)'), ST_Point(0, 0))[0])") ==
      "POINT (0.0 2.0)")
  }

  test("WKB + GeoJSON round-trips") {
    assert(one(
      "ST_AsText(ST_GeomFromBinary(ST_AsBinary(ST_GeometryFromText('LINESTRING (0 0, 3 4)'))))") ==
      "LINESTRING (0.0 0.0, 3.0 4.0)")
    assert(one(
      "ST_AsText(geometry_from_geojson(geometry_as_geojson(ST_Point(1, 2))))") ==
      "POINT (1.0 2.0)")
  }

  test("spherical geography + bing tiles") {
    // BNA -> LAX, the reference's own test vector (~2886.4 km)
    val m = oneD(
      "ST_Distance(to_spherical_geography(ST_Point(-86.67, 36.12)), to_spherical_geography(ST_Point(-118.40, 33.94)))")
    assert(math.abs(m / 1000.0 - 2886.4) < 1.0, s"got $m m")
    assert(one("ST_AsText(to_geometry(to_spherical_geography(ST_Point(1, 2))))") ==
      "POINT (1.0 2.0)")
    assert(one("bing_tile_quadkey(bing_tile(3, 5, 3))") == "213")
    assert(one("bing_tile_quadkey(bing_tile('213'))") == "213")
    assert(one("bing_tile_zoom_level(bing_tile_parent(bing_tile(3, 5, 3)))") == 2)
    assert(one("size(bing_tile_children(bing_tile(3, 5, 3)))") == 4)
    assert(one("size(geometry_to_bing_tiles(ST_Point(0.5, 0.5), 4))") == 1)
  }

  test("type-contract violations raise, and TRY recovers them") {
    val err = intercept[Exception](one("ST_X(ST_GeometryFromText('LINESTRING (0 0, 1 1)'))"))
    assert(err.getMessage.contains("ST_X"))
    assert(one("try_expr(ST_Length(ST_Point(1, 1)))") == null)
  }

  // 10×10 square with a 2×2 hole at (4,4)-(6,6), centered on (5,5)
  private val holed = "ST_GeometryFromText('POLYGON ((0 0, 10 0, 10 10, " +
    "0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))')"

  test("holed-polygon centroid weights every ring (JTS getCentroid parity)") {
    // symmetric hole: centroid stays at (5,5) — but the weighting must
    // come from +outer/−hole composition, checked by an OFFSET hole below
    assert(one(s"ST_AsText(ST_Centroid($holed))") == "POINT (5.0 5.0)")
    // hole at (1,1)-(3,3): centroid pulls AWAY from the hole:
    // (100·5 − 4·2) / 96 = 5.125
    val off = "ST_GeometryFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(1 1, 3 1, 3 3, 1 3, 1 1))')"
    assert(oneD(s"round(ST_X(ST_Centroid($off)), 6)") == 5.125)
    assert(oneD(s"round(ST_Y(ST_Centroid($off)), 6)") == 5.125)
  }

  test("multi-geometry centroids: area- and length-weighted over parts") {
    // parts 2×2 at centroid (1,1) area 4, 1×1 at (5.5,5.5) area 1 → (1.9,1.9)
    val mp = "ST_GeometryFromText('MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0))," +
      " ((5 5, 6 5, 6 6, 5 6, 5 5)))')"
    assert(oneD(s"round(ST_X(ST_Centroid($mp)), 6)") == 1.9)
    // lines: len 4 mid (2,0) + len 2 mid (0,5) → ((8+0)/6, (0+10)/6)
    val ml = "ST_GeometryFromText('MULTILINESTRING ((0 0, 4 0), (0 4, 0 6))')"
    assert(oneD(s"round(ST_X(ST_Centroid($ml)), 6)") ==
      math.rint(8.0 / 6 * 1e6) / 1e6)
    assert(oneD(s"round(ST_Y(ST_Centroid($ml)), 6)") ==
      math.rint(10.0 / 6 * 1e6) / 1e6)
  }

  test("point in a hole: Contains/Intersects/Disjoint/Distance all agree") {
    val p = "ST_Point(5, 5)" // dead center of the hole
    assert(one(s"ST_Contains($holed, $p)") == false)
    assert(one(s"ST_Intersects($holed, $p)") == false)
    assert(one(s"ST_Intersects($p, $holed)") == false)
    assert(one(s"ST_Disjoint($holed, $p)") == true)
    // nearest boundary is the hole ring, 1 unit away — not the outer ring
    assert(oneD(s"ST_Distance($p, $holed)") == 1.0)
    assert(oneD(s"ST_Distance($holed, $p)") == 1.0)
    // a point ON the hole boundary is on the polygon's boundary: intersects
    assert(one(s"ST_Intersects(ST_Point(4, 5), $holed)") == true)
    assert(one(s"ST_Contains($holed, ST_Point(3, 5))") == true)
    assert(oneD(s"ST_Distance(ST_Point(3, 5), $holed)") == 0.0)
  }
}
