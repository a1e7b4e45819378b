package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.GeoFunctions._

/** Accessors, validity, convex hull, interior rings, and line
  * locate/interpolate — hand-computed fixed points beyond what the
  * fn_geo_access/holes/hull/lineops oracles replay. */
class GeoAccessSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def one(c: Column): org.apache.spark.sql.Row =
    Seq(1).toDF("one").select(c.as("v")).collect()(0)

  private def pgeom(x: Double, y: Double): Column =
    struct(lit("ST_Point").as("gtype"), array(stPoint(lit(x), lit(y))).as("pts"))

  private def lgeom(pts: (Double, Double)*): Column =
    struct(lit("ST_LineString").as("gtype"),
      array(pts.map(p => stPoint(lit(p._1), lit(p._2))): _*).as("pts"))

  private def pggeom(pts: (Double, Double)*): Column =
    struct(lit("ST_Polygon").as("gtype"),
      array(pts.map(p => stPoint(lit(p._1), lit(p._2))): _*).as("pts"))

  test("ST_X/ST_Y return coordinates; non-point raises") {
    assert(one(stXOf(pgeom(3.5, -2.0))).getDouble(0) == 3.5)
    assert(one(stYOf(pgeom(3.5, -2.0))).getDouble(0) == -2.0)
    intercept[Exception] {
      one(stXOf(lgeom((0, 0), (1, 1))))
    }
  }

  test("envelope accessors and EnvelopeAsPts corners") {
    val l = lgeom((1, 2), (5, -1), (3, 7))
    assert(one(stXMin(l)).getDouble(0) == 1.0)
    assert(one(stXMax(l)).getDouble(0) == 5.0)
    assert(one(stYMin(l)).getDouble(0) == -1.0)
    assert(one(stYMax(l)).getDouble(0) == 7.0)
    assert(one(stXOf(element_at(stEnvelopeAsPts(l), 1))).getDouble(0) == 1.0)
    assert(one(stYOf(element_at(stEnvelopeAsPts(l), 2))).getDouble(0) == 7.0)
  }

  test("IsClosed / IsRing / IsSimple classify shapes") {
    val open = lgeom((0, 0), (3, 0), (3, 4))
    val ring = lgeom((0, 0), (2, 0), (2, 2), (0, 2), (0, 0))
    val bowtie = lgeom((0, 0), (2, 2), (2, 0), (0, 2))
    val closedBow = lgeom((0, 0), (2, 2), (2, 0), (0, 2), (0, 0))
    assert(!one(stIsClosed(open)).getBoolean(0))
    assert(one(stIsClosed(ring)).getBoolean(0))
    assert(one(stIsRing(ring)).getBoolean(0))
    assert(one(stIsSimple(open)).getBoolean(0))
    assert(!one(stIsSimple(bowtie)).getBoolean(0))
    assert(!one(stIsRing(closedBow)).getBoolean(0))
  }

  test("validity: degenerate, self-crossing, and valid polygons") {
    assert(one(stIsValid(pggeom((0, 0), (2, 0), (2, 2), (0, 2)))).getBoolean(0))
    assert(one(geometryInvalidReason(pggeom((0, 0), (1, 1), (2, 2))))
      .getString(0).contains("degenerate"))
    assert(one(geometryInvalidReason(pggeom((0, 0), (4, 0), (1, 2), (3, 2))))
      .getString(0).contains("self-intersects"))
  }

  test("boundary shapes per geometry type") {
    assert(one(stGeometryType(stBoundary(pgeom(1, 1)))).getString(0)
      == "ST_GeometryCollection")
    val b = stBoundary(lgeom((0, 0), (3, 0)))
    assert(one(stNumGeometries(b)).getLong(0) == 2L)
    assert(one(stXOf(stGeometryN(b, lit(2)))).getDouble(0) == 3.0)
    val pb = stBoundary(pggeom((0, 0), (2, 0), (2, 2), (0, 2)))
    assert(one(stGeometryType(pb)).getString(0) == "ST_MultiLineString")
    // polygon boundary ring closes explicitly: 5 points
    assert(one(size(stGeometryN(pb, lit(1)).getField("pts"))).getInt(0) == 5)
  }

  test("convex hull: square + interior points → the 4 corners, CCW") {
    val pts = array(
      stPoint(lit(1.0), lit(1.0)), stPoint(lit(2.0), lit(0.0)),
      stPoint(lit(0.0), lit(0.0)), stPoint(lit(2.0), lit(2.0)),
      stPoint(lit(0.5), lit(1.5)), stPoint(lit(0.0), lit(2.0)))
    assert(one(size(stConvexHullRing(pts))).getInt(0) == 4)
    assert(one(stArea(stConvexHullRing(pts))).getDouble(0) == 4.0)
    // collinear degenerates to the 2 extreme points
    val line = array(stPoint(lit(0.0), lit(0.0)),
      stPoint(lit(1.0), lit(1.0)), stPoint(lit(2.0), lit(2.0)))
    assert(one(size(stConvexHullRing(line))).getInt(0) == 2)
  }

  test("hull of a rotated diamond keeps all extreme vertices") {
    val pts = array(
      stPoint(lit(0.0), lit(-3.0)), stPoint(lit(3.0), lit(0.0)),
      stPoint(lit(0.0), lit(3.0)), stPoint(lit(-3.0), lit(0.0)),
      stPoint(lit(0.0), lit(0.0)), stPoint(lit(1.0), lit(1.0)))
    assert(one(size(stConvexHullRing(pts))).getInt(0) == 4)
    assert(one(stArea(stConvexHullRing(pts))).getDouble(0) == 18.0)
  }

  test("ST_Equals is rotation- and orientation-insensitive for rings") {
    val a = pggeom((0, 0), (2, 0), (2, 2), (0, 2))
    val rotRev = pggeom((2, 0), (0, 0), (0, 2), (2, 2)) // CW, rotated
    val other = pggeom((0, 0), (3, 0), (3, 3), (0, 3))
    assert(one(stEquals(a, rotRev)).getBoolean(0))
    assert(!one(stEquals(a, other)).getBoolean(0))
    assert(one(stEquals(lgeom((0, 0), (1, 1)), lgeom((1, 1), (0, 0)))).getBoolean(0))
  }

  test("symmetric difference area = union − intersection") {
    val a = array(stPoint(lit(0.0), lit(0.0)), stPoint(lit(2.0), lit(0.0)),
      stPoint(lit(2.0), lit(2.0)), stPoint(lit(0.0), lit(2.0)))
    val b = array(stPoint(lit(1.0), lit(1.0)), stPoint(lit(3.0), lit(1.0)),
      stPoint(lit(3.0), lit(3.0)), stPoint(lit(1.0), lit(3.0)))
    val symd = one(round(stAreaMulti(stSymDifferenceConvex(a, b)), 6)).getDouble(0)
    assert(symd == 4.0 + 4.0 - 2.0 * 1.0) // each minus the 1×1 overlap
  }

  test("polygon with holes: area, rings, and containment") {
    val wkt = lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    val pg = stPolygonWithHoles(wkt)
    assert(one(stNumInteriorRing(pg)).getLong(0) == 1L)
    assert(one(stAreaWithHoles(pg)).getDouble(0) == 15.0)
    assert(one(stGeometryType(stExteriorRing(pg))).getString(0) == "ST_LineString")
    assert(one(size(stInteriorRings(pg))).getInt(0) == 1)
    assert(one(stContainsPointWithHoles(pg, stPoint(lit(0.5), lit(0.5)))).getBoolean(0))
    assert(!one(stContainsPointWithHoles(pg, stPoint(lit(1.5), lit(1.5)))).getBoolean(0))
  }

  test("WKB pins the OGC reference encoding of POINT (1 2)") {
    // 00 | 00000001 | 3FF0000000000000 | 4000000000000000 (big-endian XDR)
    val wkb = hex(stAsBinary(pgeom(1.0, 2.0)))
    assert(one(wkb).getString(0) ==
      "00000000013FF00000000000004000000000000000")
    // little-endian input decodes too: NDR spelling of the same point
    val ndr = unhex(lit("0101000000000000000000F03F0000000000000040"))
    assert(one(stXOf(stGeomFromBinary(ndr))).getDouble(0) == 1.0)
    assert(one(stYOf(stGeomFromBinary(ndr))).getDouble(0) == 2.0)
  }

  test("WKB round-trips lines and polygons; polygon ring closes on the wire") {
    val line = lgeom((0, 0), (3, 0), (3, 4))
    assert(one(stGeomFromBinary(stAsBinary(line)) === line).getBoolean(0))
    val pg = pggeom((0, 0), (2, 0), (2, 2), (0, 2))
    assert(one(length(stAsBinary(pg))).getInt(0) == 13 + 16 * 5) // 4 pts + closure
    assert(one(stGeomFromBinary(stAsBinary(pg)) === pg).getBoolean(0))
  }

  test("simplify_geometry drops sub-tolerance zigzag, keeps sharp corners") {
    val zig = lgeom((0, 0), (1, 0.25), (2, 0), (3, 0.25), (4, 0))
    assert(one(size(simplifyGeometry(zig, lit(0.5)).getField("pts"))).getInt(0) == 2)
    assert(one(size(simplifyGeometry(zig, lit(0.1)).getField("pts"))).getInt(0) == 5)
    // an L-bend is never simplified away
    val l = lgeom((0, 0), (3, 0), (3, 4))
    assert(one(size(simplifyGeometry(l, lit(1.0)).getField("pts"))).getInt(0) == 3)
  }

  test("ST_Relate DE-9IM matrices for canonical square pairs") {
    def sqr(x: Double, y: Double, s: Double): Column = array(
      stPoint(lit(x), lit(y)), stPoint(lit(x + s), lit(y)),
      stPoint(lit(x + s), lit(y + s)), stPoint(lit(x), lit(y + s)))
    val a = sqr(0, 0, 4)
    assert(one(stRelateMatrix(a, a)).getString(0) == "2FFF1FFF2")
    assert(one(stRelateMatrix(a, sqr(1, 1, 1))).getString(0) == "212FF1FF2")
    assert(one(stRelateMatrix(a, sqr(2, 2, 4))).getString(0) == "212101212")
    assert(one(stRelateMatrix(a, sqr(4, 1, 2))).getString(0) == "FF2F11212")
    assert(one(stRelateMatrix(a, sqr(9, 9, 1))).getString(0) == "FF2FF1212")
    assert(one(stRelateMatrix(a, sqr(4, 4, 1))).getString(0) == "FF2F01212")
    // pattern language: T wildcard, exact digit, F, *
    assert(one(stRelate(a, sqr(1, 1, 1), lit("T*****FF*"))).getBoolean(0))
    assert(!one(stRelate(a, sqr(2, 2, 4), lit("T*****FF*"))).getBoolean(0))
    assert(one(stRelate(a, sqr(2, 2, 4), lit("212101212"))).getBoolean(0))
  }

  test("line locate/interpolate round-trip on an L-path") {
    val line = array(stPoint(lit(0.0), lit(0.0)), stPoint(lit(3.0), lit(0.0)),
      stPoint(lit(3.0), lit(4.0)))
    // locate the bend exactly 3/7 along
    assert(one(round(lineLocatePoint(line, stPoint(lit(3.0), lit(0.0))), 6))
      .getDouble(0) == one(round(lit(3.0 / 7.0), 6)).getDouble(0))
    // interpolate back to the bend
    val bend = lineInterpolatePoint(line, lit(3.0 / 7.0))
    assert(math.abs(one(stXOf(bend)).getDouble(0) - 3.0) < 1e-9)
    // off-line point projects to the nearest vertex
    assert(one(round(lineLocatePoint(line, stPoint(lit(4.0), lit(-1.0))), 6))
      .getDouble(0) == one(round(lit(3.0 / 7.0), 6)).getDouble(0))
    intercept[Exception] {
      one(lineInterpolatePoint(line, lit(1.5)))
    }
  }
}
