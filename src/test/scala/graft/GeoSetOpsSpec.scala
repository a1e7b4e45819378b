package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.GeoFunctions._

/** Set-op clipping beyond the oracle's axis-aligned families: rotated
  * convex shapes, region-area invariants, and the spherical/bing-tile
  * helpers' fixed points. */
class GeoSetOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def one(c: Column): org.apache.spark.sql.Row =
    Seq(1).toDF("one").select(c.as("v")).collect()(0)

  private val square: Column = array( // [0,4]²  CCW
    stPoint(lit(0.0), lit(0.0)), stPoint(lit(4.0), lit(0.0)),
    stPoint(lit(4.0), lit(4.0)), stPoint(lit(0.0), lit(4.0)))
  private val triangle: Column = array( // CCW, apex outside the square
    stPoint(lit(2.0), lit(1.0)), stPoint(lit(6.0), lit(1.0)),
    stPoint(lit(2.0), lit(5.0)))

  test("triangle ∩ square clips to the expected area") {
    // triangle {x≥2, y≥1, x+y≤7} ∩ [0,4]² = pentagon
    // (2,1),(4,1),(4,3),(3,4),(2,4) — shoelace area 5.5
    val r = one(round(stArea(
      stIntersectionConvex(triangle, square).getField("pts")), 6))
    assert(r.getDouble(0) == 5.5)
  }

  test("difference + intersection partition the subject region") {
    val interA = one(round(stArea(
      stIntersectionConvex(triangle, square).getField("pts")), 6)).getDouble(0)
    val diffA = one(round(stAreaMulti(
      stDifferenceConvex(triangle, square)), 6)).getDouble(0)
    assert(interA + diffA == 8.0) // triangle area exactly
  }

  test("union area = a + b − a∩b for overlapping convex shapes") {
    val u = one(round(stAreaMulti(stUnionConvex(triangle, square)), 6))
    assert(u.getDouble(0) == 16.0 + 8.0 - 5.5)
  }

  test("disjoint difference returns the subject; containment empties it") {
    val far: Column = array(
      stPoint(lit(10.0), lit(10.0)), stPoint(lit(11.0), lit(10.0)),
      stPoint(lit(11.0), lit(11.0)), stPoint(lit(10.0), lit(11.0)))
    assert(one(stAreaMulti(stDifferenceConvex(square, far))).getDouble(0) == 16.0)
    val inner: Column = array(
      stPoint(lit(1.0), lit(1.0)), stPoint(lit(2.0), lit(1.0)),
      stPoint(lit(2.0), lit(2.0)), stPoint(lit(1.0), lit(2.0)))
    assert(one(stNumGeometries(stDifferenceConvex(inner, square))).getLong(0) == 0L)
  }

  test("spherical distance matches the reference great-circle fixed point") {
    // BNA (36.12, -86.67) ↔ LAX (33.94, -118.40): great-circle ≈ 2886.45 km
    val bna = struct(lit("ST_Point").as("gtype"),
      array(stPoint(lit(-86.67), lit(36.12))).as("pts"))
    val lax = struct(lit("ST_Point").as("gtype"),
      array(stPoint(lit(-118.40), lit(33.94))).as("pts"))
    val m = one(stSphericalDistance(
      toSphericalGeography(bna), toSphericalGeography(lax))).getDouble(0)
    assert(math.abs(m / 1000.0 - 2886.45) < 1.0, s"got ${m / 1000} km")
  }

  test("to_spherical_geography rejects out-of-range coordinates") {
    val bad = struct(lit("ST_Point").as("gtype"),
      array(stPoint(lit(200.0), lit(10.0))).as("pts"))
    val e = intercept[Exception] {
      one(toSphericalGeography(bad))
    }
    assert(e.getMessage.contains("longitude/latitude out of range"))
  }

  test("bing tile polygon envelope contains its generating point") {
    val tile = bingTileAt(lit(47.6), lit(-122.33), lit(10))
    val poly = bingTilePolygon(tile)
    val r = one(struct(
      element_at(poly.getField("pts"), 1).getField("x").as("xmin"),
      element_at(poly.getField("pts"), 2).getField("x").as("xmax"),
      element_at(poly.getField("pts"), 1).getField("y").as("ymin"),
      element_at(poly.getField("pts"), 3).getField("y").as("ymax")))
      .getStruct(0)
    assert(r.getDouble(0) <= -122.33 && -122.33 <= r.getDouble(1))
    assert(r.getDouble(2) <= 47.6 && 47.6 <= r.getDouble(3))
  }

  test("geometry_to_bing_tiles covers the geometry's own tile") {
    val box = struct(lit("ST_Polygon").as("gtype"), array(
      stPoint(lit(-122.5), lit(47.5)), stPoint(lit(-122.2), lit(47.5)),
      stPoint(lit(-122.2), lit(47.7)), stPoint(lit(-122.5), lit(47.7))).as("pts"))
    val tiles = geometryToBingTiles(box, lit(10))
    val own = bingTileAt(lit(47.6), lit(-122.33), lit(10))
    val r = one(struct(size(tiles).as("n"),
      array_contains(transform(tiles, t =>
        concat_ws(":", t.getField("x"), t.getField("y"))),
        concat_ws(":", own.getField("x"), own.getField("y"))).as("covered")))
      .getStruct(0)
    assert(r.getInt(0) >= 1 && r.getBoolean(1))
  }
}
