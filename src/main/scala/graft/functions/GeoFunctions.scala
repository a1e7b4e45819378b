package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Planar + spherical geometry over point structs and point arrays
  * (reference: MAIN/geospatial/GeoFunctions.java:144 — ST_Point:167,
  * ST_Distance, ST_Contains, ST_Area; SphericalGeoFunctions.java for the
  * great-circle variants). This is the phase-1 slice: points as
  * struct<x,y>, polygons as array<struct<x,y>> — everything composes from
  * codegen'd built-ins (SURVEY §7.3: compose before custom). The geometry
  * UDT + R-tree spatial join strategy remains the documented phase-2 item
  * (ExtractSpatialJoins.java:155).
  */
object GeoFunctions {

  /** ST_Point: a point is a struct<x double, y double>. */
  def stPoint(x: Column, y: Column): Column =
    struct(x.cast("double").as("x"), y.cast("double").as("y"))

  def stX(p: Column): Column = p.getField("x")
  def stY(p: Column): Column = p.getField("y")

  /** ST_Distance (planar euclidean). */
  def stDistance(a: Column, b: Column): Column =
    sqrt(pow(stX(a) - stX(b), 2) + pow(stY(a) - stY(b), 2))

  /** Great-circle distance in km ((lon, lat) degrees, haversine,
    * R = 6371 km — the reference's ST_Distance(SphericalGeography). */
  def stHaversineKm(a: Column, b: Column): Column = {
    val dLat = radians(stY(b) - stY(a))
    val dLon = radians(stX(b) - stX(a))
    val h = pow(sin(dLat / 2), 2) +
      cos(radians(stY(a))) * cos(radians(stY(b))) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371.0) * asin(sqrt(h))
  }

  /** ST_Contains for an axis-aligned bounding box. */
  def stWithinBBox(p: Column, xmin: Double, ymin: Double,
      xmax: Double, ymax: Double): Column =
    stX(p).between(xmin, xmax) && stY(p).between(ymin, ymax)

  /** ST_Area of a simple polygon (array<struct<x,y>>, unclosed ring) via the
    * shoelace formula — one zip_with pass, no UDF. */
  def stArea(ring: Column): Column = {
    val rotated = concat(slice(ring, 2, 1000000), slice(ring, 1, 1))
    abs(aggregate(
      zip_with(ring, rotated, (a, b) => stX(a) * stY(b) - stX(b) * stY(a)),
      lit(0.0), (acc, v) => acc + v)) / 2
  }

  /** Initial bearing in degrees from a to b ((lon, lat) degrees), normalized
    * to [0, 360). */
  def stBearing(a: Column, b: Column): Column = {
    val dLon = radians(stX(b) - stX(a))
    val y = sin(dLon) * cos(radians(stY(b)))
    val x = cos(radians(stY(a))) * sin(radians(stY(b))) -
      sin(radians(stY(a))) * cos(radians(stY(b))) * cos(dLon)
    (degrees(atan2(y, x)) + 360.0) % 360.0
  }
}
