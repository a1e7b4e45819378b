package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-name registration for the geometry surface.
  *
  * The reference registers every geometry behavior as a SQL function
  * (presto-main-base/.../geospatial/GeoFunctions.java:144 — 57 `"ST_*"`
  * names — plus the lowercase helpers, BingTileFunctions.java and
  * SphericalGeoFunctions.java); a user types
  * `SELECT ST_Contains(ST_GeometryFromText(...), ST_Point(x, y))` as text.
  * This object maps each name onto the Column-API kernels in
  * `GeoFunctions`/`GeomKernels`/`GeoWkb` so the same behaviors resolve
  * through `SqlSession.sql()`.
  *
  * SQL geometry type: one struct covers every WKT class —
  *   struct<gtype: string,
  *          geoms: array<struct<gtype: string,
  *                              rings: array<array<struct<x,y>>>>>>
  * A simple geometry is a 1-part collection of its own type (the same
  * uniform-view convention as `stMultiGeometryFromText`); a POLYGON part
  * carries its rings WKT-ordered (exterior first — hole support rides the
  * existing `stPolygonWithHoles` kernels); MULTI- and GEOMETRYCOLLECTION carry
  * one part per member. SphericalGeography prefixes every gtype with
  * `Spherical:` exactly like the Column API.
  *
  * Scope contracts (all raise explicit errors, TRY-recoverable, matching
  * the reference's PrestoException style): binary predicates and set ops
  * dispatch over simple×simple operands (multi operands raise); set ops
  * run the GENERAL polygon overlay (concave and holed inputs handled by
  * the GeneralGeomOp decompose-to-convex kernel; self-intersecting rings
  * raise); ST_Buffer is point-only; WKB covers simple geometries (the
  * GeoWkb codec's domain).
  */
object GeoSqlNames {
  import GeoFunctions._

  private val GEO =
    "struct<gtype:string,geoms:array<struct<gtype:string," +
      "rings:array<array<struct<x:double,y:double>>>>>>"

  // ---- representation helpers ----
  private def gt(g: Column): Column = g.getField("gtype")
  private def parts(g: Column): Column = g.getField("geoms")
  private def part1(g: Column): Column = element_at(parts(g), 1)
  private def pRings(p: Column): Column = p.getField("rings")
  private def pPts(p: Column): Column = element_at(pRings(p), 1)
  private def pts1(g: Column): Column = pPts(part1(g))
  private def allPts(g: Column): Column =
    flatten(flatten(transform(parts(g), pRings(_))))
  /** Part (rings rep) → the tagged simple struct<gtype,pts> the Column
    * kernels consume (outer ring view). */
  private def simpleOf(p: Column): Column =
    struct(p.getField("gtype").as("gtype"), pPts(p).as("pts"))
  private def firstSimple(g: Column): Column = simpleOf(part1(g))
  /** Build a 1-part GEO from a gtype + single ring of points. */
  private def mkGeo(t: Column, pts: Column): Column =
    struct(t.as("gtype"),
      array(struct(t.as("gtype"), array(pts).as("rings"))).as("geoms"))
  private def mkGeo(t: String, pts: Column): Column = mkGeo(lit(t), pts)
  /** Tagged simple struct<gtype,pts> → 1-part GEO. */
  private def wrapS(simple: Column): Column =
    mkGeo(simple.getField("gtype"), simple.getField("pts"))
  /** Tagged collection struct<gtype,geoms:array<struct<gtype,pts>>> (the
    * Column API's multi rep, also what the ConvexGeomOp kernels emit) →
    * GEO. */
  private def fromTagged(g: Column): Column =
    struct(g.getField("gtype").as("gtype"),
      transform(g.getField("geoms"), p =>
        struct(p.getField("gtype").as("gtype"),
          array(p.getField("pts")).as("rings"))).as("geoms"))
  private def pointGeo(x: Column, y: Column): Column =
    mkGeo("ST_Point", array(stPoint(x, y)))
  private def onlyPoint(g: Column): Column = element_at(pts1(g), 1)
  private def isSimpleType(t: Column): Column =
    t.isin("ST_Point", "ST_LineString", "ST_Polygon")
  private def sphericalType(t: Column): Column = t.startsWith("Spherical:")

  private def geoErr(msg: Column): Column = raise_error(msg).cast(GEO)
  private def boolErr(msg: Column): Column = raise_error(msg).cast("boolean")
  private def dblErr(msg: Column): Column = raise_error(msg).cast("double")
  private def typeErr(fn: String, t: Column): Column =
    concat(lit(s"$fn: unsupported geometry type "), t)
  private def pairErr(fn: String, a: Column, b: Column): Column =
    concat(lit(s"$fn: unsupported operand types "), gt(a), lit(" x "), gt(b))

  // path segments of an open point list (local: GeoFunctions' pathSegments
  // is private)
  private def segs(pts: Column): Column =
    zip_with(slice(pts, lit(1), greatest(size(pts) - 1, lit(0))),
      slice(pts, lit(2), greatest(size(pts) - 1, lit(0))),
      (a, b) => struct(a.as("p"), b.as("q")))

  /** Outer ring with explicit closure when the part is a polygon — the
    * segment list nearest-point folds need. */
  private def closedPts(g: Column): Column =
    when(gt(g) === "ST_Polygon", concat(pts1(g), slice(pts1(g), lit(1), lit(1))))
      .otherwise(pts1(g))

  /** Point exactly on a segment path: collinear with an edge and inside
    * its bbox — cross-product arithmetic only, one small exists fold
    * (the cheap spelling of nearest-distance == 0). */
  private def onPath(pts: Column, p: Column): Column =
    exists(segs(pts), s => {
      val a = s.getField("p"); val b = s.getField("q")
      val cr = (stX(b) - stX(a)) * (stY(p) - stY(a)) -
        (stY(b) - stY(a)) * (stX(p) - stX(a))
      cr === 0 &&
        stX(p).between(least(stX(a), stX(b)), greatest(stX(a), stX(b))) &&
        stY(p).between(least(stY(a), stY(b)), greatest(stY(a), stY(b)))
    })

  /** Point intersects polygon, hole-aware and boundary-inclusive: in the
    * interior (outside every hole — stContainsPointWithHoles) or ON any
    * ring path including hole boundaries. Keeps ST_Intersects /
    * ST_Disjoint / ST_Distance consistent with ST_Contains for holed
    * polygons (a point inside a hole meets none of them). */
  private def pointMeetsPolygon(p: Column, poly: Column): Column =
    stContainsPointWithHoles(part1(poly), p) ||
      exists(pRings(part1(poly)), ring =>
        onPath(concat(ring, slice(ring, lit(1), lit(1))), p))

  /** Min distance from a point to one ring's closed edge path. */
  private def pointRingDist(p: Column, ring: Column): Column =
    aggregate(segs(concat(ring, slice(ring, lit(1), lit(1)))),
      lit(Double.MaxValue), (best, s) => {
        val a = s.getField("p"); val b = s.getField("q")
        val len2 = pow(stX(b) - stX(a), 2) + pow(stY(b) - stY(a), 2)
        val t = when(len2 === 0.0, lit(0.0)).otherwise(
          least(lit(1.0), greatest(lit(0.0),
            ((stX(p) - stX(a)) * (stX(b) - stX(a)) +
              (stY(p) - stY(a)) * (stY(b) - stY(a))) / len2)))
        val px = stX(a) + t * (stX(b) - stX(a))
        val py = stY(a) + t * (stY(b) - stY(a))
        least(best, sqrt(pow(stX(p) - px, 2) + pow(stY(p) - py, 2)))
      })

  /** Exact min distance between two simple geometries' boundaries
    * (vertex-vs-segment symmetric folds — geometryNearestPoints). */
  private def nearestDist(a: Column, b: Column): Column = {
    val np = geometryNearestPoints(closedPts(a), closedPts(b))
    stDistance(element_at(element_at(np, 1).getField("pts"), 1),
      element_at(element_at(np, 2).getField("pts"), 1))
  }

  /** ST_Intersects dispatch over simple×simple (reference semantics;
    * boundary-incidence via exact distance-0 where the ray-cast parity
    * test alone is half-open). */
  private def sIntersects(a: Column, b: Column): Column = {
    val ta = gt(a); val tb = gt(b)
    val pa = pts1(a); val pb = pts1(b)
    when(ta === "ST_Point" && tb === "ST_Point",
      element_at(pa, 1) === element_at(pb, 1))
      .when(ta === "ST_Polygon" && tb === "ST_Polygon",
        stPolygonIntersects(pa, pb))
      .when(ta === "ST_LineString" && tb === "ST_LineString",
        stLineIntersects(pa, pb))
      .when(ta === "ST_LineString" && tb === "ST_Polygon",
        stLinePolygonIntersects(pa, pb))
      .when(ta === "ST_Polygon" && tb === "ST_LineString",
        stLinePolygonIntersects(pb, pa))
      .when(ta === "ST_Point" && tb === "ST_Polygon",
        pointMeetsPolygon(element_at(pa, 1), b))
      .when(ta === "ST_Polygon" && tb === "ST_Point",
        pointMeetsPolygon(element_at(pb, 1), a))
      .when(ta === "ST_Point" && tb === "ST_LineString",
        onPath(pb, element_at(pa, 1)))
      .when(ta === "ST_LineString" && tb === "ST_Point",
        onPath(pa, element_at(pb, 1)))
      .otherwise(boolErr(pairErr("ST_Intersects", a, b)))
  }

  private def simplePair(fn: String, a: Column, b: Column)(body: Column): Column =
    when(!isSimpleType(gt(a)) || !isSimpleType(gt(b)),
      boolErr(pairErr(fn, a, b))).otherwise(body)

  // ---- WKT rendering over the GEO rep (holes included; matches the
  // Column API's formatter: doubles print shortest-form, rings close
  // explicitly) ----
  private def coordTxt(ps: Column): Column =
    concat_ws(", ", transform(ps, p =>
      concat_ws(" ", p.getField("x").cast("string"),
        p.getField("y").cast("string"))))
  private def closedTxt(ring: Column): Column =
    coordTxt(concat(ring, slice(ring, lit(1), lit(1))))
  private def polyBodyTxt(p: Column): Column =
    concat(lit("(("),
      concat_ws("), (", transform(pRings(p), closedTxt(_))), lit("))"))
  private def partWkt(p: Column): Column = {
    val t = regexp_replace(p.getField("gtype"), "^Spherical:", "")
    when(t === "ST_Point", concat(lit("POINT ("), coordTxt(pPts(p)), lit(")")))
      .when(t === "ST_LineString",
        concat(lit("LINESTRING ("), coordTxt(pPts(p)), lit(")")))
      .when(t === "ST_Polygon", concat(lit("POLYGON "), polyBodyTxt(p)))
  }
  private def asTextGeo(g: Column): Column = {
    val t = regexp_replace(gt(g), "^Spherical:", "")
    when(t === "ST_MultiPoint",
      concat(lit("MULTIPOINT (("),
        concat_ws("), (", transform(parts(g), p => coordTxt(pPts(p)))),
        lit("))")))
      .when(t === "ST_MultiLineString",
        concat(lit("MULTILINESTRING (("),
          concat_ws("), (", transform(parts(g), p => coordTxt(pPts(p)))),
          lit("))")))
      .when(t === "ST_MultiPolygon",
        concat(lit("MULTIPOLYGON ("),
          concat_ws(", ", transform(parts(g), polyBodyTxt(_))), lit(")")))
      .when(t === "ST_GeometryCollection",
        concat(lit("GEOMETRYCOLLECTION ("),
          concat_ws(", ", transform(parts(g), partWkt(_))), lit(")")))
      .otherwise(partWkt(part1(g)))
  }

  // ---- constructors ----
  /** Native one-node WKT parser (WktGeo.scala) — a Column-tree parser
    * would be re-inlined at every reference to its result and explode
    * analysis (see WktGeo's scaladoc). */
  private def geometryFromTextGeo(w: Column): Column =
    Bridge.column(WktToGeo(Bridge.expression(w)))

  private def typedFromText(fn: String, want: String, w: Column): Column = {
    val g = geometryFromTextGeo(w)
    when(gt(g) === want, g)
      .otherwise(geoErr(concat(lit(s"$fn: expected $want WKT, got "), gt(g))))
  }

  // ---- measures ----
  private def areaGeo(g: Column): Column = {
    def partArea(p: Column): Column = // |outer| − Σ|holes|
      aggregate(zip_with(pRings(p), sequence(lit(1), size(pRings(p))),
        (ring, i) => when(i === 1, stArea(ring)).otherwise(-stArea(ring))),
        lit(0.0), _ + _)
    when(gt(g) === "Spherical:ST_Polygon", stSphericalArea(firstSimple(g)))
      .when(gt(g) === "ST_Polygon", partArea(part1(g)))
      .when(gt(g).isin("ST_MultiPolygon", "ST_GeometryCollection"),
        // collections: polygon parts contribute (set-op results arrive as
        // ST_GeometryCollection of polygon pieces)
        aggregate(transform(
          filter(parts(g), p => p.getField("gtype") === "ST_Polygon"),
          partArea(_)), lit(0.0), _ + _))
      .otherwise(lit(0.0)) // reference: non-areal types have zero area
  }

  private def lengthGeo(g: Column): Column =
    when(gt(g) === "Spherical:ST_LineString", stSphericalLength(firstSimple(g)))
      .when(gt(g) === "ST_LineString", stLineLength(pts1(g)))
      .when(gt(g) === "ST_MultiLineString",
        aggregate(transform(parts(g), p => stLineLength(pPts(p))),
          lit(0.0), _ + _))
      .otherwise(dblErr(concat(lit(
        "ST_Length: only applies to LineString or MultiLineString, got "),
        gt(g)))) // GeoFunctions.java stLength's validateType contract

  private def distanceGeo(a: Column, b: Column): Column =
    when(sphericalType(gt(a)) && sphericalType(gt(b)),
      sphericalDistanceM(onlyPoint(a), onlyPoint(b))) // meters, points
      .when(gt(a) === "ST_Point" && gt(b) === "ST_Point",
        stDistance(onlyPoint(a), onlyPoint(b)))
      .when(!isSimpleType(gt(a)) || !isSimpleType(gt(b)),
        dblErr(pairErr("ST_Distance", a, b)))
      // point × polygon: hole-aware — a point inside a hole is OUTSIDE the
      // polygon, its distance is to the nearest ring (incl. the hole's)
      .when(gt(a) === "ST_Point" && gt(b) === "ST_Polygon",
        when(pointMeetsPolygon(onlyPoint(a), b), lit(0.0))
          .otherwise(aggregate(pRings(part1(b)), lit(Double.MaxValue),
            (best, ring) => least(best, pointRingDist(onlyPoint(a), ring)))))
      .when(gt(a) === "ST_Polygon" && gt(b) === "ST_Point",
        when(pointMeetsPolygon(onlyPoint(b), a), lit(0.0))
          .otherwise(aggregate(pRings(part1(a)), lit(Double.MaxValue),
            (best, ring) => least(best, pointRingDist(onlyPoint(b), ring)))))
      .otherwise(when(sIntersects(a, b), lit(0.0)).otherwise(nearestDist(a, b)))

  /** struct<w,wx,wy> weighted-centroid accumulators. */
  private def wSum(parts: Seq[Column]): Column = {
    def fld(n: String) = parts.map(_.getField(n)).reduce(_ + _)
    struct(fld("w").as("w"), fld("wx").as("wx"), fld("wy").as("wy"))
  }
  private def wZero: Column =
    struct(lit(0.0).as("w"), lit(0.0).as("wx"), lit(0.0).as("wy"))
  private def wPoint(acc: Column): Column =
    stPoint(acc.getField("wx") / acc.getField("w"),
      acc.getField("wy") / acc.getField("w"))

  /** Area-weighted centroid terms of one polygon PART, all rings: the
    * exterior contributes +|area|·centroid, every hole −|area|·centroid —
    * the shoelace-weighted composition over rings (JTS getCentroid
    * semantics for holed polygons, reference ST_Centroid). */
  private def polyW(p: Column): Column =
    aggregate(
      zip_with(pRings(p), sequence(lit(1), size(pRings(p))), (ring, i) => {
        val w = when(i === 1, stArea(ring)).otherwise(-stArea(ring))
        val c = stCentroid(ring)
        struct(w.as("w"), (w * stX(c)).as("wx"), (w * stY(c)).as("wy"))
      }),
      wZero, (acc, v) => wSum(Seq(acc, v)))

  /** Length-weighted centroid terms of one line PART (segment midpoints —
    * Esri's line-centroid contract). */
  private def lineW(pts: Column): Column =
    aggregate(segs(pts), wZero, (acc, s) => {
      val a = s.getField("p"); val b = s.getField("q")
      val len = sqrt(pow(stX(b) - stX(a), 2) + pow(stY(b) - stY(a), 2))
      wSum(Seq(acc, struct(len.as("w"),
        ((stX(a) + stX(b)) / 2 * len).as("wx"),
        ((stY(a) + stY(b)) / 2 * len).as("wy"))))
    })

  private def centroidGeo(g: Column): Column = {
    val pts = allPts(g)
    val n = size(pts).cast("double")
    val meanPt = stPoint(
      aggregate(pts, lit(0.0), (acc, p) => acc + stX(p)) / n,
      aggregate(pts, lit(0.0), (acc, p) => acc + stY(p)) / n)
    def overParts(f: Column => Column): Column =
      wPoint(aggregate(parts(g), wZero, (acc, p) => wSum(Seq(acc, f(p)))))
    when(gt(g).isin("Spherical:ST_Point", "Spherical:ST_MultiPoint"),
      wrapS(stSphericalCentroid(
        struct(gt(g).as("gtype"), pts.as("pts")))))
      .when(gt(g) === "ST_Point", g)
      .when(gt(g) === "ST_MultiPoint", mkGeo("ST_Point", array(meanPt)))
      .when(gt(g).isin("ST_Polygon", "ST_MultiPolygon"),
        mkGeo("ST_Point", array(overParts(polyW))))
      .when(gt(g).isin("ST_LineString", "ST_MultiLineString"),
        mkGeo("ST_Point", array(overParts(p => lineW(pPts(p))))))
      .otherwise(geoErr(typeErr("ST_Centroid", gt(g))))
  }

  // ---- the registry entries ----
  type Entry = (String, String, Seq[Expression] => Expression)
  private def c(es: Seq[Expression], i: Int): Column = Bridge.column(es(i))
  private def r(col: Column): Expression = Bridge.resolvedExpression(col)
  private def e1(name: String, usage: String)(f: Column => Column): Entry =
    (name, usage, es => r(f(c(es, 0))))
  private def e2(name: String, usage: String)(f: (Column, Column) => Column): Entry =
    (name, usage, es => r(f(c(es, 0), c(es, 1))))
  private def e3(name: String, usage: String)(
      f: (Column, Column, Column) => Column): Entry =
    (name, usage, es => r(f(c(es, 0), c(es, 1), c(es, 2))))

  val entries: Seq[Entry] = Seq[Entry](
    // aggregates (reference geospatial/aggregation/GeometryUnionAgg.java,
    // ConvexHullAggregation.java): SQL-text spellings over the existing
    // Column-API aggregates (GeoFunctions.geometryUnionAgg, ConvexHullAgg)
    e1("geometry_union_agg",
      "geometry_union_agg(geometry) - union of disjoint inputs as a sorted collection")(g =>
      struct(lit("ST_GeometryCollection").as("gtype"),
        sort_array(flatten(collect_list(parts(g)))).as("geoms"))),
    e1("convex_hull_agg",
      "convex_hull_agg(geometry) - convex hull of every input point")(g => {
      val hull = Bridge.column(ConvexHullAgg(
        Bridge.expression(allPts(g))).toAggregateExpression())
      when(size(hull) >= 3, mkGeo("ST_Polygon", hull))
        .otherwise(when(size(hull) === 2, mkGeo("ST_LineString", hull))
          .otherwise(when(size(hull) === 1, mkGeo("ST_Point", hull))
            .otherwise(mkGeo("ST_Empty", hull))))
    }),
    // constructors + IO (GeoFunctions.java:144-252)
    e2("st_point", "ST_Point(x, y) - point geometry")(pointGeo),
    e1("st_geometryfromtext", "ST_GeometryFromText(wkt) - parse WKT")(
      geometryFromTextGeo),
    e1("st_linefromtext", "ST_LineFromText(wkt) - parse LINESTRING WKT")(
      w => typedFromText("ST_LineFromText", "ST_LineString", w)),
    e1("st_polygon", "ST_Polygon(wkt) - parse POLYGON WKT")(
      w => typedFromText("ST_Polygon", "ST_Polygon", w)),
    e1("st_linestring", "ST_LineString(array(point)) - line from points")(
      arr => mkGeo("ST_LineString", transform(arr, g => onlyPoint(g)))),
    e1("st_multipoint", "ST_MultiPoint(array(point)) - multipoint from points")(
      arr => struct(lit("ST_MultiPoint").as("gtype"),
        transform(arr, g => struct(lit("ST_Point").as("gtype"),
          array(pts1(g)).as("rings"))).as("geoms"))),
    e1("st_astext", "ST_AsText(geometry) - WKT text")(asTextGeo),
    e1("st_asbinary", "ST_AsBinary(geometry) - OGC WKB (simple geometries)")(
      g => stAsBinary(firstSimple(g))),
    e1("st_geomfrombinary", "ST_GeomFromBinary(wkb) - decode OGC WKB")(
      b => wrapS(stGeomFromBinary(b))),
    e1("geometry_from_geojson", "geometry_from_geojson(json) - parse GeoJSON")(
      j => wrapS(geometryFromGeoJson(j))),
    e1("geometry_as_geojson", "geometry_as_geojson(geometry) - GeoJSON text")(
      g => geometryAsGeoJson(firstSimple(g))),

    // accessors (GeoFunctions.java ST_X:536 ff.)
    e1("st_x", "ST_X(point) - x coordinate")(g => stXOf(firstSimple(g))),
    e1("st_y", "ST_Y(point) - y coordinate")(g => stYOf(firstSimple(g))),
    e1("st_xmin", "ST_XMin(geometry) - min x")(g => array_min(
      transform(allPts(g), stX(_)))),
    e1("st_xmax", "ST_XMax(geometry) - max x")(g => array_max(
      transform(allPts(g), stX(_)))),
    e1("st_ymin", "ST_YMin(geometry) - min y")(g => array_min(
      transform(allPts(g), stY(_)))),
    e1("st_ymax", "ST_YMax(geometry) - max y")(g => array_max(
      transform(allPts(g), stY(_)))),
    e1("st_geometrytype", "ST_GeometryType(geometry) - type tag")(gt),
    e1("st_numpoints", "ST_NumPoints(geometry) - vertex count")(
      g => size(allPts(g)).cast("long")),
    e2("st_pointn", "ST_PointN(line, n) - nth vertex (1-based)")((g, n) =>
      when(gt(g) =!= "ST_LineString",
        geoErr(typeErr("ST_PointN", gt(g))))
        .when(n < 1 || n > size(pts1(g)), lit(null).cast(GEO))
        .otherwise(mkGeo("ST_Point", array(element_at(pts1(g), n))))),
    e1("st_startpoint", "ST_StartPoint(line) - first vertex")(g =>
      when(gt(g) =!= "ST_LineString", geoErr(typeErr("ST_StartPoint", gt(g))))
        .otherwise(mkGeo("ST_Point", array(element_at(pts1(g), 1))))),
    e1("st_endpoint", "ST_EndPoint(line) - last vertex")(g =>
      when(gt(g) =!= "ST_LineString", geoErr(typeErr("ST_EndPoint", gt(g))))
        .otherwise(mkGeo("ST_Point", array(element_at(pts1(g), -1))))),
    e1("st_points", "ST_Points(geometry) - every vertex as points")(g =>
      transform(allPts(g), p => mkGeo("ST_Point", array(p)))),
    e1("st_dimension", "ST_Dimension(geometry) - 0/1/2")(g => {
      def dimOfT(t: Column): Column =
        when(t.endsWith("Point"), lit(0))
          .when(t.endsWith("LineString"), lit(1)).otherwise(lit(2))
      when(gt(g) === "ST_GeometryCollection",
        coalesce(array_max(transform(parts(g),
          p => dimOfT(p.getField("gtype")))), lit(0)))
        .otherwise(dimOfT(gt(g))).cast("long")
    }),
    e1("st_coorddim", "ST_CoordDim(geometry) - always 2 (planar x/y)")(
      _ => lit(2).cast("long")),
    e1("st_isempty", "ST_IsEmpty(geometry) - no coordinates")(
      g => size(allPts(g)) <= 0),
    e1("st_isclosed", "ST_IsClosed(line) - first vertex equals last")(g =>
      when(gt(g) === "ST_MultiLineString",
        forall(parts(g), p =>
          element_at(pPts(p), 1) === element_at(pPts(p), -1)))
        .otherwise(stIsClosed(firstSimple(g)))),
    e1("st_issimple", "ST_IsSimple(geometry) - no self-intersection")(g =>
      when(gt(g) === "ST_MultiPoint",
        size(array_distinct(allPts(g))) === size(allPts(g)))
        .when(gt(g).startsWith("ST_Multi") ||
            gt(g) === "ST_GeometryCollection",
          forall(parts(g), p => stIsSimple(simpleOf(p))))
        .otherwise(stIsSimple(firstSimple(g)))),
    e1("st_isring", "ST_IsRing(line) - closed and simple")(
      g => stIsRing(firstSimple(g))),
    e1("st_isvalid", "ST_IsValid(geometry)")(g =>
      size(filter(transform(parts(g),
        p => geometryInvalidReason(simpleOf(p))), r => r.isNotNull)) === 0),
    e1("geometry_invalid_reason",
      "geometry_invalid_reason(geometry) - NULL when valid")(g =>
      element_at(concat(filter(transform(parts(g),
        p => geometryInvalidReason(simpleOf(p))), r => r.isNotNull),
        array(lit(null).cast("string"))), 1)),
    e1("st_envelope", "ST_Envelope(geometry) - bounding box polygon")(g => {
      val e = stEnvelope(allPts(g))
      mkGeo("ST_Polygon", array(
        stPoint(e.getField("xmin"), e.getField("ymin")),
        stPoint(e.getField("xmax"), e.getField("ymin")),
        stPoint(e.getField("xmax"), e.getField("ymax")),
        stPoint(e.getField("xmin"), e.getField("ymax"))))
    }),
    e1("st_envelopeaspts",
      "ST_EnvelopeAsPts(geometry) - [bottom-left, top-right]")(g => {
      val e = stEnvelope(allPts(g))
      array(
        mkGeo("ST_Point", array(stPoint(e.getField("xmin"), e.getField("ymin")))),
        mkGeo("ST_Point", array(stPoint(e.getField("xmax"), e.getField("ymax")))))
    }),
    e2("expand_envelope",
      "expand_envelope(geometry, d) - envelope grown by d")((g, d) => {
      val e = stEnvelope(allPts(g))
      when(d < 0,
        geoErr(lit("expand_envelope: distance is negative")))
        .otherwise(mkGeo("ST_Polygon", array(
          stPoint(e.getField("xmin") - d, e.getField("ymin") - d),
          stPoint(e.getField("xmax") + d, e.getField("ymin") - d),
          stPoint(e.getField("xmax") + d, e.getField("ymax") + d),
          stPoint(e.getField("xmin") - d, e.getField("ymax") + d))))
    }),
    e1("st_boundary", "ST_Boundary(geometry)")(g =>
      fromTagged(stBoundary(firstSimple(g)))),
    e1("st_exteriorring", "ST_ExteriorRing(polygon) - closed outer ring")(g =>
      when(gt(g) =!= "ST_Polygon", geoErr(typeErr("ST_ExteriorRing", gt(g))))
        .otherwise(wrapS(stExteriorRing(part1(g))))),
    e1("st_numinteriorring", "ST_NumInteriorRing(polygon) - hole count")(g =>
      when(gt(g) =!= "ST_Polygon",
        raise_error(typeErr("ST_NumInteriorRing", gt(g))).cast("long"))
        .otherwise(stNumInteriorRing(part1(g)))),
    e2("st_interiorringn",
      "ST_InteriorRingN(polygon, n) - nth hole (1-based)")((g, n) =>
      when(gt(g) =!= "ST_Polygon", geoErr(typeErr("ST_InteriorRingN", gt(g))))
        .when(n < 1 || n > stNumInteriorRing(part1(g)), lit(null).cast(GEO))
        .otherwise(wrapS(stInteriorRingN(part1(g), n)))),
    e1("st_interiorrings", "ST_InteriorRings(polygon) - hole rings")(g =>
      when(gt(g) =!= "ST_Polygon", raise_error(
        typeErr("ST_InteriorRings", gt(g)))
        .cast(s"array<$GEO>"))
        .otherwise(transform(stInteriorRings(part1(g)), wrapS(_)))),
    e1("st_numgeometries", "ST_NumGeometries(geometry) - component count")(
      g => size(parts(g)).cast("long")),
    e2("st_geometryn",
      "ST_GeometryN(geometry, n) - nth component (1-based)")((g, n) =>
      when(n < 1 || n > size(parts(g)), lit(null).cast(GEO))
        .otherwise(struct(element_at(parts(g), n).getField("gtype").as("gtype"),
          array(element_at(parts(g), n)).as("geoms")))),
    e1("st_geometries", "ST_Geometries(geometry) - component list")(g =>
      when(size(parts(g)) > 0, transform(parts(g), p =>
        struct(p.getField("gtype").as("gtype"), array(p).as("geoms"))))
        .otherwise(lit(null).cast(s"array<$GEO>"))),
    e1("flatten_geometry_collections",
      "flatten_geometry_collections(geometry) - leaf parts")(g =>
      transform(parts(g), p =>
        struct(p.getField("gtype").as("gtype"), array(p).as("geoms")))),

    // measures
    e1("st_area", "ST_Area(geometry) - planar area (holes subtracted)")(areaGeo),
    e1("st_length", "ST_Length(line) - path length")(lengthGeo),
    e2("st_distance", "ST_Distance(a, b) - min distance (spherical: meters)")(
      distanceGeo),
    e1("st_centroid", "ST_Centroid(geometry)")(centroidGeo),
    e2("geometry_nearest_points",
      "geometry_nearest_points(a, b) - closest point pair")((a, b) =>
      transform(geometryNearestPoints(closedPts(a), closedPts(b)), wrapS(_))),
    e1("st_convexhull", "ST_ConvexHull(geometry) - CCW hull polygon")(g => {
      val hull = stConvexHullRing(allPts(g))
      when(size(hull) >= 3, mkGeo("ST_Polygon", hull))
        .otherwise(when(size(hull) === 2, mkGeo("ST_LineString", hull))
          .otherwise(mkGeo("ST_Point", hull)))
    }),
    e2("st_buffer", "ST_Buffer(point, r) - 32-gon disc (point-only)")((g, d) =>
      when(gt(g) =!= "ST_Point", geoErr(typeErr("ST_Buffer", gt(g))))
        .when(d <= 0, geoErr(lit("ST_Buffer: radius must be positive")))
        .otherwise(mkGeo("ST_Polygon", stBufferPoint(onlyPoint(g), d)))),

    // relation predicates (simple×simple; GeoFunctions.java ST_Contains ff.)
    e2("st_intersects", "ST_Intersects(a, b)")((a, b) =>
      simplePair("ST_Intersects", a, b)(sIntersects(a, b))),
    e2("st_disjoint", "ST_Disjoint(a, b)")((a, b) =>
      simplePair("ST_Disjoint", a, b)(!sIntersects(a, b))),
    e2("st_contains", "ST_Contains(a, b)")((a, b) =>
      when(gt(a) === "ST_Polygon" && gt(b) === "ST_Point",
        stContainsPointWithHoles(part1(a), onlyPoint(b)))
        .when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon",
          stPolygonContains(pts1(a), pts1(b)))
        .when(gt(a) === "ST_LineString" && gt(b) === "ST_Point",
          onPath(pts1(a), onlyPoint(b)))
        .otherwise(boolErr(pairErr("ST_Contains", a, b)))),
    e2("st_within", "ST_Within(a, b) - Contains(b, a)")((a, b) =>
      when(gt(b) === "ST_Polygon" && gt(a) === "ST_Point",
        stContainsPointWithHoles(part1(b), onlyPoint(a)))
        .when(gt(b) === "ST_Polygon" && gt(a) === "ST_Polygon",
          stPolygonWithin(pts1(a), pts1(b)))
        .when(gt(b) === "ST_LineString" && gt(a) === "ST_Point",
          onPath(pts1(b), onlyPoint(a)))
        .otherwise(boolErr(pairErr("ST_Within", a, b)))),
    e2("st_touches", "ST_Touches(a, b) - polygons")((a, b) =>
      when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon",
        stPolygonTouches(pts1(a), pts1(b)))
        .otherwise(boolErr(pairErr("ST_Touches", a, b)))),
    e2("st_overlaps", "ST_Overlaps(a, b) - polygons")((a, b) =>
      when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon",
        stPolygonOverlaps(pts1(a), pts1(b)))
        .otherwise(boolErr(pairErr("ST_Overlaps", a, b)))),
    e2("st_crosses", "ST_Crosses(a, b) - line × polygon")((a, b) =>
      when(gt(a) === "ST_LineString" && gt(b) === "ST_Polygon",
        stLineCrossesPolygon(pts1(a), pts1(b)))
        .when(gt(a) === "ST_Polygon" && gt(b) === "ST_LineString",
          stLineCrossesPolygon(pts1(b), pts1(a)))
        .otherwise(boolErr(pairErr("ST_Crosses", a, b)))),
    e2("st_equals", "ST_Equals(a, b) - same point set")((a, b) =>
      simplePair("ST_Equals", a, b)(
        stEquals(firstSimple(a), firstSimple(b)))),
    e3("st_relate", "ST_Relate(a, b, pattern) - DE-9IM match (polygons)")(
      (a, b, m) =>
        when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon",
          stRelate(pts1(a), pts1(b), m))
          .otherwise(boolErr(pairErr("ST_Relate", a, b)))),

    // set operations — GENERAL polygon overlay (concave + holed inputs
    // handled by the GeneralGeomOp decompose-to-convex kernel; the
    // result is a region-correct disjoint decomposition, and
    // self-intersecting rings raise a TRY-recoverable error)
    e2("st_intersection",
      "ST_Intersection(a, b) - polygons (concave/holed ok)")((a, b) =>
      when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon", {
        val c = stIntersectionGeneral(pRings(part1(a)), pRings(part1(b)))
        val ps = c.getField("geoms")
        when(size(ps) === 0, mkGeo(lit("ST_Empty"),
          array().cast("array<struct<x:double,y:double>>")))
          .when(size(ps) === 1, wrapS(element_at(ps, 1)))
          .otherwise(fromTagged(c))
      })
        .when(gt(a) === "ST_Point" && gt(b) === "ST_Point",
          when(onlyPoint(a) === onlyPoint(b), a)
            .otherwise(mkGeo(lit("ST_Empty"),
              array().cast("array<struct<x:double,y:double>>"))))
        .otherwise(geoErr(pairErr("ST_Intersection", a, b)))),
    e2("st_difference",
      "ST_Difference(a, b) - polygons (concave/holed ok)")((a, b) =>
      when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon",
        fromTagged(stDifferenceGeneral(pRings(part1(a)), pRings(part1(b)))))
        .otherwise(geoErr(pairErr("ST_Difference", a, b)))),
    e2("st_union",
      "ST_Union(a, b) - polygons (concave/holed ok) or points")((a, b) =>
      when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon",
        fromTagged(stUnionGeneral(pRings(part1(a)), pRings(part1(b)))))
        .when(gt(a) === "ST_Point" && gt(b) === "ST_Point",
          fromTagged(stUnionPoints(array(onlyPoint(a), onlyPoint(b)))))
        .otherwise(geoErr(pairErr("ST_Union", a, b)))),
    e2("st_symdifference",
      "ST_SymDifference(a, b) - polygons (concave/holed ok)")((a, b) =>
      when(gt(a) === "ST_Polygon" && gt(b) === "ST_Polygon",
        fromTagged(stSymDifferenceGeneral(pRings(part1(a)), pRings(part1(b)))))
        .otherwise(geoErr(pairErr("ST_SymDifference", a, b)))),
    e1("geometry_union",
      "geometry_union(array(geometry)) - n-ary union of disjoint parts")(
      gs => fromTagged(geometryUnionScalar(
        transform(gs, g => firstSimple(g))))),

    // line referencing + simplify
    e2("line_locate_point",
      "line_locate_point(line, point) - fraction along the line")((l, p) =>
      when(gt(l) =!= "ST_LineString",
        dblErr(typeErr("line_locate_point", gt(l))))
        .otherwise(lineLocatePoint(pts1(l), onlyPoint(p)))),
    e2("line_interpolate_point",
      "line_interpolate_point(line, fraction) - point at fraction")((l, f) =>
      when(gt(l) =!= "ST_LineString",
        geoErr(typeErr("line_interpolate_point", gt(l))))
        .otherwise(wrapS(lineInterpolatePoint(pts1(l), f)))),
    e2("simplify_geometry",
      "simplify_geometry(geometry, tolerance) - Douglas-Peucker")((g, tol) =>
      wrapS(simplifyGeometry(firstSimple(g), tol))),

    // spherical geography (SphericalGeoFunctions.java)
    e1("to_spherical_geography",
      "to_spherical_geography(geometry) - tag lon/lat domain")(g => {
      val ok = forall(allPts(g), p =>
        abs(stX(p)) <= 180.0 && abs(stY(p)) <= 90.0)
      when(!ok, geoErr(concat(lit(
        "to_spherical_geography: longitude/latitude out of range in "), gt(g))))
        .otherwise(struct(concat(lit("Spherical:"), gt(g)).as("gtype"),
          transform(parts(g), p => struct(
            concat(lit("Spherical:"), p.getField("gtype")).as("gtype"),
            pRings(p).as("rings"))).as("geoms")))
    }),
    e1("to_geometry", "to_geometry(geography) - back to planar")(g =>
      struct(regexp_replace(gt(g), "^Spherical:", "").as("gtype"),
        transform(parts(g), p => struct(
          regexp_replace(p.getField("gtype"), "^Spherical:", "").as("gtype"),
          pRings(p).as("rings"))).as("geoms"))),

    // Bing tiles (BingTileFunctions.java) — tile rep struct<x,y,zoom>
    e3("bing_tile_at", "bing_tile_at(lat, lon, zoom)")(bingTileAt),
    e1("bing_tile_quadkey", "bing_tile_quadkey(tile)")(bingTileQuadkey),
    e1("bing_tile_coordinates", "bing_tile_coordinates(tile) - (x, y)")(
      bingTileCoordinates),
    e1("bing_tile_zoom_level", "bing_tile_zoom_level(tile)")(bingTileZoomLevel),
    e1("bing_tile_polygon", "bing_tile_polygon(tile) - tile envelope")(t =>
      wrapS(bingTilePolygon(t))),
    e1("bing_tile_children", "bing_tile_children(tile) - the 4 children")(
      bingTileChildren),
    e2("geometry_to_bing_tiles",
      "geometry_to_bing_tiles(geometry, zoom) - envelope tile cover")((g, z) =>
      geometryToBingTiles(
        struct(gt(g).as("gtype"), allPts(g).as("pts")), z)),
    e2("geometry_to_dissolved_bing_tiles",
      "geometry_to_dissolved_bing_tiles(geometry, zoom) - quad-dissolved cover")(
      (g, z) => geometryToDissolvedBingTiles(
        struct(gt(g).as("gtype"), allPts(g).as("pts")), z)),
    // bing_tile: (x, y, zoom) constructor or (quadkey) decoder — the
    // reference's two overloads (BingTileFunctions.java toBingTile)
    ("bing_tile", "bing_tile(x, y, zoom) or bing_tile(quadkey)", es =>
      es match {
        case Seq(qk) => r(bingTileFromQuadkey(Bridge.column(qk)))
        case Seq(x, y, z) => r(bingTile(
          Bridge.column(x), Bridge.column(y), Bridge.column(z)))
        case other => throw new IllegalArgumentException(
          s"bing_tile takes 1 or 3 arguments, got ${other.length}")
      }),
    // bing_tile_parent: optional target zoom (reference overloads)
    ("bing_tile_parent", "bing_tile_parent(tile[, zoom])", es =>
      es match {
        case Seq(t) => r(bingTileParent(Bridge.column(t)))
        case Seq(t, z) => r(bingTileParent(Bridge.column(t), Bridge.column(z)))
        case other => throw new IllegalArgumentException(
          s"bing_tile_parent takes 1 or 2 arguments, got ${other.length}")
      }))
}
