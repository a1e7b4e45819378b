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
    val rotated = rotatedRing(ring)
    abs(aggregate(
      zip_with(ring, rotated, (a, b) => stX(a) * stY(b) - stX(b) * stY(a)),
      lit(0.0), (acc, v) => acc + v)) / 2
  }

  /** bing_tile_at(lat, lon, zoom) → struct<x,y,zoom> — the reference's Bing
    * tile system (BingTileFunctions.java, BingTileUtils.java): Web Mercator
    * projection, tile grid 2^zoom × 2^zoom, composed entirely from
    * codegen'd built-ins. */
  def bingTileAt(lat: Column, lon: Column, zoom: Column): Column = {
    val n = pow(lit(2.0), zoom)
    val sinLat = sin(radians(lat))
    val x01 = (lon + 180.0) / 360.0
    val y01 = lit(0.5) -
      log((lit(1.0) + sinLat) / (lit(1.0) - sinLat)) / (4.0 * math.Pi)
    val tx = least(greatest(floor(x01 * n), lit(0.0)), n - 1).cast("long")
    val ty = least(greatest(floor(y01 * n), lit(0.0)), n - 1).cast("long")
    struct(tx.as("x"), ty.as("y"), zoom.cast("int").as("zoom"))
  }

  /** Variable-shift shiftright (the functions.shiftright overload only
    * takes a literal shift). */
  private def shr(x: Column, n: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftRight(
        org.apache.spark.sql.graftbridge.Bridge.expression(x),
        org.apache.spark.sql.graftbridge.Bridge.expression(n)))

  /** Quadkey of a bing tile struct (BingTile.toQuadKey): base-4 digits of
    * the interleaved x/y bits, most-significant first, length = zoom. */
  def bingTileQuadkey(tile: Column): Column =
    concat_ws("",
      transform(sequence(tile.getField("zoom"), lit(1), lit(-1)),
        i => chr(lit(48) +
          shr(tile.getField("x"), i - 1) % 2 +
          shr(tile.getField("y"), i - 1) % 2 * 2)))

  /** ST_Polygon('POLYGON((x y, x y, …))') → array<struct<x,y>> ring
    * (reference GeoFunctions.java ST_Polygon:226). Accepts open or
    * explicitly-closed rings (the closing vertex is dropped); coordinates
    * survive the string round trip exactly because CAST(double↔string)
    * uses shortest-repr on both sides. Composition only — no UDF. */
  def stPolygonWkt(w: Column): Column = {
    val inner = regexp_extract(w,
      "(?i)^\\s*POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)\\)\\s*$", 1)
    val pts = transform(split(inner, "\\s*,\\s*"), s =>
      struct(element_at(split(trim(s), "\\s+"), 1).cast("double").as("x"),
        element_at(split(trim(s), "\\s+"), 2).cast("double").as("y")))
    when(size(pts) > 1 &&
      element_at(pts, 1) === element_at(pts, size(pts)),
      slice(pts, lit(1), size(pts) - 1)).otherwise(pts)
  }

  // ring rotated by one: [v1..vn-1, v0] — slice length tracks the actual
  // ring size so oversized rings are never silently truncated
  private def rotatedRing(ring: Column): Column =
    concat(slice(ring, lit(2), greatest(size(ring) - 1, lit(0))),
      slice(ring, lit(1), lit(1)))

  /** ST_Contains(polygon, point) for simple polygons — even-odd ray cast
    * (a horizontal ray to +x; crossing parity decides). One zip_with pass
    * over the edges; boundary points are engine-deterministic but, as in
    * the reference, not guaranteed either way. */
  def stContainsPoint(ring: Column, p: Column): Column = {
    val crossings = aggregate(
      zip_with(ring, rotatedRing(ring), (a, b) => {
        val crosses = (stY(a) > stY(p)) =!= (stY(b) > stY(p))
        val xint = (stX(b) - stX(a)) * (stY(p) - stY(a)) /
          (stY(b) - stY(a)) + stX(a)
        when(crosses && stX(p) < xint, 1).otherwise(0)
      }),
      lit(0), (acc, v) => acc + v)
    crossings % 2 === 1
  }

  /** ST_Centroid of a simple polygon (shoelace-weighted vertex average). */
  def stCentroid(ring: Column): Column = {
    val rot = rotatedRing(ring)
    def cross(a: Column, b: Column) = stX(a) * stY(b) - stX(b) * stY(a)
    val aSigned = aggregate(
      zip_with(ring, rot, (a, b) => cross(a, b)), lit(0.0), _ + _) / 2
    val cx = aggregate(
      zip_with(ring, rot, (a, b) => (stX(a) + stX(b)) * cross(a, b)),
      lit(0.0), _ + _) / (aSigned * 6)
    val cy = aggregate(
      zip_with(ring, rot, (a, b) => (stY(a) + stY(b)) * cross(a, b)),
      lit(0.0), _ + _) / (aSigned * 6)
    struct(cx.as("x"), cy.as("y"))
  }

  /** ST_NumPoints / ST_Perimeter over the unclosed ring. */
  def stNumPoints(ring: Column): Column = size(ring).cast("long")
  def stPerimeter(ring: Column): Column =
    aggregate(
      zip_with(ring, rotatedRing(ring), (a, b) =>
        sqrt(pow(stX(b) - stX(a), 2) + pow(stY(b) - stY(a), 2))),
      lit(0.0), _ + _)

  /** great_circle_distance(lat1, lon1, lat2, lon2) in km (reference
    * SphericalGeoFunctions.java:168 — haversine, R = 6371 km; pinned by
    * the reference's BNA↔LAX test vector in FunctionsSpec). */
  def greatCircleKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    stHaversineKm(stPoint(lon1, lat1), stPoint(lon2, lat2))

  /** bing_tiles_around(lat, lon, zoom) — the tile and its ≤8 neighbors,
    * clamped at the grid edge and deduplicated (BingTileFunctions.java). */
  def bingTilesAround(lat: Column, lon: Column, zoom: Column): Column = {
    val c = bingTileAt(lat, lon, zoom)
    val maxIdx = (pow(lit(2.0), zoom) - 1).cast("long")
    array_distinct(flatten(
      transform(sequence(lit(-1), lit(1)), dx =>
        transform(sequence(lit(-1), lit(1)), dy =>
          struct(
            least(greatest(c.getField("x") + dx, lit(0L)), maxIdx).as("x"),
            least(greatest(c.getField("y") + dy, lit(0L)), maxIdx).as("y"),
            c.getField("zoom").as("zoom"))))))
  }

  // ---- Linestrings (reference GeoFunctions.java ST_LineString / ST_Length /
  // ST_StartPoint / ST_EndPoint / ST_PointN) — an OPEN path as
  // array<struct<x,y>>, sharing the point representation with rings. ----

  /** ST_LineFromText('LINESTRING(x y, x y, …)') → array<struct<x,y>>. */
  def stLineWkt(w: Column): Column = {
    val inner = regexp_extract(w,
      "(?i)^\\s*LINESTRING\\s*\\(\\s*(.*?)\\s*\\)\\s*$", 1)
    transform(split(inner, "\\s*,\\s*"), s =>
      struct(element_at(split(trim(s), "\\s+"), 1).cast("double").as("x"),
        element_at(split(trim(s), "\\s+"), 2).cast("double").as("y")))
  }

  /** Consecutive segments of an open path: array<struct<p, q>>. */
  private def pathSegments(line: Column): Column =
    zip_with(slice(line, lit(1), greatest(size(line) - 1, lit(0))),
      slice(line, lit(2), greatest(size(line) - 1, lit(0))),
      (a, b) => struct(a.as("p"), b.as("q")))

  /** Closed-ring edges (last vertex connects back to the first). */
  private def ringEdges(ring: Column): Column =
    zip_with(ring, rotatedRing(ring), (a, b) => struct(a.as("p"), b.as("q")))

  /** ST_Length of an open path. */
  def stLineLength(line: Column): Column =
    aggregate(pathSegments(line), lit(0.0), (acc, s) =>
      acc + sqrt(
        pow(s.getField("q").getField("x") - s.getField("p").getField("x"), 2) +
        pow(s.getField("q").getField("y") - s.getField("p").getField("y"), 2)))

  def stStartPoint(line: Column): Column = element_at(line, 1)
  def stEndPoint(line: Column): Column = element_at(line, -1)
  /** ST_PointN (1-based, like the reference). */
  def stPointN(line: Column, n: Column): Column = element_at(line, n)

  /** ST_Envelope of any point array → struct<xmin,ymin,xmax,ymax>. */
  def stEnvelope(g: Column): Column = struct(
    array_min(transform(g, stX(_))).as("xmin"),
    array_min(transform(g, stY(_))).as("ymin"),
    array_max(transform(g, stX(_))).as("xmax"),
    array_max(transform(g, stY(_))).as("ymax"))

  /** Envelope of the union of two geometries (ST_Envelope∘ST_Union for the
    * bbox algebra — the combined bounding box). */
  def stEnvelopeUnion(a: Column, b: Column): Column = {
    val ea = stEnvelope(a); val eb = stEnvelope(b)
    struct(
      least(ea.getField("xmin"), eb.getField("xmin")).as("xmin"),
      least(ea.getField("ymin"), eb.getField("ymin")).as("ymin"),
      greatest(ea.getField("xmax"), eb.getField("xmax")).as("xmax"),
      greatest(ea.getField("ymax"), eb.getField("ymax")).as("ymax"))
  }

  /** Segment-segment intersection (proper crossings + collinear touching):
    * pure cross-product orientation tests — no division, so with exact
    * inputs the predicate is engine-deterministic. */
  private def segSeg(p1: Column, q1: Column, p2: Column, q2: Column): Column = {
    def cross3(o: Column, a: Column, b: Column): Column =
      (stX(a) - stX(o)) * (stY(b) - stY(o)) -
        (stY(a) - stY(o)) * (stX(b) - stX(o))
    def onSeg(p: Column, q: Column, r: Column): Column =
      stX(r).between(least(stX(p), stX(q)), greatest(stX(p), stX(q))) &&
        stY(r).between(least(stY(p), stY(q)), greatest(stY(p), stY(q)))
    val d1 = cross3(p2, q2, p1)
    val d2 = cross3(p2, q2, q1)
    val d3 = cross3(p1, q1, p2)
    val d4 = cross3(p1, q1, q2)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0)) ||
      (d1 === 0 && onSeg(p2, q2, p1)) ||
      (d2 === 0 && onSeg(p2, q2, q1)) ||
      (d3 === 0 && onSeg(p1, q1, p2)) ||
      (d4 === 0 && onSeg(p1, q1, q2))
  }

  private def anySegPair(segsA: Column, segsB: Column): Column =
    exists(segsA, sa => exists(segsB, sb =>
      segSeg(sa.getField("p"), sa.getField("q"),
        sb.getField("p"), sb.getField("q"))))

  /** ST_Intersects for two open paths. */
  def stLineIntersects(a: Column, b: Column): Column =
    anySegPair(pathSegments(a), pathSegments(b))

  /** ST_Intersects for two simple polygons (closed rings): any edge pair
    * crosses, or one contains the other entirely (vertex test suffices for
    * simple polygons once edge crossings are ruled out). */
  def stPolygonIntersects(a: Column, b: Column): Column =
    anySegPair(ringEdges(a), ringEdges(b)) ||
      stContainsPoint(a, element_at(b, 1)) ||
      stContainsPoint(b, element_at(a, 1))

  /** ST_Intersects for an open path vs a polygon ring. */
  def stLinePolygonIntersects(line: Column, ring: Column): Column =
    anySegPair(pathSegments(line), ringEdges(ring)) ||
      stContainsPoint(ring, element_at(line, 1))

  /** ST_Buffer of a point: k-gon approximation of the radius-r disc
    * (reference ST_Buffer via Esri; k defaults to 32 like common engines). */
  def stBufferPoint(p: Column, r: Column, k: Int = 32): Column =
    transform(sequence(lit(0), lit(k - 1)), i => struct(
      (stX(p) + r * cos(lit(2 * math.Pi) * i / k)).as("x"),
      (stY(p) + r * sin(lit(2 * math.Pi) * i / k)).as("y")))

  /** Initial bearing in degrees from a to b ((lon, lat) degrees), normalized
    * to [0, 360). */
  def stBearing(a: Column, b: Column): Column = {
    val dLon = radians(stX(b) - stX(a))
    val y = sin(dLon) * cos(radians(stY(b)))
    val x = cos(radians(stY(a))) * sin(radians(stY(b))) -
      sin(radians(stY(a))) * cos(radians(stY(b))) * cos(dLon)
    (degrees(atan2(y, x)) + 360.0) % 360.0
  }

  // ---- Geometry casts (reference GeoFunctions.java ST_GeometryFromText /
  // ST_AsText / ST_GeometryType) — a TAGGED geometry as
  // struct<gtype: string, pts: array<struct<x,y>>> bridging the per-type
  // representations above. POINT/LINESTRING/POLYGON (single ring);
  // multi-geometries are documented-unsupported. ----

  private def wktCoords(inner: Column): Column =
    transform(split(inner, "\\s*,\\s*"), s =>
      struct(element_at(split(trim(s), "\\s+"), 1).cast("double").as("x"),
        element_at(split(trim(s), "\\s+"), 2).cast("double").as("y")))

  /** ST_GeometryFromText(wkt) → tagged geometry struct. */
  def stGeometryFromText(w: Column): Column = {
    val t = upper(regexp_extract(w, "(?i)^\\s*([a-z]+)", 1))
    val gtype = when(t === "POINT", lit("ST_Point"))
      .when(t === "LINESTRING", lit("ST_LineString"))
      .when(t === "POLYGON", lit("ST_Polygon"))
    val pts = when(t === "POINT",
      wktCoords(regexp_extract(w, "(?i)^\\s*POINT\\s*\\(\\s*(.*?)\\s*\\)\\s*$", 1)))
      .when(t === "LINESTRING", stLineWkt(w))
      .when(t === "POLYGON", stPolygonWkt(w))
    struct(gtype.as("gtype"), pts.as("pts"))
  }

  /** ST_GeometryType(g) → 'ST_Point' / 'ST_LineString' / 'ST_Polygon'. */
  def stGeometryType(g: Column): Column = g.getField("gtype")

  /** ST_AsText(g) → WKT; polygon rings close explicitly like the
    * reference's output. Coordinates use double→string shortest
    * representation (so 1 prints as '1.0' — deviation from Esri's
    * integer-collapsing formatter, stable across engines). */
  def stAsText(g: Column): Column = {
    val pts = g.getField("pts")
    def txt(ps: Column): Column = concat_ws(", ", transform(ps, p =>
      concat_ws(" ", p.getField("x").cast("string"),
        p.getField("y").cast("string"))))
    when(g.getField("gtype") === "ST_Point",
      concat(lit("POINT ("), txt(pts), lit(")")))
      .when(g.getField("gtype") === "ST_LineString",
        concat(lit("LINESTRING ("), txt(pts), lit(")")))
      .when(g.getField("gtype") === "ST_Polygon",
        concat(lit("POLYGON (("), txt(concat(pts, slice(pts, lit(1), lit(1)))),
          lit("))")))
  }

  // ---- Relation predicates beyond Contains/Intersects (GeoFunctions.java
  // ST_Within, ST_Touches, ST_Crosses, ST_Overlaps, ST_Disjoint) for
  // simple single-ring polygons and open paths. Piecewise-linear DE-9IM
  // approximations: interior intersection is witnessed by a strictly
  // interior vertex or a proper (non-collinear) edge crossing — exact for
  // polygons whose vertices avoid the partner's boundary (equal rings and
  // boundary-incident vertices are engine-deterministic but, as with the
  // reference's boundary pixels, not contractual). All tests are
  // cross-product orientation arithmetic: no division, engine-exact on
  // dyadic inputs. ----

  /** Proper segment crossing only — strict orientation signs, collinear
    * touching excluded (the interior-intersection witness). */
  private def segSegProper(p1: Column, q1: Column,
                           p2: Column, q2: Column): Column = {
    def cross3(o: Column, a: Column, b: Column): Column =
      (stX(a) - stX(o)) * (stY(b) - stY(o)) -
        (stY(a) - stY(o)) * (stX(b) - stX(o))
    val d1 = cross3(p2, q2, p1)
    val d2 = cross3(p2, q2, q1)
    val d3 = cross3(p1, q1, p2)
    val d4 = cross3(p1, q1, q2)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  private def anyProperCross(segsA: Column, segsB: Column): Column =
    exists(segsA, sa => exists(segsB, sb =>
      segSegProper(sa.getField("p"), sa.getField("q"),
        sb.getField("p"), sb.getField("q"))))

  /** Point exactly on the ring's boundary (collinear with an edge and
    * inside its bbox) — cross-product arithmetic only, no division. The
    * ray-cast parity test alone is half-open (bottom/left boundaries
    * count as inside), so DE-9IM interior tests subtract the boundary
    * explicitly. */
  private def onRingBoundary(ring: Column, p: Column): Column =
    exists(ringEdges(ring), s => {
      val a = s.getField("p"); val b = s.getField("q")
      val cr = (stX(b) - stX(a)) * (stY(p) - stY(a)) -
        (stY(b) - stY(a)) * (stX(p) - stX(a))
      cr === 0 &&
        stX(p).between(least(stX(a), stX(b)), greatest(stX(a), stX(b))) &&
        stY(p).between(least(stY(a), stY(b)), greatest(stY(a), stY(b)))
    })

  private def strictlyInside(ring: Column, p: Column): Column =
    !onRingBoundary(ring, p) && stContainsPoint(ring, p)

  /** ST_Contains(polygon, polygon): every vertex of b inside or on the
    * boundary of a, and no proper edge crossing (so contains(A, A) holds,
    * as DE-9IM requires). */
  def stPolygonContains(a: Column, b: Column): Column =
    forall(b, v => stContainsPoint(a, v) || onRingBoundary(a, v)) &&
      !anyProperCross(ringEdges(a), ringEdges(b))

  /** ST_Within(a, b) = ST_Contains(b, a). */
  def stPolygonWithin(a: Column, b: Column): Column = stPolygonContains(b, a)

  /** ST_Disjoint for two simple polygons. */
  def stPolygonDisjoint(a: Column, b: Column): Column =
    !stPolygonIntersects(a, b)

  private def interiorsIntersect(a: Column, b: Column): Column =
    exists(b, v => strictlyInside(a, v)) ||
      exists(a, v => strictlyInside(b, v)) ||
      anyProperCross(ringEdges(a), ringEdges(b))

  /** ST_Touches: boundaries meet but interiors stay disjoint (shared
    * edges and corner contacts; overlapping interiors → false). */
  def stPolygonTouches(a: Column, b: Column): Column =
    stPolygonIntersects(a, b) && !interiorsIntersect(a, b)

  /** ST_Overlaps: interiors intersect but neither polygon contains the
    * other. */
  def stPolygonOverlaps(a: Column, b: Column): Column =
    interiorsIntersect(a, b) &&
      !stPolygonContains(a, b) && !stPolygonContains(b, a)

  /** ST_Crosses(linestring, polygon): the path passes through the
    * interior AND the exterior — a proper edge crossing, or vertices on
    * both sides. */
  def stLineCrossesPolygon(line: Column, ring: Column): Column =
    anyProperCross(pathSegments(line), ringEdges(ring)) ||
      (exists(line, v => strictlyInside(ring, v)) &&
        exists(line, v => !stContainsPoint(ring, v) && !onRingBoundary(ring, v)))

  // ---- Multi-geometries (GeoFunctions.java ST_NumGeometries,
  // ST_GeometryN, GeometryType over MULTI* / GEOMETRYCOLLECTION WKT —
  // reference geospatial/GeoFunctions.java:toMultiPoint area): a tagged
  // COLLECTION struct<gtype, geoms: array<struct<gtype, pts>>> whose
  // parts are the single tagged geometries above. Polygon parts carry one
  // exterior ring (holes stay out of scope like the single-polygon
  // surface). ----

  private def taggedPart(gt: String, pts: Column): Column =
    struct(lit(gt).as("gtype"), pts.as("pts"))

  // WKT rings close explicitly; the internal ring representation is open
  private def dropClosure(pts: Column): Column =
    when(size(pts) > 1 &&
      element_at(pts, 1) === element_at(pts, size(pts)),
      slice(pts, lit(1), size(pts) - 1)).otherwise(pts)

  /** ST_GeometryFromText for multi/collection WKT → tagged collection.
    * Single-geometry WKT wraps as a 1-part collection of its own type so
    * every geometry has a uniform ST_NumGeometries/ST_GeometryN view. */
  def stMultiGeometryFromText(w: Column): Column = {
    val t = upper(regexp_extract(w, "(?i)^\\s*([a-z]+)", 1))
    // innermost paren groups: MULTILINESTRING parts and MULTIPOLYGON
    // exterior rings are exactly the depth-innermost coordinate lists
    val innerGroups = regexp_extract_all(w, lit("\\(([^()]+)\\)"), lit(1))
    // balanced-to-depth-2 components of a GEOMETRYCOLLECTION
    val components = regexp_extract_all(w,
      lit("(?i)(?:POINT|LINESTRING|POLYGON)\\s*\\((?:[^()]|\\([^()]*\\))*\\)"),
      lit(0))
    val mpCoords = wktCoords(regexp_replace(
      regexp_extract(w, "(?i)^\\s*MULTIPOINT\\s*\\((.*)\\)\\s*$", 1),
      "[()]", ""))
    val gtype = when(t === "MULTIPOINT", lit("ST_MultiPoint"))
      .when(t === "MULTILINESTRING", lit("ST_MultiLineString"))
      .when(t === "MULTIPOLYGON", lit("ST_MultiPolygon"))
      .when(t === "GEOMETRYCOLLECTION", lit("ST_GeometryCollection"))
      .otherwise(stGeometryType(stGeometryFromText(w)))
    val geoms = when(t === "MULTIPOINT",
      transform(mpCoords, p => taggedPart("ST_Point", array(p))))
      .when(t === "MULTILINESTRING",
        transform(innerGroups, s => taggedPart("ST_LineString", wktCoords(s))))
      .when(t === "MULTIPOLYGON",
        transform(innerGroups, s => taggedPart("ST_Polygon",
          dropClosure(wktCoords(s)))))
      .when(t === "GEOMETRYCOLLECTION",
        transform(components, c => stGeometryFromText(c)))
      .otherwise(array(stGeometryFromText(w)))
    struct(gtype.as("gtype"), geoms.as("geoms"))
  }

  def stNumGeometries(g: Column): Column =
    size(g.getField("geoms")).cast("long")

  /** ST_GeometryN (1-based like the reference) → single tagged geometry. */
  def stGeometryN(g: Column, n: Column): Column =
    element_at(g.getField("geoms"), n)

  /** ST_AsText for the tagged collection. */
  def stAsTextMulti(g: Column): Column = {
    val geoms = g.getField("geoms")
    def coordTxt(ps: Column): Column = concat_ws(", ", transform(ps, p =>
      concat_ws(" ", p.getField("x").cast("string"),
        p.getField("y").cast("string"))))
    def partTxt(p: Column): Column = coordTxt(p.getField("pts"))
    def ringTxt(p: Column): Column = {
      val pts = p.getField("pts")
      coordTxt(concat(pts, slice(pts, lit(1), lit(1))))
    }
    when(g.getField("gtype") === "ST_MultiPoint",
      concat(lit("MULTIPOINT (("),
        concat_ws("), (", transform(geoms, p => partTxt(p))), lit("))")))
      .when(g.getField("gtype") === "ST_MultiLineString",
        concat(lit("MULTILINESTRING (("),
          concat_ws("), (", transform(geoms, p => partTxt(p))), lit("))")))
      .when(g.getField("gtype") === "ST_MultiPolygon",
        concat(lit("MULTIPOLYGON ((("),
          concat_ws(")), ((", transform(geoms, p => ringTxt(p))), lit(")))")))
      .when(g.getField("gtype") === "ST_GeometryCollection",
        concat(lit("GEOMETRYCOLLECTION ("),
          concat_ws(", ", transform(geoms, p => stAsText(p))), lit(")")))
      .otherwise(stAsText(element_at(geoms, 1)))
  }

  /** Sum of part areas (polygon parts). */
  def stAreaMulti(g: Column): Column =
    aggregate(transform(g.getField("geoms"),
      p => stArea(p.getField("pts"))), lit(0.0), _ + _)

  /** Sum of part perimeters (polygon parts). */
  def stPerimeterMulti(g: Column): Column =
    aggregate(transform(g.getField("geoms"),
      p => stPerimeter(p.getField("pts"))), lit(0.0), _ + _)

  /** Sum of part lengths (linestring parts). */
  def stLengthMulti(g: Column): Column =
    aggregate(transform(g.getField("geoms"),
      p => stLineLength(p.getField("pts"))), lit(0.0), _ + _)

  /** Envelope across every part's points. */
  def stEnvelopeMulti(g: Column): Column =
    stEnvelope(flatten(transform(g.getField("geoms"), _.getField("pts"))))

  /** geometry_union_agg (reference geospatial/aggregation/
    * GeometryUnionAgg.java) over pairwise-DISJOINT parts: the union of
    * disjoint geometries IS their collection, returned as the tagged
    * multi struct with parts sorted for engine determinism. Dissolving
    * overlapping boundaries needs full polygon clipping — documented out
    * of scope (SURVEY known gaps); at 100 TB this is a KB-bounded
    * collect_list per group, mergeable map-side like any collection agg. */
  def geometryUnionAgg(g: Column): Column =
    struct(lit("ST_GeometryCollection").as("gtype"),
      sort_array(collect_list(g)).as("geoms"))

  // ---- Scalar set operations (reference geospatial/GeoFunctions.java
  // ST_Union / ST_Intersection / ST_Difference, Esri-backed there) for
  // CONVEX single-ring polygons, as pure Catalyst HOF expressions:
  //  * ST_Intersection — Sutherland–Hodgman: fold a half-plane clip of A
  //    over B's edges. Exact region semantics for convex ∩ convex.
  //  * ST_Difference — wedge decomposition: A\B = ⋃_i (A ∩ outside(e_i) ∩
  //    inside(e_0..i−1)) over B's edges; the pieces are convex, disjoint,
  //    and cover A\B exactly, returned as a multi-part collection.
  //  * ST_Union — A ⊎ (B\A): region-correct disjoint decomposition.
  //    DEVIATION from the reference: overlapping unions return the
  //    decomposition, not the dissolved single outline — area/envelope/
  //    numGeometries/contains agree; canonical WKT does not.
  // Rings are CCW (the repo's square builders emit CCW); all arithmetic is
  // cross-product orientation + one division per clip vertex.

  /** ST_Intersection for convex CCW rings → tagged polygon ('ST_Empty'
    * when the clipped region is degenerate). Sutherland–Hodgman half-plane
    * fold, evaluated by the native ConvexGeomOp kernel (GeomKernels.scala)
    * — one expression node instead of a clip tower of HOF combinators. */
  def stIntersectionConvex(ringA: Column, ringB: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(ConvexGeomOp(
      org.apache.spark.sql.graftbridge.Bridge.expression(ringA),
      org.apache.spark.sql.graftbridge.Bridge.expression(ringB),
      "intersection"))

  /** ST_Difference for convex CCW rings → tagged collection of the wedge
    * pieces A\B = ⋃_i (A ∩ outside(e_i) ∩ inside(e_0..i−1)); empty
    * collection when A ⊆ B. Native ConvexGeomOp kernel. */
  def stDifferenceConvex(ringA: Column, ringB: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(ConvexGeomOp(
      org.apache.spark.sql.graftbridge.Bridge.expression(ringA),
      org.apache.spark.sql.graftbridge.Bridge.expression(ringB),
      "difference"))

  /** ST_Union for convex CCW rings → region-correct disjoint decomposition
    * A ⊎ (B\A) as a tagged collection. Native ConvexGeomOp kernel. */
  def stUnionConvex(ringA: Column, ringB: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(ConvexGeomOp(
      org.apache.spark.sql.graftbridge.Bridge.expression(ringA),
      org.apache.spark.sql.graftbridge.Bridge.expression(ringB),
      "union"))

  /** General (concave/holed) set ops over ring LISTS (exterior first,
    * holes after) → tagged collection of disjoint convex pieces. The
    * GeneralGeomOp kernel ear-clips to convex pieces and overlays them
    * through the exact convex kernels; convex single-ring inputs take
    * the identical ConvexGeomOp arithmetic (reference geospatial/
    * GeoFunctions.java ST_Intersection/ST_Union/ST_Difference/
    * ST_SymDifference, Esri general overlay there). */
  private def generalGeomOp(op: String)(ringsA: Column, ringsB: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(GeneralGeomOp(
      org.apache.spark.sql.graftbridge.Bridge.expression(ringsA),
      org.apache.spark.sql.graftbridge.Bridge.expression(ringsB), op))
  def stIntersectionGeneral(ringsA: Column, ringsB: Column): Column =
    generalGeomOp("intersection")(ringsA, ringsB)
  def stDifferenceGeneral(ringsA: Column, ringsB: Column): Column =
    generalGeomOp("difference")(ringsA, ringsB)
  def stUnionGeneral(ringsA: Column, ringsB: Column): Column =
    generalGeomOp("union")(ringsA, ringsB)
  def stSymDifferenceGeneral(ringsA: Column, ringsB: Column): Column =
    generalGeomOp("symdifference")(ringsA, ringsB)

  /** ST_Union over point rows (the other common reference use): distinct
    * points as a MULTIPOINT. */
  def stUnionPoints(pts: Column): Column =
    struct(lit("ST_MultiPoint").as("gtype"),
      transform(array_sort(array_distinct(pts)),
        p => struct(lit("ST_Point").as("gtype"), array(p).as("pts"))).as("geoms"))

  // ---- SphericalGeography slice (reference geospatial/
  // SphericalGeoFunctions.java): to_spherical_geography re-tags a
  // lon/lat geometry; ST_Distance returns METERS on the sphere via
  // haversine with the reference's earth radius. sinh/atan-free formula
  // so both engines evaluate the identical double expression tree. ----

  private val EarthRadiusM = 6371010.0 // SphericalGeoFunctions.java EARTH_RADIUS_M

  /** to_spherical_geography: validates lon/lat domain, re-tags the struct. */
  def toSphericalGeography(g: Column): Column = {
    val pts = g.getField("pts")
    val ok = forall(pts, p =>
      abs(stX(p)) <= 180.0 && abs(stY(p)) <= 90.0)
    when(ok, struct(concat(lit("Spherical:"), g.getField("gtype")).as("gtype"),
      pts.as("pts")))
      .otherwise(raise_error(concat(lit(
        "to_spherical_geography: longitude/latitude out of range in "),
        g.getField("gtype"))))
  }

  /** Haversine distance in meters between two lon/lat points. */
  def sphericalDistanceM(a: Column, b: Column): Column = {
    val lat1 = radians(stY(a)); val lat2 = radians(stY(b))
    val dLat = lat2 - lat1
    val dLon = radians(stX(b)) - radians(stX(a))
    val h = pow(sin(dLat / 2), 2) +
      cos(lat1) * cos(lat2) * pow(sin(dLon / 2), 2)
    lit(2.0 * EarthRadiusM) * asin(least(lit(1.0), sqrt(h)))
  }

  /** ST_Distance on SphericalGeography points (meters). */
  def stSphericalDistance(ga: Column, gb: Column): Column =
    sphericalDistanceM(element_at(ga.getField("pts"), 1),
      element_at(gb.getField("pts"), 1))

  /** ST_Area on SphericalGeography polygons (SphericalGeoFunctions.java:134
    * + SphericalExcessCalculator:333): cyclic per-edge excess sum
    * 2·atan2(tan(Δλ/2)·(tan(φ1/2)+tan(φ2/2)), 1+tan(φ1/2)·tan(φ2/2)),
    * area = |excess|·R² in m². The reference's pole-enclosure correction
    * (courseDelta ±2π bookkeeping) is out of this slice — rings crossing
    * or enclosing a pole are not supported. */
  def stSphericalArea(g: Column): Column = {
    val pts = g.getField("pts")
    val excess = aggregate(
      zip_with(pts, rotatedRing(pts), (a, b) => {
        val t1 = tan(radians(stY(a)) / 2)
        val t2 = tan(radians(stY(b)) / 2)
        val dl = radians(stX(b)) - radians(stX(a))
        lit(2.0) * atan2(tan(dl / 2) * (t1 + t2), lit(1.0) + t1 * t2)
      }), lit(0.0), _ + _)
    abs(excess) * lit(EarthRadiusM * EarthRadiusM)
  }

  /** ST_Centroid on SphericalGeography (SphericalGeoFunctions.java:256):
    * POINT returns itself; MULTIPOINT sums the points' 3D unit vectors
    * (x=cosφcosλ, y=cosφsinλ, z=sinφ), normalizes, and projects back to
    * lon/lat — the reference's CartesianPoint average. Other types raise
    * there (TODO'd) and here. */
  def stSphericalCentroid(g: Column): Column = {
    val pts = g.getField("pts")
    def vx(p: Column) = cos(radians(stY(p))) * cos(radians(stX(p)))
    def vy(p: Column) = cos(radians(stY(p))) * sin(radians(stX(p)))
    def vz(p: Column) = sin(radians(stY(p)))
    val xs = aggregate(pts, lit(0.0), (a, p) => a + vx(p))
    val ys = aggregate(pts, lit(0.0), (a, p) => a + vy(p))
    val zs = aggregate(pts, lit(0.0), (a, p) => a + vz(p))
    val len = sqrt(xs * xs + ys * ys + zs * zs)
    val lon = degrees(atan2(ys, xs))
    val lat = degrees(asin(zs / len))
    when(!g.getField("gtype").isin("Spherical:ST_Point", "Spherical:ST_MultiPoint"),
      raise_error(concat(lit("ST_Centroid: unsupported spherical type "),
        g.getField("gtype"))))
      .when(size(pts) === 1,
        struct(lit("Spherical:ST_Point").as("gtype"),
          org.apache.spark.sql.functions.array(element_at(pts, 1)).as("pts")))
      .otherwise(struct(lit("Spherical:ST_Point").as("gtype"),
        org.apache.spark.sql.functions.array(stPoint(lon, lat)).as("pts")))
  }

  /** ST_AsText on SphericalGeography (SphericalGeoFunctions.java ST_AsText
    * — same WKT as the planar geometry): untag and render. */
  def stAsTextSpherical(g: Column): Column =
    stAsText(struct(
      regexp_replace(g.getField("gtype"), "^Spherical:", "").as("gtype"),
      g.getField("pts").as("pts")))

  /** ST_Length on a SphericalGeography linestring (meters). */
  def stSphericalLength(g: Column): Column = {
    val pts = g.getField("pts")
    // equal-length slices: zip_with pads the shorter side with nulls,
    // which least(1.0, null) would silently turn into antipodal distances
    aggregate(
      zip_with(slice(pts, lit(1), size(pts) - 1),
        slice(pts, lit(2), size(pts) - 1),
        (a, b) => sphericalDistanceM(a, b)),
      lit(0.0), _ + _)
  }

  // ---- Bing tile completions (reference geospatial/BingTileFunctions.java
  // bingTilePolygon / geometryToBingTiles). ----

  private def num2lon(x: Column, zoom: Column): Column =
    x / pow(lit(2.0), zoom) * 360.0 - 180.0

  /** Inverse web-mercator: tile row → latitude. sinh spelled as
    * (e^n − e^−n)/2 so Spark and any SQL oracle share the exact double
    * expression tree. */
  private def num2lat(y: Column, zoom: Column): Column = {
    val n = lit(math.Pi) * (lit(1.0) - lit(2.0) * y / pow(lit(2.0), zoom))
    degrees(atan((exp(n) - exp(-n)) / 2.0))
  }

  /** bing_tile_polygon(tile) → tagged CCW polygon of the tile envelope
    * (BingTileFunctions.java tilePolygon). */
  def bingTilePolygon(tile: Column): Column = {
    val x = tile.getField("x").cast("double")
    val y = tile.getField("y").cast("double")
    val z = tile.getField("zoom").cast("double")
    val lonW = num2lon(x, z); val lonE = num2lon(x + 1, z)
    val latN = num2lat(y, z); val latS = num2lat(y + 1, z)
    struct(lit("ST_Polygon").as("gtype"), array(
      stPoint(lonW, latS), stPoint(lonE, latS),
      stPoint(lonE, latN), stPoint(lonW, latN)).as("pts"))
  }

  private def lon2tileX(lon: Column, zoom: Column): Column =
    floor((lon + 180.0) / 360.0 * pow(lit(2.0), zoom)).cast("long")

  private def lat2tileY(lat: Column, zoom: Column): Column = {
    val rad = radians(lat)
    floor((lit(1.0) - log(tan(rad) + lit(1.0) / cos(rad)) / lit(math.Pi)) /
      2.0 * pow(lit(2.0), zoom)).cast("long")
  }

  /** geometry_to_bing_tiles(geometry, zoom): every tile whose envelope
    * meets the geometry's envelope (BingTileFunctions.java covers by
    * envelope at tile granularity). Returns array<struct<x,y,zoom>> in
    * row-major order. */
  def geometryToBingTiles(g: Column, zoom: Column): Column = {
    val env = stEnvelope(g.getField("pts"))
    val x0 = lon2tileX(env.getField("xmin"), zoom)
    val x1 = lon2tileX(env.getField("xmax"), zoom)
    val y0 = lat2tileY(env.getField("ymax"), zoom) // north → smaller row
    val y1 = lat2tileY(env.getField("ymin"), zoom)
    flatten(transform(sequence(y0, y1), y =>
      transform(sequence(x0, x1), x =>
        struct(x.cast("int").as("x"), y.cast("int").as("y"),
          zoom.cast("int").as("zoom")))))
  }

  // ---- Geometry accessors + validity (reference GeoFunctions.java
  // ST_X/ST_Y:536, ST_XMin/XMax/YMin/YMax, ST_IsClosed, ST_IsEmpty,
  // ST_IsSimple, ST_IsRing, ST_IsValid/geometry_invalid_reason,
  // ST_Dimension, ST_CoordDim, ST_Boundary, ST_Points, ST_EnvelopeAsPts).
  // All over the tagged struct<gtype,pts> — composed from codegen'd
  // built-ins, no UDFs; type-contract violations raise (TRY-recoverable)
  // exactly like the reference's @SqlType guards. ----

  private def gPts(g: Column): Column = g.getField("pts")
  private def gType(g: Column): Column = g.getField("gtype")

  /** ST_X(point geometry) — raises on non-points like the reference. */
  def stXOf(g: Column): Column =
    when(gType(g) === "ST_Point", stX(element_at(gPts(g), 1)))
      .otherwise(raise_error(
        concat(lit("ST_X: expected ST_Point, got "), gType(g))).cast("double"))

  /** ST_Y(point geometry). */
  def stYOf(g: Column): Column =
    when(gType(g) === "ST_Point", stY(element_at(gPts(g), 1)))
      .otherwise(raise_error(
        concat(lit("ST_Y: expected ST_Point, got "), gType(g))).cast("double"))

  def stXMin(g: Column): Column = array_min(transform(gPts(g), stX(_)))
  def stXMax(g: Column): Column = array_max(transform(gPts(g), stX(_)))
  def stYMin(g: Column): Column = array_min(transform(gPts(g), stY(_)))
  def stYMax(g: Column): Column = array_max(transform(gPts(g), stY(_)))

  /** ST_IsEmpty: no coordinates (EMPTY WKT parses to an empty array). */
  def stIsEmpty(g: Column): Column = size(gPts(g)) <= 0

  /** ST_IsClosed on a LineString: first vertex equals last. */
  def stIsClosed(g: Column): Column =
    when(gType(g) === "ST_LineString",
      element_at(gPts(g), 1) === element_at(gPts(g), -1))
      .otherwise(raise_error(concat(
        lit("ST_IsClosed: expected ST_LineString, got "),
        gType(g))).cast("boolean"))

  /** Any two NON-ADJACENT segments of the path intersect, or any two
    * adjacent segments overlap beyond the shared vertex (spike/backtrack).
    * The self-intersection core of ST_IsSimple / ST_IsRing / ST_IsValid —
    * native O(n²) pair scan (GeomKernels.PathSelfIntersects). */
  private def pathSelfIntersects(pts: Column, closed: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(PathSelfIntersects(
      org.apache.spark.sql.graftbridge.Bridge.expression(pts),
      org.apache.spark.sql.graftbridge.Bridge.expression(closed)))

  /** ST_IsSimple: points always; linestrings iff no self-intersection
    * (consecutive duplicate vertices also break simplicity). */
  def stIsSimple(g: Column): Column = {
    val pts = gPts(g)
    val dupConsec = exists(
      zip_with(slice(pts, lit(1), greatest(size(pts) - 1, lit(0))),
        slice(pts, lit(2), greatest(size(pts) - 1, lit(0))),
        (a, b) => a === b), x => x)
    when(gType(g) === "ST_Point", lit(true))
      .when(gType(g) === "ST_LineString",
        !dupConsec && !pathSelfIntersects(pts,
          element_at(pts, 1) === element_at(pts, -1)))
      .when(gType(g) === "ST_Polygon",
        !pathSelfIntersects(concat(pts, slice(pts, lit(1), lit(1))), lit(true)))
      .otherwise(lit(false))
  }

  /** ST_IsRing: closed AND simple linestring. */
  def stIsRing(g: Column): Column = stIsClosed(g) && stIsSimple(g)

  /** geometry_invalid_reason (reference GeoFunctions.java invalid/
    * non-simple reporting): NULL when valid, else the first failing
    * contract. ST_IsValid = reason IS NULL. Polygons: ≥3 distinct
    * vertices, non-zero area, no ring self-crossing. */
  def geometryInvalidReason(g: Column): Column = {
    val pts = gPts(g)
    val ring = concat(pts, slice(pts, lit(1), lit(1)))
    when(gType(g) === "ST_Polygon" &&
        size(array_distinct(pts)) < 3, lit("Polygon has fewer than 3 distinct vertices"))
      .when(gType(g) === "ST_Polygon" && stArea(pts) === 0.0,
        lit("Polygon is degenerate (zero area)"))
      .when(gType(g) === "ST_Polygon" && pathSelfIntersects(ring, lit(true)),
        lit("Polygon ring self-intersects"))
      .when(gType(g) === "ST_LineString" && size(pts) < 2,
        lit("LineString has fewer than 2 points"))
      .otherwise(lit(null).cast("string"))
  }

  def stIsValid(g: Column): Column = geometryInvalidReason(g).isNull

  /** ST_Dimension: 0 point, 1 line, 2 polygon. */
  def stDimension(g: Column): Column =
    when(gType(g).endsWith("Point"), lit(0))
      .when(gType(g).endsWith("LineString"), lit(1))
      .otherwise(lit(2)).cast("int")

  /** ST_CoordDim — the tagged struct is always planar x/y. */
  def stCoordDim(g: Column): Column = lit(2).cast("int")

  /** ST_Boundary: point → empty collection, open line → its two
    * endpoints as MULTIPOINT (closed → empty), polygon → the closed
    * ring as LINESTRING. Matches the reference's Esri boundary shapes. */
  def stBoundary(g: Column): Column = {
    val pts = gPts(g)
    val emptyParts = array().cast("array<struct<gtype:string,pts:array<struct<x:double,y:double>>>>")
    val closed = element_at(pts, 1) === element_at(pts, -1)
    when(gType(g) === "ST_Point",
      struct(lit("ST_GeometryCollection").as("gtype"), emptyParts.as("geoms")))
      .when(gType(g) === "ST_LineString" && closed,
        struct(lit("ST_MultiPoint").as("gtype"), emptyParts.as("geoms")))
      .when(gType(g) === "ST_LineString",
        struct(lit("ST_MultiPoint").as("gtype"), array(
          struct(lit("ST_Point").as("gtype"), slice(pts, lit(1), lit(1)).as("pts")),
          struct(lit("ST_Point").as("gtype"),
            slice(pts, size(pts), lit(1)).as("pts"))).as("geoms")))
      .otherwise( // polygon: ring closes explicitly, like WKT output
        struct(lit("ST_MultiLineString").as("gtype"), array(
          struct(lit("ST_LineString").as("gtype"),
            concat(pts, slice(pts, lit(1), lit(1))).as("pts"))).as("geoms")))
  }

  /** ST_Points: every vertex, in order, as an array of point geometries
    * (reference returns ARRAY(Geometry)). */
  def stPoints(g: Column): Column =
    transform(gPts(g), p =>
      struct(lit("ST_Point").as("gtype"), array(p).as("pts")))

  /** ST_EnvelopeAsPts: [bottom-left, top-right] corner points. */
  def stEnvelopeAsPts(g: Column): Column = {
    val e = stEnvelope(gPts(g))
    array(
      struct(lit("ST_Point").as("gtype"),
        array(stPoint(e.getField("xmin"), e.getField("ymin"))).as("pts")),
      struct(lit("ST_Point").as("gtype"),
        array(stPoint(e.getField("xmax"), e.getField("ymax"))).as("pts")))
  }

  // ---- ST_ConvexHull (scalar, GeoFunctions.java ST_ConvexHull), ST_Equals,
  // ST_SymDifference — monotone chain spelled entirely in HOFs so the hull
  // stays inside whole-stage codegen. ----

  /** One monotone-chain half-hull sweep: fold points in, popping while the
    * last two hull points and the incoming one make a non-left turn. The
    * inner pop-while is a bounded fold over the current hull size (hull
    * can shrink at most size(h) times per insert). */
  /** ST_ConvexHull over any vertex set → CCW ring (unclosed, starting at
    * the lexicographically smallest vertex — Andrew's monotone chain,
    * the same contract as convex_hull_agg). Degenerate inputs (<3 hull
    * points) return the distinct vertex set. Native ConvexHullRing kernel
    * (GeomKernels.scala). */
  def stConvexHullRing(pts: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(ConvexHullRing(
      org.apache.spark.sql.graftbridge.Bridge.expression(pts)))

  /** ST_ConvexHull on a tagged geometry → tagged polygon (or the input
    * when degenerate). */
  def stConvexHull(g: Column): Column = {
    val hull = stConvexHullRing(gPts(g))
    when(size(hull) >= 3,
      struct(lit("ST_Polygon").as("gtype"), hull.as("pts")))
      .otherwise(g)
  }

  /** ST_Equals: same point set. Points compare directly; linestrings up
    * to direction reversal; polygon rings by mutual containment (so
    * rotation + orientation insensitive). */
  def stEquals(a: Column, b: Column): Column = {
    val pa = gPts(a); val pb = gPts(b)
    when(gType(a) =!= gType(b), lit(false))
      .when(gType(a) === "ST_Point", element_at(pa, 1) === element_at(pb, 1))
      .when(gType(a) === "ST_LineString", pa === pb || pa === reverse(pb))
      .otherwise(stPolygonContains(pa, pb) && stPolygonContains(pb, pa))
  }

  /** ST_SymDifference for convex CCW rings: (A\B) ⊎ (B\A) as a tagged
    * collection (GeoFunctions.java ST_SymDifference via Esri). Native
    * ConvexGeomOp kernel. */
  def stSymDifferenceConvex(ringA: Column, ringB: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(ConvexGeomOp(
      org.apache.spark.sql.graftbridge.Bridge.expression(ringA),
      org.apache.spark.sql.graftbridge.Bridge.expression(ringB),
      "symdifference"))

  // ---- Polygons with interior rings (holes): WKT POLYGON ((outer),
  // (hole)…) → struct<gtype, rings: array<array<point>>>. Reference:
  // GeoFunctions.java ST_ExteriorRing, ST_InteriorRingN,
  // ST_NumInteriorRing, ST_InteriorRings; area/contains subtract holes. ----

  /** Parse POLYGON WKT with optional interior rings. Rings keep WKT order
    * (exterior first); closure vertices are dropped like the single-ring
    * parser. */
  def stPolygonWithHoles(w: Column): Column = {
    val groups = regexp_extract_all(w, lit("\\(([^()]+)\\)"), lit(1))
    struct(lit("ST_Polygon").as("gtype"),
      transform(groups, s => dropClosure(wktCoords(s))).as("rings"))
  }

  /** ST_ExteriorRing → the closed outer ring as a LINESTRING geometry. */
  def stExteriorRing(g: Column): Column = {
    val outer = element_at(g.getField("rings"), 1)
    struct(lit("ST_LineString").as("gtype"),
      concat(outer, slice(outer, lit(1), lit(1))).as("pts"))
  }

  def stNumInteriorRing(g: Column): Column =
    greatest(size(g.getField("rings")) - 1, lit(0)).cast("long")

  /** ST_InteriorRingN (1-based) → closed LINESTRING. */
  def stInteriorRingN(g: Column, n: Column): Column = {
    val ring = element_at(g.getField("rings"), n + 1)
    struct(lit("ST_LineString").as("gtype"),
      concat(ring, slice(ring, lit(1), lit(1))).as("pts"))
  }

  /** ST_InteriorRings → array of closed LINESTRING geometries. */
  def stInteriorRings(g: Column): Column =
    transform(slice(g.getField("rings"), lit(2),
      greatest(size(g.getField("rings")) - 1, lit(0))), ring =>
      struct(lit("ST_LineString").as("gtype"),
        concat(ring, slice(ring, lit(1), lit(1))).as("pts")))

  /** ST_Area of a polygon with holes: |outer| − Σ|holes| (rings must not
    * overlap — the WKT validity contract). */
  def stAreaWithHoles(g: Column): Column =
    aggregate(
      zip_with(g.getField("rings"),
        sequence(lit(1), size(g.getField("rings"))),
        (ring, i) => when(i === 1, stArea(ring)).otherwise(-stArea(ring))),
      lit(0.0), _ + _)

  /** ST_Contains(polygon-with-holes, point): inside the outer ring and
    * outside every hole. */
  def stContainsPointWithHoles(g: Column, p: Column): Column = {
    val rings = g.getField("rings")
    stContainsPoint(element_at(rings, 1), p) &&
      !exists(slice(rings, lit(2), greatest(size(rings) - 1, lit(0))),
        hole => stContainsPoint(hole, p))
  }

  // ---- line_locate_point / line_interpolate_point (reference
  // GeoFunctions.java lineLocatePoint:1368, lineInterpolatePoint): both a
  // single fold over the segment list carrying (cumulative length, best)
  // state — no UDF, stays in codegen. ----

  /** line_locate_point(line, point) → fraction in [0,1] of the line's
    * length at the point closest to `point`. */
  def lineLocatePoint(line: Column, p: Column): Column = {
    val segs = pathSegments(line)
    val total = stLineLength(line)
    def d2(a: Column, b: Column): Column =
      pow(stX(a) - stX(b), 2) + pow(stY(a) - stY(b), 2)
    // fold state: (cum length so far, best squared distance, arc length at best)
    val init = struct(lit(0.0).as("cum"), lit(Double.MaxValue).as("best"),
      lit(0.0).as("at"))
    val state = aggregate(segs, init, (st, s) => {
      val a = s.getField("p"); val b = s.getField("q")
      val len = sqrt(d2(a, b))
      // projection parameter clamped to the segment
      val t = when(len === 0.0, lit(0.0)).otherwise(
        least(lit(1.0), greatest(lit(0.0),
          ((stX(p) - stX(a)) * (stX(b) - stX(a)) +
           (stY(p) - stY(a)) * (stY(b) - stY(a))) / (len * len))))
      val proj = stPoint(stX(a) + t * (stX(b) - stX(a)),
        stY(a) + t * (stY(b) - stY(a)))
      val dist = d2(p, proj)
      struct(
        (st.getField("cum") + len).as("cum"),
        when(dist < st.getField("best"), dist)
          .otherwise(st.getField("best")).as("best"),
        when(dist < st.getField("best"), st.getField("cum") + t * len)
          .otherwise(st.getField("at")).as("at"))
    })
    when(total === 0.0, lit(0.0)).otherwise(state.getField("at") / total)
  }

  /** line_interpolate_point(line, fraction) → the point at `fraction` of
    * the line's total length. Fraction outside [0,1] raises like the
    * reference. */
  def lineInterpolatePoint(line: Column, frac: Column): Column = {
    val segs = pathSegments(line)
    val target = stLineLength(line) * frac
    val init = struct(lit(0.0).as("cum"),
      lit(null).cast("struct<x:double,y:double>").as("pt"))
    val state = aggregate(segs, init, (st, s) => {
      val a = s.getField("p"); val b = s.getField("q")
      val len = sqrt(pow(stX(b) - stX(a), 2) + pow(stY(b) - stY(a), 2))
      val endCum = st.getField("cum") + len
      val t = when(len === 0.0, lit(0.0))
        .otherwise((target - st.getField("cum")) / len)
      val here = stPoint(stX(a) + t * (stX(b) - stX(a)),
        stY(a) + t * (stY(b) - stY(a)))
      struct(endCum.as("cum"),
        when(st.getField("pt").isNull && target <= endCum, here)
          .otherwise(st.getField("pt")).as("pt"))
    })
    val res = coalesce(state.getField("pt"), element_at(line, -1))
    when(frac < 0.0 || frac > 1.0,
      raise_error(lit("line_interpolate_point: fraction must be in [0, 1]"))
        .cast("struct<gtype:string,pts:array<struct<x:double,y:double>>>"))
      .otherwise(struct(lit("ST_Point").as("gtype"), array(res).as("pts")))
  }

  // ---- WKB + simplify (reference GeoFunctions.java ST_AsBinary /
  // ST_GeomFromBinary / simplifyGeometry). ----

  import org.apache.spark.sql.graftbridge.Bridge

  /** ST_AsBinary(tagged geometry) → big-endian OGC WKB. */
  def stAsBinary(g: Column): Column =
    Bridge.column(WkbEncode(Bridge.expression(g)))

  /** ST_GeomFromBinary(varbinary) → tagged geometry (either endianness). */
  def stGeomFromBinary(b: Column): Column =
    Bridge.column(WkbDecode(Bridge.expression(b)))

  /** simplify_geometry: Douglas–Peucker on the vertex path, tag kept.
    * Points pass through unchanged. */
  def simplifyGeometry(g: Column, tol: Column): Column =
    struct(gType(g).as("gtype"),
      Bridge.column(SimplifyPath(Bridge.expression(gPts(g)),
        Bridge.expression(tol.cast("double")))).as("pts"))

  /** ST_Geometries: the component list of a multi-geometry (reference
    * returns ARRAY(Geometry); NULL for empty like the reference). */
  def stGeometries(g: Column): Column =
    when(size(g.getField("geoms")) > 0, g.getField("geoms"))
      .otherwise(lit(null))

  // ---- ST_Relate (reference GeoFunctions.java ST_Relate via Esri
  // relate): DE-9IM intersection matrix for SIMPLE SINGLE-RING POLYGON
  // pairs, synthesized from the same division-free orientation witnesses
  // the relation predicates use. Entries are exact for polygons whose
  // boundaries meet in finitely many points or whole collinear edges
  // (the same contract as ST_Touches/Overlaps above). ----

  /** Two edges collinear with >0-length overlap (the BB='1' witness). */
  private def collinearEdgeOverlap(edgesA: Column, edgesB: Column): Column =
    exists(edgesA, ea => exists(edgesB, eb => {
      val p = ea.getField("p"); val q = ea.getField("q")
      val r = eb.getField("p"); val s = eb.getField("q")
      def cross3(o: Column, a: Column, b: Column): Column =
        (stX(a) - stX(o)) * (stY(b) - stY(o)) -
          (stY(a) - stY(o)) * (stX(b) - stX(o))
      val dr = (stX(r) - stX(p)) * (stX(q) - stX(p)) +
        (stY(r) - stY(p)) * (stY(q) - stY(p))
      val dsv = (stX(s) - stX(p)) * (stX(q) - stX(p)) +
        (stY(s) - stY(p)) * (stY(q) - stY(p))
      val len2 = pow(stX(q) - stX(p), 2) + pow(stY(q) - stY(p), 2)
      cross3(p, q, r) === 0 && cross3(p, q, s) === 0 &&
        greatest(lit(0.0), least(dr, dsv)) < least(len2, greatest(dr, dsv))
    }))

  /** DE-9IM matrix (row-major IIxIB…EE, '0'/'1'/'2'/'F') for two simple
    * polygon rings. */
  def stRelateMatrix(ringA: Column, ringB: Column): Column = {
    val ab = stPolygonContains(ringA, ringB) // A covers B
    val ba = stPolygonContains(ringB, ringA)
    val ii = interiorsIntersect(ringA, ringB) || ab || ba
    val properOrInsideAB = // I(a) ∩ B(b) witness: B's boundary enters A's interior
      exists(ringB, v => strictlyInside(ringA, v)) ||
        anyProperCross(ringEdges(ringA), ringEdges(ringB))
    val properOrInsideBA =
      exists(ringA, v => strictlyInside(ringB, v)) ||
        anyProperCross(ringEdges(ringA), ringEdges(ringB))
    val edgeOverlap = collinearEdgeOverlap(ringEdges(ringA), ringEdges(ringB))
    val boundariesTouch = anySegPair(ringEdges(ringA), ringEdges(ringB))
    concat(
      when(ii, "2").otherwise("F"),
      when(properOrInsideAB, "1").otherwise("F"),
      when(ba, "F").otherwise("2"),
      when(properOrInsideBA, "1").otherwise("F"),
      when(edgeOverlap, "1").when(boundariesTouch, "0").otherwise("F"),
      when(ba, "F").otherwise("1"),
      when(ab, "F").otherwise("2"),
      when(ab, "F").otherwise("1"),
      lit("2"))
  }

  /** ST_Relate(a, b, pattern): DE-9IM pattern match — 'T' = any non-F,
    * 'F' = F, '*' = anything, digit = exact dimension. */
  def stRelate(ringA: Column, ringB: Column, pattern: Column): Column =
    stRelateOnMatrix(stRelateMatrix(ringA, ringB), pattern)

  /** Pattern test over an ALREADY-computed DE-9IM matrix string — lets a
    * caller evaluating several patterns against one pair compute the
    * (expensive) matrix once and reuse the 9-char string. */
  def stRelateOnMatrix(m: Column, pattern: Column): Column = {
    forall(sequence(lit(1), lit(9)), i => {
      val have = m.substr(i.cast("int"), lit(1))
      val want = upper(pattern.substr(i.cast("int"), lit(1)))
      (want === "*") ||
        (want === "T" && have =!= "F") ||
        (want === have)
    })
  }

  // ---- Bing tile family completions (BingTileFunctions.java bingTile
  // constructors, bingTileCoordinates, bingTileZoomLevel, parent/children,
  // quadkey decode). All dyadic integer arithmetic on the struct. ----

  /** bing_tile(x, y, zoom) — validated constructor. */
  def bingTile(x: Column, y: Column, zoom: Column): Column = {
    val n = pow(lit(2.0), zoom.cast("double"))
    when(zoom.between(0, 23) && x >= 0 && y >= 0 && x < n && y < n,
      struct(x.cast("int").as("x"), y.cast("int").as("y"),
        zoom.cast("int").as("zoom")))
      .otherwise(raise_error(lit("bing_tile: coordinates out of range for zoom"))
        .cast("struct<x:int,y:int,zoom:int>"))
  }

  /** bing_tile(quadkey) — base-4 digit fold: each level shifts x/y left
    * and adds the digit's bit pair. */
  def bingTileFromQuadkey(qk: Column): Column = {
    val digits = split(qk, "")
    val folded = aggregate(digits,
      struct(lit(0L).as("x"), lit(0L).as("y")),
      (acc, ch) => {
        val d = ch.cast("int")
        struct((acc.getField("x") * 2 + (d % 2)).as("x"),
          (acc.getField("y") * 2 + (d.cast("int") / 2).cast("int")).as("y"))
      })
    when(length(qk).between(1, 23) && qk.rlike("^[0-3]+$"),
      struct(folded.getField("x").cast("int").as("x"),
        folded.getField("y").cast("int").as("y"),
        length(qk).cast("int").as("zoom")))
      .otherwise(raise_error(lit("bing_tile: invalid quadkey"))
        .cast("struct<x:int,y:int,zoom:int>"))
  }

  def bingTileCoordinates(t: Column): Column =
    struct(t.getField("x").as("x"), t.getField("y").as("y"))

  def bingTileZoomLevel(t: Column): Column = t.getField("zoom")

  /** bing_tile_parent(tile[, newZoom]) — ancestor at a coarser zoom. */
  def bingTileParent(t: Column, newZoom: Column): Column = {
    val dz = t.getField("zoom") - newZoom
    val scale = pow(lit(2.0), dz.cast("double"))
    when(newZoom.between(0, 23) && dz >= 0,
      struct(floor(t.getField("x") / scale).cast("int").as("x"),
        floor(t.getField("y") / scale).cast("int").as("y"),
        newZoom.cast("int").as("zoom")))
      .otherwise(raise_error(lit("bing_tile_parent: newZoom above tile zoom"))
        .cast("struct<x:int,y:int,zoom:int>"))
  }
  def bingTileParent(t: Column): Column =
    bingTileParent(t, t.getField("zoom") - 1)

  /** bing_tile_children(tile) — the 4 tiles one level finer, row-major. */
  def bingTileChildren(t: Column): Column = {
    val x2 = t.getField("x") * 2; val y2 = t.getField("y") * 2
    val z = t.getField("zoom") + 1
    transform(sequence(lit(0), lit(3)), i =>
      struct((x2 + i % 2).cast("int").as("x"),
        (y2 + (i / 2).cast("int")).cast("int").as("y"), z.cast("int").as("zoom")))
  }

  // ---- GeoJSON (GeoFunctions.java geometryAsGeoJson / geometryFromGeoJson
  // via Esri's OGCGeometry GeoJSON import/export): composed from string/
  // regexp builtins over the tagged struct. ----

  /** geometry_as_geojson(geometry) → RFC 7946 text. */
  def geometryAsGeoJson(g: Column): Column = {
    val pts = gPts(g)
    def xy(p: Column): Column =
      concat(lit("["), stX(p).cast("string"), lit(","),
        stY(p).cast("string"), lit("]"))
    def list(ps: Column): Column = concat_ws(",", transform(ps, xy(_)))
    when(gType(g) === "ST_Point",
      concat(lit("""{"type":"Point","coordinates":"""),
        xy(element_at(pts, 1)), lit("}")))
      .when(gType(g) === "ST_LineString",
        concat(lit("""{"type":"LineString","coordinates":["""),
          list(pts), lit("]}")))
      .when(gType(g) === "ST_Polygon", // ring closes explicitly per RFC 7946
        concat(lit("""{"type":"Polygon","coordinates":[["""),
          list(concat(pts, slice(pts, lit(1), lit(1)))), lit("]]}")))
  }

  /** geometry_from_geojson(json) → tagged geometry. Coordinates are read
    * positionally (GeoJSON nests but never reorders them); polygon
    * closure re-opens like the WKT parser. */
  def geometryFromGeoJson(j: Column): Column = {
    val t = get_json_object(j, "$.type")
    val gtype = when(t === "Point", lit("ST_Point"))
      .when(t === "LineString", lit("ST_LineString"))
      .when(t === "Polygon", lit("ST_Polygon"))
    val coordText = regexp_extract(j, """(?s)"coordinates"\s*:\s*(.*)\s*\}\s*$""", 1)
    val nums = regexp_extract_all(coordText,
      lit("-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?"), lit(0))
    val pairs = transform(sequence(lit(1), (size(nums) / 2).cast("int")), i =>
      struct(element_at(nums, i * 2 - 1).cast("double").as("x"),
        element_at(nums, i * 2).cast("double").as("y")))
    val pts = when(gtype === "ST_Polygon", dropClosure(pairs)).otherwise(pairs)
    struct(gtype.as("gtype"), pts.as("pts"))
  }

  /** expand_envelope(geometry, distance) → the envelope grown by
    * `distance` on every side, as a CCW polygon (GeoFunctions.java
    * expandEnvelope). Negative distance raises like the reference. */
  def expandEnvelope(g: Column, d: Column): Column = {
    val e = stEnvelope(gPts(g))
    val ring = array(
      stPoint(e.getField("xmin") - d, e.getField("ymin") - d),
      stPoint(e.getField("xmax") + d, e.getField("ymin") - d),
      stPoint(e.getField("xmax") + d, e.getField("ymax") + d),
      stPoint(e.getField("xmin") - d, e.getField("ymax") + d))
    when(d < 0, raise_error(lit("expand_envelope: distance is negative"))
      .cast("struct<gtype:string,pts:array<struct<x:double,y:double>>>"))
      .otherwise(struct(lit("ST_Polygon").as("gtype"), ring.as("pts")))
  }

  /** geometry_union(array<geometry>) — scalar n-ary union
    * (GeoFunctions.java geometryUnion): the disjoint-decomposition
    * collection of all parts, single-level flatten. */
  def geometryUnionScalar(gs: Column): Column =
    struct(lit("ST_GeometryCollection").as("gtype"),
      transform(gs, g => struct(gType(g).as("gtype"), gPts(g).as("pts")))
        .as("geoms"))

  /** to_geometry(SphericalGeography) — re-tag back to the planar domain
    * (SphericalGeoFunctions.java toGeometry, inverse of
    * to_spherical_geography). */
  def toGeometry(g: Column): Column =
    struct(regexp_replace(gType(g), "^Spherical:", "").as("gtype"),
      gPts(g).as("pts"))

  /** flatten_geometry_collections(collection) → its leaf parts. The
    * tagged collection representation is single-level by construction
    * (geoms elements are leaf geometries), so the reference's recursive
    * case (GeoFunctions.java flattenGeometryCollections) cannot arise —
    * flattening is the component list. */
  def flattenGeometryCollections(g: Column): Column = g.getField("geoms")

  // ---- geometry_nearest_points (GeoFunctions.java geometryNearestPoints
  // via Esri proximity): the closest pair between two vertex paths is a
  // vertex of one projected onto a segment of the other (or a crossing,
  // which callers detect via ST_Intersects first). Two symmetric folds,
  // all codegen'd. ----

  /** Closest point to `p` over a segment list → struct<d2, pt>. */
  private def closestOnPath(p: Column, segs: Column): Column = {
    val init = struct(lit(Double.MaxValue).as("d2"),
      lit(null).cast("struct<x:double,y:double>").as("pt"))
    aggregate(segs, init, (best, s) => {
      val a = s.getField("p"); val b = s.getField("q")
      val len2 = pow(stX(b) - stX(a), 2) + pow(stY(b) - stY(a), 2)
      val t = when(len2 === 0.0, lit(0.0)).otherwise(
        least(lit(1.0), greatest(lit(0.0),
          ((stX(p) - stX(a)) * (stX(b) - stX(a)) +
            (stY(p) - stY(a)) * (stY(b) - stY(a))) / len2)))
      val proj = stPoint(stX(a) + t * (stX(b) - stX(a)),
        stY(a) + t * (stY(b) - stY(a)))
      val d2 = pow(stX(p) - stX(proj), 2) + pow(stY(p) - stY(proj), 2)
      when(d2 < best.getField("d2"),
        struct(d2.as("d2"), proj.as("pt"))).otherwise(best)
    })
  }

  /** geometry_nearest_points(a, b) over vertex paths (open path or ring —
    * rings pass their closed edge list) → array [point-on-a, point-on-b]
    * as tagged point geometries. */
  def geometryNearestPoints(ptsA: Column, ptsB: Column,
      closedA: Boolean = false, closedB: Boolean = false): Column = {
    val segsA = if (closedA) ringEdges(ptsA) else pathSegments(ptsA)
    val segsB = if (closedB) ringEdges(ptsB) else pathSegments(ptsB)
    val init = struct(lit(Double.MaxValue).as("d2"),
      lit(null).cast("struct<x:double,y:double>").as("pa"),
      lit(null).cast("struct<x:double,y:double>").as("pb"))
    // vertices of A against B's segments
    val bestA = aggregate(ptsA, init, (best, v) => {
      val c = closestOnPath(v, segsB)
      when(c.getField("d2") < best.getField("d2"),
        struct(c.getField("d2").as("d2"), v.as("pa"),
          c.getField("pt").as("pb"))).otherwise(best)
    })
    // vertices of B against A's segments
    val bestBoth = aggregate(ptsB, bestA, (best, v) => {
      val c = closestOnPath(v, segsA)
      when(c.getField("d2") < best.getField("d2"),
        struct(c.getField("d2").as("d2"), c.getField("pt").as("pa"),
          v.as("pb"))).otherwise(best)
    })
    array(
      struct(lit("ST_Point").as("gtype"),
        array(bestBoth.getField("pa")).as("pts")),
      struct(lit("ST_Point").as("gtype"),
        array(bestBoth.getField("pb")).as("pts")))
  }

  /** geometry_to_dissolved_bing_tiles(geometry, zoom)
    * (BingTileFunctions.java geometryToDissolvedBingTiles): the envelope
    * tile cover with every complete 4-tile sibling quad replaced by its
    * parent, applied bottom-up through all levels. One fold pass per
    * level; tile counts here are envelope covers, so each pass is a small
    * array scan. */
  def geometryToDissolvedBingTiles(g: Column, zoom: Column): Column = {
    val cover = geometryToBingTiles(g, zoom)
    def parentOf(t: Column): Column = struct(
      (t.getField("x").cast("int") / 2).cast("int").as("x"),
      (t.getField("y").cast("int") / 2).cast("int").as("y"),
      (t.getField("zoom") - 1).cast("int").as("zoom"))
    def childrenOf(t: Column): Column = {
      val x2 = t.getField("x") * 2; val y2 = t.getField("y") * 2
      transform(sequence(lit(0), lit(3)), i =>
        struct((x2 + i % 2).cast("int").as("x"),
          (y2 + (i / 2).cast("int")).cast("int").as("y"),
          (t.getField("zoom") + 1).cast("int").as("zoom")))
    }
    def pass(tiles: Column): Column = {
      val finest = array_max(transform(tiles, _.getField("zoom")))
      val atF = filter(tiles, t => t.getField("zoom") === finest)
      val rest = filter(tiles, t => t.getField("zoom") =!= finest)
      val fullParents = filter(array_distinct(transform(atF, parentOf(_))),
        p => forall(childrenOf(p), c => array_contains(atF, c)))
      val keep = filter(atF, t => !array_contains(fullParents, parentOf(t)))
      concat(rest, keep, fullParents)
    }
    aggregate(sequence(lit(1), greatest(zoom, lit(1))), cover,
      (acc, _) => pass(acc))
  }
}
