package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the computational-geometry hot spots (reference
  * geospatial/GeoFunctions.java ST_Intersection / ST_Union /
  * ST_Difference / ST_SymDifference / ST_ConvexHull, Esri-backed there).
  *
  * The same algorithms exist in GeoFunctions.scala as Catalyst
  * higher-order-function combinators — that spelling is the executable
  * spec, but a clip tower expands to tens of thousands of expression
  * nodes, which makes Catalyst analysis/optimization of a query using
  * them take seconds and forces interpreted evaluation. Each kernel here
  * is ONE expression node evaluating the identical arithmetic (same
  * operations in the same order, so IEEE-754 results are bit-equal with
  * the combinator spelling) over the geometry structs directly.
  *
  * Semantics (unchanged from the combinator versions):
  *  - intersection: Sutherland–Hodgman fold of half-plane clips of A over
  *    B's edges; degenerate result (<3 verts or area ≤ 1e-12) → ST_Empty.
  *  - difference: wedge decomposition A\B = ⋃_i (A ∩ outside(e_i) ∩
  *    inside(e_0..i−1)) over B's edges — convex, disjoint, exact.
  *  - union: A ⊎ (B\A) region-correct disjoint decomposition.
  *  - symdifference: (A\B) ⊎ (B\A).
  *  - convex hull: Andrew's monotone chain over the distinct sorted
  *    vertex set; <3 hull points → the distinct vertex set.
  */
object GeomKernels {
  val pointType: StructType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType)))
  val geomType: StructType = StructType(Seq(
    StructField("gtype", StringType),
    StructField("pts", ArrayType(pointType))))
  val collectionType: StructType = StructType(Seq(
    StructField("gtype", StringType),
    StructField("geoms", ArrayType(geomType))))

  final case class Pt(x: Double, y: Double)

  def readRing(a: ArrayData): Array[Pt] = {
    val n = a.numElements()
    val out = new Array[Pt](n)
    var i = 0
    while (i < n) {
      val r = a.getStruct(i, 2)
      out(i) = Pt(r.getDouble(0), r.getDouble(1))
      i += 1
    }
    out
  }

  def writeRing(ps: Seq[Pt]): ArrayData =
    new GenericArrayData(ps.map(p => InternalRow(p.x, p.y)).toArray[Any])

  def taggedGeom(gtype: String, ps: Seq[Pt]): InternalRow =
    InternalRow(UTF8String.fromString(gtype), writeRing(ps))

  def collection(parts: Seq[Seq[Pt]]): InternalRow =
    InternalRow(UTF8String.fromString("ST_GeometryCollection"),
      new GenericArrayData(parts.map(taggedGeom("ST_Polygon", _)).toArray[Any]))

  /** Shoelace area, same accumulation order as the combinator stArea. */
  def ringArea(ring: Array[Pt]): Double = {
    val n = ring.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      acc += a.x * b.y - b.x * a.y
      i += 1
    }
    math.abs(acc) / 2
  }

  /** Half-plane clip of a convex CCW ring against left-of (p→q) —
    * the combinator halfPlaneClip, including the consecutive-duplicate
    * drop. */
  def halfPlaneClip(ring: Array[Pt], p: Pt, q: Pt, keepLeft: Boolean): Array[Pt] = {
    val n = ring.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Pt]
    var i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      def side(v: Pt): Double = {
        val s = (q.x - p.x) * (v.y - p.y) - (q.y - p.y) * (v.x - p.x)
        if (keepLeft) s else -s
      }
      val sa = side(a); val sb = side(b)
      if (sa >= 0) out += a
      if ((sa >= 0) != (sb >= 0)) {
        val t = sa / (sa - sb)
        out += Pt(a.x + t * (b.x - a.x), a.y + t * (b.y - a.y))
      }
      i += 1
    }
    // drop consecutive duplicates (vertices that landed on the clip line)
    val dedup = scala.collection.mutable.ArrayBuffer.empty[Pt]
    var j = 0
    while (j < out.length) {
      if (j == 0 || out(j) != out(j - 1)) dedup += out(j)
      j += 1
    }
    dedup.toArray
  }

  def intersection(a: Array[Pt], b: Array[Pt]): Array[Pt] = {
    var acc = a
    val n = b.length
    var i = 0
    while (i < n) {
      acc = halfPlaneClip(acc, b(i), b((i + 1) % n), keepLeft = true)
      i += 1
    }
    acc
  }

  /** Wedge pieces of A\B that survive the degeneracy filter. */
  def difference(a: Array[Pt], b: Array[Pt]): Seq[Array[Pt]] = {
    val n = b.length
    (0 until n).flatMap { i =>
      var piece = halfPlaneClip(a, b(i), b((i + 1) % n), keepLeft = false)
      var j = 0
      while (j < i) {
        piece = halfPlaneClip(piece, b(j), b((j + 1) % n), keepLeft = true)
        j += 1
      }
      if (piece.length >= 3 && ringArea(piece) > 1e-12) Some(piece) else None
    }
  }

  /** Monotone-chain half hull (combinator halfHull). */
  private def halfHull(sorted: Array[Pt]): Array[Pt] = {
    val h = scala.collection.mutable.ArrayBuffer.empty[Pt]
    sorted.foreach { p =>
      while (h.length >= 2 && {
        val o = h(h.length - 2); val a = h(h.length - 1)
        (a.x - o.x) * (p.y - o.y) - (a.y - o.y) * (p.x - o.x) <= 0.0
      }) h.remove(h.length - 1)
      h += p
    }
    h.toArray
  }

  /** Monotone-chain convex hull ring (combinator stConvexHullRing):
    * distinct (x, y)-sorted vertices; <3 hull points → that vertex set. */
  def convexHull(pts: Array[Pt]): Array[Pt] = {
    val sorted = pts.distinct.sortBy(p => (p.x, p.y))
    if (sorted.length <= 2) sorted
    else {
      val lower = halfHull(sorted)
      val upper = halfHull(sorted.reverse)
      lower.dropRight(1) ++ upper.dropRight(1)
    }
  }

  // ---- general (concave / holed) overlay: decompose-to-convex --------
  // The reference's ST_Intersection/ST_Union/ST_Difference delegate to
  // the Esri geometry library's general overlay (reference
  // geospatial/GeoFunctions.java OperatorIntersection/OperatorUnion).
  // Here: ear-clip each simple ring into triangles (convex), subtract
  // hole pieces, and run every pairwise overlay through the exact convex
  // kernels above. Results are region-correct DISJOINT convex
  // decompositions (the same representation difference/union already
  // use); self-intersecting rings raise a TRY-recoverable error instead
  // of returning silently wrong geometry.

  /** Signed shoelace area: CCW positive. */
  def signedArea(ring: Array[Pt]): Double = {
    val n = ring.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val a = ring(i); val b = ring((i + 1) % n)
      acc += a.x * b.y - b.x * a.y
      i += 1
    }
    acc / 2
  }

  /** Drop the closing duplicate vertex and consecutive duplicates. */
  def dedupRing(ring: Array[Pt]): Array[Pt] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Pt]
    var i = 0
    while (i < ring.length) {
      if (out.isEmpty || ring(i) != out.last) out += ring(i)
      i += 1
    }
    while (out.length > 1 && out.head == out.last) out.remove(out.length - 1)
    out.toArray
  }

  def ensureCCW(ring: Array[Pt]): Array[Pt] =
    if (signedArea(ring) < 0) ring.reverse else ring

  /** Convex AND counter-clockwise: no right turn at any corner, at least
    * one strict left turn (collinear runs allowed). Evaluated on the
    * ring AS GIVEN (a CW-oriented convex ring is NOT ConvexCCW — it goes
    * through the general path, which normalizes orientation). */
  def isConvexCCW(ringIn: Array[Pt]): Boolean = {
    val ring = dedupRing(ringIn)
    val n = ring.length
    if (n < 3) return false
    var anyLeft = false
    var i = 0
    while (i < n) {
      val o = ring(i); val a = ring((i + 1) % n); val b = ring((i + 2) % n)
      val c = (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
      if (c < 0) return false
      if (c > 0) anyLeft = true
      i += 1
    }
    anyLeft
  }

  /** Any two NON-ADJACENT edges of the closed ring intersect — the same
    * orientation-test arithmetic as PathSelfIntersects below. Ear
    * clipping does NOT reliably fail on self-intersecting rings (a
    * bowtie clips into overlapping triangles with the wrong total area),
    * so the general overlay checks this explicitly first. */
  def ringSelfIntersects(ring: Array[Pt]): Boolean = {
    def cross3(o: Pt, a: Pt, b: Pt): Double =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def onSeg(p: Pt, q: Pt, r: Pt): Boolean =
      r.x >= math.min(p.x, q.x) && r.x <= math.max(p.x, q.x) &&
        r.y >= math.min(p.y, q.y) && r.y <= math.max(p.y, q.y)
    def segSeg(p1: Pt, q1: Pt, p2: Pt, q2: Pt): Boolean = {
      val d1 = cross3(p2, q2, p1); val d2 = cross3(p2, q2, q1)
      val d3 = cross3(p1, q1, p2); val d4 = cross3(p1, q1, q2)
      ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0)) ||
        (d1 == 0 && onSeg(p2, q2, p1)) ||
        (d2 == 0 && onSeg(p2, q2, q1)) ||
        (d3 == 0 && onSeg(p1, q1, p2)) ||
        (d4 == 0 && onSeg(p1, q1, q2))
    }
    val n = ring.length
    if (n < 4) return false
    var i = 0
    var found = false
    while (i < n && !found) {
      var j = i + 2
      while (j < n && !found) {
        val adjacent = (i == 0 && j == n - 1)
        if (!adjacent &&
            segSeg(ring(i), ring((i + 1) % n), ring(j), ring((j + 1) % n)))
          found = true
        j += 1
      }
      i += 1
    }
    found
  }

  /** Ear-clipping triangulation of a simple ring (any orientation).
    * Self-intersecting rings raise (TRY-recoverable) — checked up front,
    * since ear clipping can "succeed" on them with the wrong region.
    * Collinear corners are dropped; zero-area degenerate rings → empty. */
  def triangulate(ringIn: Array[Pt]): Seq[Array[Pt]] = {
    val ring = ensureCCW(dedupRing(ringIn))
    if (ringSelfIntersects(ring)) throw new IllegalArgumentException(
      "geometry set operation: polygon ring is self-intersecting")
    val n = ring.length
    if (n < 3) return Seq.empty
    def cross(o: Pt, a: Pt, b: Pt): Double =
      (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)
    def inTri(p: Pt, a: Pt, b: Pt, c: Pt): Boolean =
      cross(a, b, p) >= 0 && cross(b, c, p) >= 0 && cross(c, a, p) >= 0
    val idx = scala.collection.mutable.ArrayBuffer.range(0, n)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Pt]]
    while (idx.length > 3) {
      val m = idx.length
      var ear = -1
      var collinear = -1
      var i = 0
      while (i < m && ear < 0) {
        val a = ring(idx((i + m - 1) % m))
        val b = ring(idx(i))
        val c = ring(idx((i + 1) % m))
        val cr = cross(a, b, c)
        if (cr == 0) { if (collinear < 0) collinear = i }
        else if (cr > 0) {
          var blocked = false
          var j = 0
          while (j < m && !blocked) {
            if (j != (i + m - 1) % m && j != i && j != (i + 1) % m) {
              val p = ring(idx(j))
              if (p != a && p != b && p != c && inTri(p, a, b, c))
                blocked = true
            }
            j += 1
          }
          if (!blocked) ear = i
        }
        i += 1
      }
      if (ear >= 0) {
        val m2 = idx.length
        out += Array(ring(idx((ear + m2 - 1) % m2)), ring(idx(ear)),
          ring(idx((ear + 1) % m2)))
        idx.remove(ear)
      } else if (collinear >= 0) idx.remove(collinear)
      else throw new IllegalArgumentException(
        "geometry set operation: polygon ring is self-intersecting")
    }
    if (idx.length == 3) {
      val t = Array(ring(idx(0)), ring(idx(1)), ring(idx(2)))
      if (math.abs(signedArea(t)) > 1e-12) out += t
    }
    out.toSeq
  }

  /** Disjoint convex decomposition of a polygon given as rings (exterior
    * first, holes after, any orientation): ear-clip the exterior, then
    * subtract each hole's convex pieces through the exact convex-kernel
    * difference. */
  def polygonPieces(rings: Seq[Array[Pt]]): Seq[Array[Pt]] = {
    val outer = ensureCCW(dedupRing(rings.head))
    var pieces: Seq[Array[Pt]] =
      if (isConvexCCW(outer)) Seq(outer) else triangulate(outer)
    rings.drop(1).foreach { h0 =>
      val h = ensureCCW(dedupRing(h0))
      val hps = if (isConvexCCW(h)) Seq(h) else triangulate(h)
      hps.foreach { c => pieces = pieces.flatMap(p => difference(p, c)) }
    }
    pieces
  }

  /** A ∩ B over disjoint convex piece sets: pairwise convex clips.
    * Pieces of the result are disjoint because the inputs' are. */
  def interPieces(a: Seq[Array[Pt]], b: Seq[Array[Pt]]): Seq[Array[Pt]] =
    for { pa <- a; pb <- b
          c = intersection(pa, pb)
          if c.length >= 3 && ringArea(c) > 1e-12 } yield c

  /** A \ B over disjoint convex piece sets: iterated convex subtraction. */
  def diffPieces(a: Seq[Array[Pt]], b: Seq[Array[Pt]]): Seq[Array[Pt]] =
    b.foldLeft(a)((acc, pb) => acc.flatMap(p => difference(p, pb)))
}

/** Self-intersection core of ST_IsSimple / ST_IsRing / ST_IsValid as one
  * native node: any two NON-ADJACENT segments of the path intersect
  * (adjacency wraps when `closed`). Same orientation-test arithmetic as
  * the combinator segSeg (GeoFunctions.scala) — cross products plus
  * inclusive bounding checks for the collinear cases, no division. */
case class PathSelfIntersects(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import GeomKernels._

  override def dataType: DataType = BooleanType
  override def prettyName: String = "path_self_intersects"

  private def cross3(o: Pt, a: Pt, b: Pt): Double =
    (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)

  private def onSeg(p: Pt, q: Pt, r: Pt): Boolean =
    r.x >= math.min(p.x, q.x) && r.x <= math.max(p.x, q.x) &&
      r.y >= math.min(p.y, q.y) && r.y <= math.max(p.y, q.y)

  private def segSeg(p1: Pt, q1: Pt, p2: Pt, q2: Pt): Boolean = {
    val d1 = cross3(p2, q2, p1)
    val d2 = cross3(p2, q2, q1)
    val d3 = cross3(p1, q1, p2)
    val d4 = cross3(p1, q1, q2)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0)) ||
      (d1 == 0 && onSeg(p2, q2, p1)) ||
      (d2 == 0 && onSeg(p2, q2, q1)) ||
      (d3 == 0 && onSeg(p1, q1, p2)) ||
      (d4 == 0 && onSeg(p1, q1, q2))
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val pts = readRing(l.asInstanceOf[ArrayData])
    val closed = r.asInstanceOf[Boolean]
    val nSegs = pts.length - 1
    if (nSegs < 3) false
    else {
      var found = false
      var i = 1
      while (i <= nSegs && !found) {
        var j = i + 1
        while (j <= nSegs && !found) {
          val adjacent = (j - i == 1) || (closed && i == 1 && j == nSegs)
          if (!adjacent && segSeg(pts(i - 1), pts(i), pts(j - 1), pts(j)))
            found = true
          j += 1
        }
        i += 1
      }
      found
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PathSelfIntersects =
    copy(left = newLeft, right = newRight)
}

/** ST_Intersection / ST_Union / ST_Difference / ST_SymDifference for
  * convex CCW rings as one native expression node (see GeomKernels). */
case class ConvexGeomOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  import GeomKernels._

  override def dataType: DataType =
    if (op == "intersection") geomType else collectionType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = s"st_${op}_convex"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = readRing(l.asInstanceOf[ArrayData])
    val b = readRing(r.asInstanceOf[ArrayData])
    op match {
      case "intersection" =>
        val clipped = intersection(a, b)
        if (clipped.length >= 3 && ringArea(clipped) > 1e-12)
          taggedGeom("ST_Polygon", clipped)
        else taggedGeom("ST_Empty", Nil)
      case "difference" => collection(difference(a, b).map(_.toSeq))
      case "union" => collection(a.toSeq +: difference(b, a).map(_.toSeq))
      case "symdifference" =>
        collection((difference(a, b) ++ difference(b, a)).map(_.toSeq))
      case other => throw new IllegalArgumentException(s"unknown geom op: $other")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ConvexGeomOp =
    copy(left = newLeft, right = newRight)
}

/** ST_Intersection / ST_Union / ST_Difference / ST_SymDifference for
  * GENERAL simple polygons — concave and holed inputs allowed — as one
  * native expression node (reference geospatial/GeoFunctions.java
  * delegates these to the Esri library's general overlay). Inputs: the
  * two polygons' ring lists (exterior first, holes after). Output: a
  * tagged collection of DISJOINT convex polygon pieces whose union is
  * exactly the result region (the representation ConvexGeomOp's
  * difference/union already use). Single-ring convex-CCW inputs take
  * the exact ConvexGeomOp arithmetic, so results on convex fixtures are
  * bit-identical to the convex kernels. Self-intersecting rings raise a
  * TRY-recoverable error — never a silently wrong region. */
case class GeneralGeomOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  import GeomKernels._

  override def dataType: DataType = collectionType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = s"st_${op}_general"

  private def readRings(a: ArrayData): Seq[Array[Pt]] =
    (0 until a.numElements()).map(i => readRing(a.getArray(i)))

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val ringsA = readRings(l.asInstanceOf[ArrayData])
    val ringsB = readRings(r.asInstanceOf[ArrayData])
    val fast = ringsA.length == 1 && ringsB.length == 1 &&
      isConvexCCW(ringsA.head) && isConvexCCW(ringsB.head)
    val (pa, pb) =
      if (fast) (Seq(ringsA.head), Seq(ringsB.head))
      else (polygonPieces(ringsA), polygonPieces(ringsB))
    val pieces = op match {
      case "intersection" => interPieces(pa, pb)
      case "difference" => diffPieces(pa, pb)
      case "union" => pa ++ diffPieces(pb, pa)
      case "symdifference" => diffPieces(pa, pb) ++ diffPieces(pb, pa)
      case other => throw new IllegalArgumentException(s"unknown geom op: $other")
    }
    collection(pieces.map(_.toSeq))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeneralGeomOp =
    copy(left = newLeft, right = newRight)
}

/** ST_ConvexHull ring (monotone chain) as one native expression node. */
case class ConvexHullRing(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import GeomKernels._

  override def dataType: DataType = ArrayType(pointType)
  override def prettyName: String = "st_convex_hull_ring"

  override protected def nullSafeEval(input: Any): Any =
    writeRing(convexHull(readRing(input.asInstanceOf[ArrayData])).toSeq)

  override protected def withNewChildInternal(newChild: Expression): ConvexHullRing =
    copy(child = newChild)
}
