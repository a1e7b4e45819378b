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
