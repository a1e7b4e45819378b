package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Well-known-binary codec for the tagged geometry struct
  * (reference MAIN/geospatial/GeoFunctions.java ST_AsBinary / ST_GeomFromBinary,
  * which delegate to Esri's OGC WKB writer/reader). Emitted WKB is
  * big-endian (XDR, byte-order marker 0) — a valid encoding any OGC
  * reader accepts; the decoder accepts both endiannesses. Polygon rings
  * close explicitly on the wire (OGC requires it) and re-open on decode,
  * matching the internal unclosed-ring representation.
  *
  * CodegenFallback: byte-twiddling over a heap buffer; called once per
  * geometry, not in arithmetic-hot inner loops. */
object GeoWkb {
  val GeomType: StructType = StructType(Seq(
    StructField("gtype", StringType),
    StructField("pts", ArrayType(StructType(Seq(
      StructField("x", DoubleType), StructField("y", DoubleType)))))))

  val PointTag = 1
  val LineTag = 2
  val PolygonTag = 3

  def tagOf(gtype: String): Int = gtype match {
    case "ST_Point" => PointTag
    case "ST_LineString" => LineTag
    case "ST_Polygon" => PolygonTag
    case other =>
      throw new IllegalArgumentException(s"ST_AsBinary: unsupported geometry $other")
  }

  def nameOf(tag: Int): String = tag match {
    case PointTag => "ST_Point"
    case LineTag => "ST_LineString"
    case PolygonTag => "ST_Polygon"
    case other =>
      throw new IllegalArgumentException(s"ST_GeomFromBinary: unsupported WKB type $other")
  }
}

/** ST_AsBinary(geometry) → big-endian OGC WKB. */
case class WkbEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import GeoWkb._

  override def dataType: DataType = BinaryType
  override def prettyName: String = "st_asbinary"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 && s.head.name == "gtype" =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ST_AsBinary expects a tagged geometry struct, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val gtype = row.getUTF8String(0).toString
    val pts = row.getArray(1)
    val n = pts.numElements()
    val tag = tagOf(gtype)
    def pt(i: Int): (Double, Double) = {
      val p = pts.getStruct(i, 2); (p.getDouble(0), p.getDouble(1))
    }
    val buf = tag match {
      case PointTag =>
        val b = ByteBuffer.allocate(21).order(ByteOrder.BIG_ENDIAN)
        b.put(0.toByte).putInt(PointTag)
        val (x, y) = pt(0); b.putDouble(x).putDouble(y); b
      case LineTag =>
        val b = ByteBuffer.allocate(9 + 16 * n).order(ByteOrder.BIG_ENDIAN)
        b.put(0.toByte).putInt(LineTag).putInt(n)
        (0 until n).foreach { i => val (x, y) = pt(i); b.putDouble(x).putDouble(y) }
        b
      case PolygonTag => // one explicitly-closed exterior ring
        val b = ByteBuffer.allocate(13 + 16 * (n + 1)).order(ByteOrder.BIG_ENDIAN)
        b.put(0.toByte).putInt(PolygonTag).putInt(1).putInt(n + 1)
        (0 until n).foreach { i => val (x, y) = pt(i); b.putDouble(x).putDouble(y) }
        val (x0, y0) = pt(0); b.putDouble(x0).putDouble(y0)
        b
    }
    buf.array()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ST_GeomFromBinary(varbinary) → tagged geometry struct. Accepts both
  * byte orders; polygons must carry exactly one ring (holes live in the
  * dedicated rings representation — stPolygonWithHoles). */
case class WkbDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import GeoWkb._

  override def dataType: DataType = GeomType
  override def prettyName: String = "st_geomfrombinary"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ST_GeomFromBinary expects varbinary, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    if (bytes.length < 5)
      throw new IllegalArgumentException("ST_GeomFromBinary: truncated WKB")
    val order =
      if (bytes(0) == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val b = ByteBuffer.wrap(bytes, 1, bytes.length - 1).order(order)
    val tag = b.getInt
    def readPts(n: Int): Array[InternalRow] =
      Array.fill(n)(InternalRow(b.getDouble, b.getDouble))
    val (name, pts) = tag match {
      case PointTag => (nameOf(tag), readPts(1))
      case LineTag => (nameOf(tag), readPts(b.getInt))
      case PolygonTag =>
        val rings = b.getInt
        if (rings != 1) throw new IllegalArgumentException(
          s"ST_GeomFromBinary: polygons with $rings rings unsupported " +
            "(interior rings use the rings representation)")
        val closed = readPts(b.getInt)
        val open = // drop the OGC closure vertex (coordinate comparison —
          // InternalRow equality is not value-based)
          if (closed.length > 1 &&
              closed.head.getDouble(0) == closed.last.getDouble(0) &&
              closed.head.getDouble(1) == closed.last.getDouble(1))
            closed.dropRight(1)
          else closed
        (nameOf(tag), open)
      case other => (nameOf(other), Array.empty[InternalRow]) // throws
    }
    InternalRow(UTF8String.fromString(name), new GenericArrayData(pts))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simplify_geometry(pts, tolerance): Douglas–Peucker over a point path
  * (reference GeoFunctions.java simplifyGeometry via Esri). Endpoints are
  * always kept; a vertex survives iff its perpendicular distance to the
  * current anchor chord exceeds the tolerance. The distance test is the
  * division-free cross² > tol²·|chord|² form, exact on dyadic inputs.
  * Iterative explicit stack — no recursion depth limits. */
case class SimplifyPath(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = left.dataType
  override def prettyName: String = "simplify_geometry"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(_: StructType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"simplify_geometry expects (array<point>, double), got (${l.sql}, ${r.sql})")
  }

  override protected def nullSafeEval(ptsAny: Any, tolAny: Any): Any = {
    val arr = ptsAny.asInstanceOf[ArrayData]
    val tol = tolAny.asInstanceOf[Double]
    val n = arr.numElements()
    if (n <= 2 || tol <= 0) return arr.copy()
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    (0 until n).foreach { i =>
      val p = arr.getStruct(i, 2); xs(i) = p.getDouble(0); ys(i) = p.getDouble(1)
    }
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    val stack = scala.collection.mutable.Stack((0, n - 1))
    val tol2 = tol * tol
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      if (hi - lo >= 2) {
        val dx = xs(hi) - xs(lo); val dy = ys(hi) - ys(lo)
        val chord2 = dx * dx + dy * dy
        var best = -1.0; var bestI = -1
        var i = lo + 1
        while (i < hi) {
          val cross = dx * (ys(i) - ys(lo)) - dy * (xs(i) - xs(lo))
          // degenerate chord (closed ring seg): fall back to distance²
          val m =
            if (chord2 == 0) {
              val ex = xs(i) - xs(lo); val ey = ys(i) - ys(lo)
              (ex * ex + ey * ey) * 1.0 // compare against tol² directly
            } else cross * cross / chord2
          if (m > best) { best = m; bestI = i }
          i += 1
        }
        if (best > tol2) {
          keep(bestI) = true
          stack.push((lo, bestI)); stack.push((bestI, hi))
        }
      }
    }
    new GenericArrayData((0 until n).collect {
      case i if keep(i) => InternalRow(xs(i), ys(i))
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
