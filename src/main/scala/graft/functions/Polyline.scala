package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Google Encoded Polyline (the published Maps algorithm: 1e-5 degree
  * quantization, delta coding, zigzag, 5-bit groups + 63 offset).
  * Reference: GeoFunctions.java googlePolylineDecode/Encode. Decode
  * yields a LineString's vertex array in (lon, lat) = (x, y) order —
  * the wire format carries (lat, lng) pairs. */
object Polyline {
  def encode(points: Seq[(Double, Double)]): String = {
    val sb = new StringBuilder
    var prevLat = 0L
    var prevLng = 0L
    points.foreach { case (x, y) =>
      val lat = math.round(y * 1e5)
      val lng = math.round(x * 1e5)
      writeVarint(sb, lat - prevLat)
      writeVarint(sb, lng - prevLng)
      prevLat = lat; prevLng = lng
    }
    sb.toString
  }

  private def writeVarint(sb: StringBuilder, value: Long): Unit = {
    var v = (value << 1) ^ (value >> 63) // zigzag
    while (v >= 0x20) {
      sb.append(((0x20 | (v & 0x1f)) + 63).toChar)
      v >>= 5
    }
    sb.append((v + 63).toChar)
  }

  def decode(s: String): Seq[(Double, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    var lat = 0L
    var lng = 0L
    def readVarint(): Long = {
      var result = 0L
      var shift = 0
      var b = 0
      do {
        if (i >= s.length)
          throw new IllegalArgumentException("google_polyline_decode: truncated input")
        b = s.charAt(i) - 63
        i += 1
        result |= (b & 0x1fL) << shift
        shift += 5
      } while (b >= 0x20)
      (result >>> 1) ^ -(result & 1) // un-zigzag
    }
    while (i < s.length) {
      lat += readVarint()
      lng += readVarint()
      out += ((lng / 1e5, lat / 1e5))
    }
    out.toSeq
  }
}

/** google_polyline_encode(array<point>) → varchar. */
case class PolylineEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "google_polyline_encode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StructType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"google_polyline_encode expects array<point>, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val pts = (0 until arr.numElements()).map { i =>
      val p = arr.getStruct(i, 2); (p.getDouble(0), p.getDouble(1))
    }
    UTF8String.fromString(Polyline.encode(pts))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** google_polyline_decode(varchar) → array<point> (x = lng, y = lat). */
case class PolylineDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType))))
  override def prettyName: String = "google_polyline_decode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"google_polyline_decode expects varchar, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val pts = Polyline.decode(v.toString)
    new GenericArrayData(pts.map { case (x, y) => InternalRow(x, y) })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
