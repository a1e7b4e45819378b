package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native WKT parser for the SQL geometry surface (GeoSqlNames.scala).
  *
  * The combinator parser (`stMultiGeometryFromText` + `stPolygonWithHoles`)
  * is the executable spec, but as a Column tree it is re-inlined at EVERY
  * reference to its result — `ST_Contains(ST_GeometryFromText(w), p)`
  * copies the whole regex cascade once per field access, and a predicate
  * dispatch makes dozens of accesses, exploding analysis to minutes (the
  * same DAG blow-up the GeomKernels natives fixed for the clip towers).
  * This expression is ONE node; duplicating it costs one node per
  * reference.
  *
  * Parsing semantics match the combinator spelling (reference
  * GeoFunctions.java ST_GeometryFromText:252): numbers via
  * `Double.parseDouble` (identical to CAST(string AS DOUBLE)), polygon
  * rings drop an explicit closure vertex, WKT class names are
  * case-insensitive, `EMPTY` bodies parse to zero parts. One deliberate
  * upgrade over the combinator version: MULTIPOLYGON keeps per-part ring
  * grouping, so parts may carry interior rings.
  *
  * Output type: the GEO struct —
  * struct<gtype, geoms: array<struct<gtype, rings: array<array<pt>>>>>.
  */
object WktGeo {
  val pointType: StructType = GeomKernels.pointType
  val partType: StructType = StructType(Seq(
    StructField("gtype", StringType),
    StructField("rings", ArrayType(ArrayType(pointType)))))
  val geoType: StructType = StructType(Seq(
    StructField("gtype", StringType),
    StructField("geoms", ArrayType(partType))))

  def ringRow(pts: Seq[(Double, Double)]): GenericArrayData =
    new GenericArrayData(pts.map { case (x, y) => InternalRow(x, y) }.toArray[Any])

  def partRow(gtype: String, rings: Seq[Seq[(Double, Double)]]): InternalRow =
    InternalRow(UTF8String.fromString(gtype),
      new GenericArrayData(rings.map(ringRow).toArray[Any]))

  def geoRow(gtype: String, parts: Seq[InternalRow]): InternalRow =
    InternalRow(UTF8String.fromString(gtype),
      new GenericArrayData(parts.toArray[Any]))

  /** Split `s` at top-level commas (depth 0 w.r.t. parentheses). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1).trim
    else t
  }

  private def coords(s: String): Seq[(Double, Double)] =
    splitTop(stripParens(s)).map { pair =>
      val nums = pair.trim.split("\\s+")
      (java.lang.Double.parseDouble(nums(0)), java.lang.Double.parseDouble(nums(1)))
    }

  private def dropClosure(ring: Seq[(Double, Double)]): Seq[(Double, Double)] =
    if (ring.length > 1 && ring.head == ring.last) ring.dropRight(1) else ring

  /** body of POLYGON (...): top-level comma-separated rings. */
  private def polygonRings(body: String): Seq[Seq[(Double, Double)]] =
    splitTop(stripParens(body)).map(r => dropClosure(coords(r)))

  def parse(wkt: String): InternalRow = {
    val t = wkt.trim
    val m = java.util.regex.Pattern.compile("^([A-Za-z]+)\\s*(.*)$",
      java.util.regex.Pattern.DOTALL).matcher(t)
    if (!m.matches())
      throw new IllegalArgumentException(s"Invalid WKT: $wkt")
    val kind = m.group(1).toUpperCase
    val body = m.group(2).trim
    val empty = body.equalsIgnoreCase("EMPTY")
    def parts(f: => Seq[InternalRow]): Seq[InternalRow] =
      if (empty) Seq.empty else f
    kind match {
      case "POINT" =>
        geoRow("ST_Point", parts(Seq(partRow("ST_Point", Seq(coords(body))))))
      case "LINESTRING" =>
        geoRow("ST_LineString",
          parts(Seq(partRow("ST_LineString", Seq(coords(body))))))
      case "POLYGON" =>
        geoRow("ST_Polygon",
          parts(Seq(partRow("ST_Polygon", polygonRings(body)))))
      case "MULTIPOINT" =>
        geoRow("ST_MultiPoint", parts(
          splitTop(stripParens(body)).map(p =>
            partRow("ST_Point", Seq(coords(p))))))
      case "MULTILINESTRING" =>
        geoRow("ST_MultiLineString", parts(
          splitTop(stripParens(body)).map(l =>
            partRow("ST_LineString", Seq(coords(l))))))
      case "MULTIPOLYGON" =>
        geoRow("ST_MultiPolygon", parts(
          splitTop(stripParens(body)).map(p =>
            partRow("ST_Polygon", polygonRings(p)))))
      case "GEOMETRYCOLLECTION" =>
        geoRow("ST_GeometryCollection", parts(
          splitTop(stripParens(body)).map { comp =>
            val g = parse(comp)
            // leaf components only (single-level, like the Column API)
            val geoms = g.getArray(1)
            if (geoms.numElements() != 1)
              throw new IllegalArgumentException(
                "GEOMETRYCOLLECTION components must be simple geometries")
            geoms.getStruct(0, 2).copy()
          }))
      case other =>
        throw new IllegalArgumentException(s"Unknown WKT type: $other")
    }
  }
}

/** ST_GeometryFromText as one native node (see WktGeo scaladoc). */
case class WktToGeo(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = WktGeo.geoType
  override protected def nullSafeEval(input: Any): Any =
    WktGeo.parse(input.toString)
  override protected def withNewChildInternal(newChild: Expression): WktToGeo =
    copy(child = newChild)
  override def prettyName: String = "st_geometryfromtext"
}
