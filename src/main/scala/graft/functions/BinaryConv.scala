package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Binary conversion + non-cryptographic hash scalars from the reference's
  * VarbinaryFunctions (operator/scalar/VarbinaryFunctions.java:
  * to/from_big_endian_32/64, to/from_ieee754_32/64, fnv1_32/64,
  * fnv1a_32/64) and StringFunctions.longest_common_prefix. All codegen'd
  * per-row projections. */
object BinConv {
  def toBe64(x: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(x).array()
  def fromBe64(b: Array[Byte]): Long = {
    require(b.length == 8, s"expected 8-byte input, got ${b.length}")
    ByteBuffer.wrap(b).getLong
  }
  def toBe32(x: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(x).array()
  def fromBe32(b: Array[Byte]): Int = {
    require(b.length == 4, s"expected 4-byte input, got ${b.length}")
    ByteBuffer.wrap(b).getInt
  }
  def toIeee64(x: Double): Array[Byte] = toBe64(java.lang.Double.doubleToLongBits(x))
  def fromIeee64(b: Array[Byte]): Double = java.lang.Double.longBitsToDouble(fromBe64(b))
  def toIeee32(x: Float): Array[Byte] = toBe32(java.lang.Float.floatToIntBits(x))
  def fromIeee32(b: Array[Byte]): Float = java.lang.Float.intBitsToFloat(fromBe32(b))

  // FNV hashes per the published spec (http://www.isthe.com/chongo/tech/comp/fnv/)
  def fnv1_32(b: Array[Byte]): Long = {
    var h = 0x811c9dc5L
    var i = 0
    while (i < b.length) { h = (h * 0x01000193L) & 0xffffffffL; h ^= (b(i) & 0xffL); i += 1 }
    h
  }
  def fnv1a_32(b: Array[Byte]): Long = {
    var h = 0x811c9dc5L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h = (h * 0x01000193L) & 0xffffffffL; i += 1 }
    h
  }
  def fnv1_64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h *= 0x100000001b3L; h ^= (b(i) & 0xffL); i += 1 }
    h
  }
  def fnv1a_64(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  // RFC 4648 base32 (reference VarbinaryFunctions to/from_base32)
  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  def toBase32(b: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder((b.length + 4) / 5 * 8)
    var i = 0
    while (i < b.length) {
      val n = math.min(5, b.length - i)
      var buf = 0L
      var j = 0
      while (j < 5) { buf = (buf << 8) | (if (j < n) b(i + j) & 0xffL else 0L); j += 1 }
      val chars = n * 8 / 5 + (if (n * 8 % 5 == 0) 0 else 1)
      var k = 0
      while (k < 8) {
        if (k < chars) sb.append(B32.charAt(((buf >> (35 - 5 * k)) & 31).toInt))
        else sb.append('=')
        k += 1
      }
      i += 5
    }
    UTF8String.fromString(sb.toString)
  }

  def fromBase32(s: UTF8String): Array[Byte] = {
    val t = s.toString.stripSuffix("=").stripSuffix("=").stripSuffix("=")
      .stripSuffix("=").stripSuffix("=").stripSuffix("=")
    val out = new java.io.ByteArrayOutputStream
    var buf = 0L
    var bits = 0
    var i = 0
    while (i < t.length) {
      val v = B32.indexOf(t.charAt(i).toUpper)
      require(v >= 0, s"invalid base32 character: ${t.charAt(i)}")
      buf = (buf << 5) | v
      bits += 5
      if (bits >= 8) { out.write(((buf >> (bits - 8)) & 0xff).toInt); bits -= 8 }
      i += 1
    }
    out.toByteArray
  }

  def toBase64Url(b: Array[Byte]): UTF8String =
    UTF8String.fromString(java.util.Base64.getUrlEncoder.encodeToString(b))

  def fromBase64Url(s: UTF8String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s.toString)

  /** Longest common prefix by code point (StringFunctions.java
    * longestCommonPrefix). */
  def lcp(a: UTF8String, b: UTF8String): UTF8String = {
    val as = a.toString; val bs = b.toString
    val max = math.min(as.length, bs.length)
    var i = 0
    while (i < max && as.charAt(i) == bs.charAt(i)) i += 1
    // don't split a surrogate pair at the boundary
    if (i > 0 && i < as.length && Character.isHighSurrogate(as.charAt(i - 1)) &&
      Character.isLowSurrogate(as.charAt(i))) i -= 1
    UTF8String.fromString(as.substring(0, i))
  }
}

/** One thin codegen'd expression per conversion op (see BinConv). */
case class BinConvExpr(child: Expression, op: String) extends UnaryExpression {
  private val (inType: DataType, outType: DataType) = op match {
    case "to_base32" => (BinaryType, StringType)
    case "from_base32" => (StringType, BinaryType)
    case "to_base64url" => (BinaryType, StringType)
    case "from_base64url" => (StringType, BinaryType)
    case "to_big_endian_64" => (LongType, BinaryType)
    case "from_big_endian_64" => (BinaryType, LongType)
    case "to_big_endian_32" => (IntegerType, BinaryType)
    case "from_big_endian_32" => (BinaryType, IntegerType)
    case "to_ieee754_64" => (DoubleType, BinaryType)
    case "from_ieee754_64" => (BinaryType, DoubleType)
    case "to_ieee754_32" => (FloatType, BinaryType)
    case "from_ieee754_32" => (BinaryType, FloatType)
    case "fnv1_32" | "fnv1_64" | "fnv1a_32" | "fnv1a_64" => (BinaryType, LongType)
    case other => throw new IllegalArgumentException(s"unknown binary conv op: $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == inType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$op requires ${inType.simpleString}, got ${child.dataType.simpleString}")

  override def dataType: DataType = outType
  override def prettyName: String = op

  private def helper: String = op match {
    case "to_base32" => "toBase32"
    case "from_base32" => "fromBase32"
    case "to_base64url" => "toBase64Url"
    case "from_base64url" => "fromBase64Url"
    case "to_big_endian_64" => "toBe64"
    case "from_big_endian_64" => "fromBe64"
    case "to_big_endian_32" => "toBe32"
    case "from_big_endian_32" => "fromBe32"
    case "to_ieee754_64" => "toIeee64"
    case "from_ieee754_64" => "fromIeee64"
    case "to_ieee754_32" => "toIeee32"
    case "from_ieee754_32" => "fromIeee32"
    case h => h
  }

  override protected def nullSafeEval(v: Any): Any = op match {
    case "to_base32" => BinConv.toBase32(v.asInstanceOf[Array[Byte]])
    case "from_base32" => BinConv.fromBase32(v.asInstanceOf[UTF8String])
    case "to_base64url" => BinConv.toBase64Url(v.asInstanceOf[Array[Byte]])
    case "from_base64url" => BinConv.fromBase64Url(v.asInstanceOf[UTF8String])
    case "to_big_endian_64" => BinConv.toBe64(v.asInstanceOf[Long])
    case "from_big_endian_64" => BinConv.fromBe64(v.asInstanceOf[Array[Byte]])
    case "to_big_endian_32" => BinConv.toBe32(v.asInstanceOf[Int])
    case "from_big_endian_32" => BinConv.fromBe32(v.asInstanceOf[Array[Byte]])
    case "to_ieee754_64" => BinConv.toIeee64(v.asInstanceOf[Double])
    case "from_ieee754_64" => BinConv.fromIeee64(v.asInstanceOf[Array[Byte]])
    case "to_ieee754_32" => BinConv.toIeee32(v.asInstanceOf[Float])
    case "from_ieee754_32" => BinConv.fromIeee32(v.asInstanceOf[Array[Byte]])
    case "fnv1_32" => BinConv.fnv1_32(v.asInstanceOf[Array[Byte]])
    case "fnv1_64" => BinConv.fnv1_64(v.asInstanceOf[Array[Byte]])
    case "fnv1a_32" => BinConv.fnv1a_32(v.asInstanceOf[Array[Byte]])
    case "fnv1a_64" => BinConv.fnv1a_64(v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.BinConv.$helper($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** longest_common_prefix(a, b) → varchar (StringFunctions). */
case class LongestCommonPrefix(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "longest_common_prefix requires two strings, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "longest_common_prefix"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    BinConv.lcp(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BinConv.lcp($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** combine_hash(h1, h2) → 31*h1 + h2 with Java wrapping semantics
  * (CombineHashFunction.java) — NOT Catalyst Add/Multiply, which under
  * Spark 4's default ANSI mode throw ARITHMETIC_OVERFLOW for typical
  * 64-bit hash inputs (e.g. xxhash64 outputs). */
case class CombineHash(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "combine_hash requires two bigints, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "combine_hash"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    31L * l.asInstanceOf[Long] + r.asInstanceOf[Long]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"(31L * $a + $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** scale_qdigest(sketch, factor) → sketch with all weights scaled
  * (QuantileDigestFunctions.scaleQuantileDigest — quantiles unchanged,
  * counts multiplied). */
case class ScaleQDigest(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "scale_qdigest requires (varbinary, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "scale_qdigest"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    BinConvSketch.scaleQdigest(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BinConvSketch.scaleQdigest($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** scale_tdigest(sketch, factor) (TDigestFunctions.scaleTDigest). */
case class ScaleTDigest(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "scale_tdigest requires (varbinary, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "scale_tdigest"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    BinConvSketch.scaleTdigest(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BinConvSketch.scaleTdigest($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** parse_presto_data_size('123.5MB') → decimal(38,0) bytes (reference
  * operator/scalar/DataSizeFunctions.java:40 — binary multipliers, case
  * sensitive unit suffixes, truncating toBigInteger). */
case class ParsePrestoDataSize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_presto_data_size requires varchar, got ${child.dataType.simpleString}")
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "parse_presto_data_size"
  override protected def nullSafeEval(v: Any): Any = {
    val d = BinConvSketch.parseDataSize(v.toString)
    org.apache.spark.sql.types.Decimal(d, 38, 0)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.types.Decimal.apply(" +
        s"graft.functions.BinConvSketch.parseDataSize($a.toString()), 38, 0)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** destructure_tdigest(sketch) → row of internal state (reference
  * TDigestFunctions.java:112 — centroid means/weights, compression,
  * min, max, sum, count; weights are double here, matching our centroid
  * model, where the reference narrows to integer). */
case class DestructureTDigest(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"destructure_tdigest requires varbinary, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_means", ArrayType(DoubleType, containsNull = false)),
    StructField("centroid_weights", ArrayType(DoubleType, containsNull = false)),
    StructField("compression", DoubleType),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("sum", DoubleType),
    StructField("count", DoubleType)))
  override def prettyName: String = "destructure_tdigest"
  override protected def nullSafeEval(v: Any): Any =
    BinConvSketch.destructureTdigest(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.BinConvSketch.destructureTdigest($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** construct_tdigest(means, weights, compression, min, max) → sketch
  * (TDigestFunctions.java:155). Inverse of DestructureTDigest. */
case class ConstructTDigest(
  means: Expression, weights: Expression,
  compression: Expression, min: Expression, max: Expression)
  extends Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def children: Seq[Expression] = Seq(means, weights, compression, min, max)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "construct_tdigest"

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = Seq(means, weights).forall(e => e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (arrOk && Seq(compression, min, max).forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "construct_tdigest requires (array<double>, array<double>, double, double, double), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.contains(null)) return null
    BinConvSketch.constructTdigest(
      vals(0).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vals(1).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      vals(2).asInstanceOf[Double], vals(3).asInstanceOf[Double],
      vals(4).asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(means = newChildren(0), weights = newChildren(1),
      compression = newChildren(2), min = newChildren(3), max = newChildren(4))
}

object BinConvSketch {
  def destructureTdigest(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val d = TDigest.deserialize(bytes)
    var sum = 0.0
    var i = 0
    while (i < d.n) { sum += d.means(i) * d.weights(i); i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(d.means),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(d.weights),
      d.compression, d.min, d.max, sum, d.totalWeight)
  }

  def constructTdigest(
    means: org.apache.spark.sql.catalyst.util.ArrayData,
    weights: org.apache.spark.sql.catalyst.util.ArrayData,
    compression: Double, min: Double, max: Double): Array[Byte] = {
    val ms = means.toDoubleArray()
    val ws = weights.toDoubleArray()
    require(ms.length == ws.length,
      s"construct_tdigest: ${ms.length} means vs ${ws.length} weights")
    TDigest.serialize(TDigest.Digest(compression, ms, ws, min, max))
  }

  private val dataSizeFactors: Map[String, java.math.BigDecimal] = {
    def p(shift: Int) = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(shift))
    Map("B" -> p(0), "kB" -> p(10), "MB" -> p(20), "GB" -> p(30),
      "TB" -> p(40), "PB" -> p(50), "EB" -> p(60), "ZB" -> p(70), "YB" -> p(80))
  }

  def parseDataSize(s: String): java.math.BigDecimal = {
    var i = 0
    while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
    require(i > 0, s"Invalid data size: '$s'")
    val value = try new java.math.BigDecimal(s.substring(0, i)) catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(s"Invalid data size: '$s'")
    }
    val factor = dataSizeFactors.getOrElse(s.substring(i),
      throw new IllegalArgumentException(s"Invalid data size: '$s'"))
    new java.math.BigDecimal(value.multiply(factor).toBigInteger)
  }

  def scaleQdigest(bytes: Array[Byte], factor: Double): Array[Byte] = {
    require(factor > 0, s"scale factor must be positive, got $factor")
    val d = QDigest.deserialize(bytes)
    QDigest.serialize(QDigest.Digest(d.k, d.means, d.weights.map(_ * factor)))
  }
  def scaleTdigest(bytes: Array[Byte], factor: Double): Array[Byte] = {
    require(factor > 0, s"scale factor must be positive, got $factor")
    val d = TDigest.deserialize(bytes)
    TDigest.serialize(TDigest.Digest(
      d.compression, d.means, d.weights.map(_ * factor), d.min, d.max))
  }
}
