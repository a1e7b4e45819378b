package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** zorder(c1, c2, ...) / zorder(ROW(c1, c2, ...)) → VARBINARY — the
  * reference's Z-order curve key (presto-iceberg/.../function/
  * IcebergZOrderFunctions.java, itself the engine-side twin of Iceberg's
  * published SparkZOrderUDF): each column is encoded to 8
  * ORDER-PRESERVING bytes, then the per-column bit streams are
  * interleaved MSB-first round-robin, so lexicographic order of the
  * result walks a Z (Morton) space-filling curve over all columns at
  * once.
  *
  * Encodings (the reference's ZOrderByteUtils contract):
  *   - integral / date / timestamp: 64-bit value with the sign bit
  *     flipped (`v ^ Long.MinValue`), big-endian — unsigned byte order
  *     equals signed numeric order;
  *   - float / double: IEEE-754 bits, negative values bit-complemented,
  *     non-negative sign-flipped — total order including -0 < +0;
  *   - boolean: one 0/1 byte then zeros;
  *   - varchar: first 8 UTF-8 bytes, zero-padded (magnitude prefix);
  *   - NULL: all-zero bytes (the reference's PRIMITIVE_EMPTY — nulls
  *     sort first and never error inside a layout write).
  *
  * Why this exists at 100 TB: sorting a table by `zorder(a, b)` before
  * writing parquet gives every file a small bounding box in BOTH a and b,
  * so min/max stats prune selective predicates on either column — a
  * single-column sort prunes only its own column. The expression is a
  * pure per-row projection (no shuffle of its own); the layout operator
  * around it is ops/Layout.scala.
  */
case class ZOrderExpr(children: Seq[Expression])
  extends Expression with CodegenFallback {

  /** The encoded columns: a lone ROW argument contributes its fields. */
  private lazy val parts: Seq[DataType] = children match {
    case Seq(one) => one.dataType match {
      case StructType(fs) => fs.map(_.dataType).toSeq
      case dt => Seq(dt)
    }
    case many => many.map(_.dataType)
  }

  private def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType |
         BooleanType | StringType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    parts.find(!supported(_)) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"zorder does not support type ${bad.simpleString}")
      case None if parts.isEmpty =>
        TypeCheckResult.TypeCheckFailure("zorder needs at least one column")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "zorder"

  private def encode(dt: DataType, v: Any): Long = v match {
    case null => 0L // PRIMITIVE_EMPTY: nulls are all-zero bytes
    case _ => dt match {
      case ByteType => v.asInstanceOf[Byte].toLong ^ Long.MinValue
      case ShortType => v.asInstanceOf[Short].toLong ^ Long.MinValue
      case IntegerType | DateType => v.asInstanceOf[Int].toLong ^ Long.MinValue
      case LongType | TimestampType | TimestampNTZType =>
        v.asInstanceOf[Long] ^ Long.MinValue
      case FloatType =>
        orderedDoubleBits(v.asInstanceOf[Float].toDouble)
      case DoubleType =>
        orderedDoubleBits(v.asInstanceOf[Double])
      case BooleanType =>
        (if (v.asInstanceOf[Boolean]) 1L else 0L) << 56
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        var acc = 0L
        var i = 0
        while (i < 8) {
          acc = (acc << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
          i += 1
        }
        acc
      case other => throw new IllegalStateException(other.simpleString)
    }
  }

  private def orderedDoubleBits(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    if (bits < 0) ~bits else bits ^ Long.MinValue
  }

  override def eval(input: InternalRow): Any = {
    val values: Seq[Any] = children match {
      case Seq(one) if one.dataType.isInstanceOf[StructType] =>
        val r = one.eval(input)
        val n = parts.length
        if (r == null) Seq.fill[Any](n)(null)
        else {
          val row = r.asInstanceOf[InternalRow]
          (0 until n).map(i =>
            if (row.isNullAt(i)) null else row.get(i, parts(i)))
        }
      case cs => cs.map(_.eval(input))
    }
    val enc = new Array[Long](parts.length)
    var i = 0
    while (i < parts.length) { enc(i) = encode(parts(i), values(i)); i += 1 }
    val n = enc.length
    val out = new Array[Byte](8 * n)
    var j = 0 // output bit index, 0 = MSB of the whole key
    val total = 64 * n
    while (j < total) {
      val c = j % n // column supplying this bit
      val b = j / n // that column's bit, 0 = MSB
      val bit = (enc(c) >>> (63 - b)) & 1L
      if (bit != 0L) out(j >> 3) = (out(j >> 3) | (0x80 >> (j & 7))).toByte
      j += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}

object ZOrderExpr {
  def column(cols: Column*): Column =
    Bridge.column(ZOrderExpr(cols.map(Bridge.expression)))
}
