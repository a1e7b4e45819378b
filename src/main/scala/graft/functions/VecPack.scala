package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Packed vector format — the fixed-size-list float32 surface the
  * reference keeps in its lance connector (presto-lance): a BINARY
  * column of little-endian float32 at stride 4, interoperable with how
  * embeddings arrive from feature stores and vector files. The distance
  * kernels read the raw bytes with no per-row array allocation and
  * reproduce `VectorUtils`' sequential double-accumulation bit-for-bit,
  * so packed and array paths return IDENTICAL doubles (gate-asserted) —
  * pre-packed blobs are queryable WITHOUT an unpack pass.
  *
  * Measured honestly (BENCH_vecpack_r13.json, 200k×64f): parquet already
  * stores `array<float>` compactly (RLE'd levels), so packing is at-rest
  * PARITY (ratio 1.015) and probe parity (1.04×) — the value of this
  * module is the interchange surface, not a compression win.
  */
object VecKernels {

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  def getF(b: Array[Byte], i: Int): Float =
    java.lang.Float.intBitsToFloat(le32(b, i << 2))

  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n << 2)
    var i = 0
    while (i < n) {
      val bits = java.lang.Float.floatToRawIntBits(a.getFloat(i))
      val off = i << 2
      out(off) = bits.toByte
      out(off + 1) = (bits >>> 8).toByte
      out(off + 2) = (bits >>> 16).toByte
      out(off + 3) = (bits >>> 24).toByte
      i += 1
    }
    out
  }

  def unpack(b: Array[Byte]): GenericArrayData = {
    require(b.length % 4 == 0,
      s"packed vector length ${b.length} is not a multiple of 4")
    val n = b.length >> 2
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = getF(b, i); i += 1 }
    new GenericArrayData(out)
  }

  private def dims(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length,
      s"packed vector dims differ: ${a.length >> 2} vs ${b.length >> 2}")
    require(a.length % 4 == 0,
      s"packed vector length ${a.length} is not a multiple of 4")
    a.length >> 2
  }

  /** Same sequential fold as VectorUtils.dotF — bit-compatible. */
  def dotPacked(a: Array[Byte], b: Array[Byte]): Double = {
    val n = dims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += getF(a, i).toDouble * getF(b, i).toDouble
      i += 1
    }
    acc
  }

  def cosinePacked(a: Array[Byte], b: Array[Byte]): Double = {
    dims(a, b)
    dotPacked(a, b) / (math.sqrt(dotPacked(a, a)) * math.sqrt(dotPacked(b, b)))
  }

  def l2SquaredPacked(a: Array[Byte], b: Array[Byte]): Double = {
    val n = dims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = getF(a, i).toDouble - getF(b, i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

/** vec_pack(array<float>) → varbinary (little-endian float32, stride 4). */
case class VecPack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_pack requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vec_pack"
  override protected def nullSafeEval(v: Any): Any =
    VecKernels.pack(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.pack($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** vec_unpack(varbinary) → array<float>. */
case class VecUnpack(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_unpack requires varbinary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "vec_unpack"
  override protected def nullSafeEval(v: Any): Any =
    VecKernels.unpack(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.unpack($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

sealed trait PackedVectorBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires varbinary packed vectors, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
}

/** cosine_packed(varbinary, varbinary) → double. */
case class CosinePacked(left: Expression, right: Expression)
  extends PackedVectorBinary {
  override def prettyName: String = "cosine_packed"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.cosinePacked(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.cosinePacked($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_packed(varbinary, varbinary) → double. */
case class DotPacked(left: Expression, right: Expression)
  extends PackedVectorBinary {
  override def prettyName: String = "dot_packed"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.dotPacked(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.dotPacked($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_squared_packed(varbinary, varbinary) → double. */
case class L2SquaredPacked(left: Expression, right: Expression)
  extends PackedVectorBinary {
  override def prettyName: String = "l2_squared_packed"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.l2SquaredPacked(
      l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.l2SquaredPacked($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecPack {
  def pack(v: Column): Column = Bridge.column(VecPack(Bridge.expression(v)))
  def unpack(v: Column): Column = Bridge.column(VecUnpack(Bridge.expression(v)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosinePacked(Bridge.expression(a), Bridge.expression(b)))
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotPacked(Bridge.expression(a), Bridge.expression(b)))
  def l2Squared(a: Column, b: Column): Column =
    Bridge.column(L2SquaredPacked(Bridge.expression(a), Bridge.expression(b)))
}
