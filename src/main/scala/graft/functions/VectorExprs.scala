package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector kernels over float arrays (reference: cosine_similarity
  * MAIN/operator/scalar/MathFunctions.java:1710, l2_squared :1756, float dot
  * products :1853). Primitive loops over ArrayData — no per-element boxing,
  * no lambda dispatch — so the ANN inner loop stays at array-scan speed;
  * whole-stage codegen emits one static call per row. */
object VectorUtils {

  /** Mismatched dimensions are an error (the reference's vector functions
    * reject unequal lengths — MathFunctions.java checkCondition), never a
    * silently-truncated result. */
  private def sameDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector dimensions must match: $n vs ${b.numElements()}")
    n
  }

  /** Double-precision dot product of two float vectors (sequential fold in
    * element order — bit-compatible with the HOF/oracle formulation). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = sameDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    sameDims(a, b)
    dotF(a, b) / (math.sqrt(dotF(a, a)) * math.sqrt(dotF(b, b)))
  }

  def l2SquaredF(a: ArrayData, b: ArrayData): Double = {
    val n = sameDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

sealed trait FloatVectorBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
}

/** cosine_similarity(array<float>, array<float>) → double. */
case class CosineSimilarity(left: Expression, right: Expression)
  extends FloatVectorBinary {
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtils.cosineF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtils.cosineF($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(array<float>, array<float>) → double. */
case class DotProduct(left: Expression, right: Expression)
  extends FloatVectorBinary {
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtils.dotF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtils.dotF($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_squared(array<float>, array<float>) → double. */
case class L2Squared(left: Expression, right: Expression)
  extends FloatVectorBinary {
  override def prettyName: String = "l2_squared"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtils.l2SquaredF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtils.l2SquaredF($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
