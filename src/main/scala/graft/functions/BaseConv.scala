package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** to_base / from_base (reference MathFunctions.java:1599-1618):
  * signed radix conversion with Java Long semantics — unlike Spark's
  * `conv`, which reinterprets negatives as unsigned 64-bit and silently
  * maps invalid digits to 0 instead of erroring. */
object BaseConvUtils {
  def checkRadix(radix: Long): Unit =
    if (radix < Character.MIN_RADIX || radix > Character.MAX_RADIX)
      throw new IllegalArgumentException(
        s"Radix must be between ${Character.MIN_RADIX} and ${Character.MAX_RADIX}, got $radix")

  def toBase(value: Long, radix: Long): UTF8String = {
    checkRadix(radix)
    UTF8String.fromString(java.lang.Long.toString(value, radix.toInt))
  }

  def fromBase(value: UTF8String, radix: Long): Long = {
    checkRadix(radix)
    try java.lang.Long.parseLong(value.toString, radix.toInt)
    catch {
      case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"Not a valid base-$radix number: $value", e)
    }
  }
}

case class ToBase(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "to_base"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"to_base requires (bigint, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override protected def nullSafeEval(v: Any, r: Any): Any =
    BaseConvUtils.toBase(v.asInstanceOf[Long], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BaseConvUtils.toBase($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class FromBase(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "from_base"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"from_base requires (varchar, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override protected def nullSafeEval(v: Any, r: Any): Any =
    BaseConvUtils.fromBase(v.asInstanceOf[UTF8String], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BaseConvUtils.fromBase($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
