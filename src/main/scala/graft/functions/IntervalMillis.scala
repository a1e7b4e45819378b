package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** to_milliseconds(interval day to second) → BIGINT milliseconds
  * (reference DateTimeFunctions.java toMilliseconds — the reference's
  * interval-day-time is physically millis; Spark's is micros, so this is
  * one integer division, codegen'd). */
case class IntervalMillis(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "to_milliseconds"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: DayTimeIntervalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_milliseconds expects interval day to second, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    v.asInstanceOf[Long] / 1000L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c / 1000L")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
