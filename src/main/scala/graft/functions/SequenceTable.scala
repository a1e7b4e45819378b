package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** sequence(start, stop [, step]) table function — the reference's
  * built-in Sequence TVF (operator/table/Sequence.java:73): inclusive
  * bounds, BIGINT output column named `sequential_number`, step sign must
  * match the direction (Sequence.java:124-131 raises
  * INVALID_FUNCTION_ARGUMENT otherwise). Registered FROM-position through
  * the generic TVF registry; a generator streams rows inside the scan's
  * whole-stage pipeline, no shuffle at any scale. */
case class SequenceTable(start: Expression, stop: Expression, step: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(start, stop, step)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sequence requires bigint (start, stop, step), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def elementSchema: StructType = StructType(Seq(
    StructField("sequential_number", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = start.eval(input)
    val b = stop.eval(input)
    val s = step.eval(input)
    if (a == null) throw new IllegalArgumentException("Start is null")
    if (b == null) throw new IllegalArgumentException("Stop is null")
    if (s == null) throw new IllegalArgumentException("Step is null")
    val (lo, hi, st) =
      (a.asInstanceOf[Long], b.asInstanceOf[Long], s.asInstanceOf[Long])
    if (lo < hi && st <= 0) throw new IllegalArgumentException(
      s"Step must be positive for sequence [$lo, $hi]")
    if (lo > hi && st >= 0) throw new IllegalArgumentException(
      s"Step must be negative for sequence [$lo, $hi]")
    if (lo == hi) Iterator.single(InternalRow(lo))
    else new Iterator[InternalRow] {
      private var cur = lo
      private var live = true
      override def hasNext: Boolean = live
      override def next(): InternalRow = {
        val out = InternalRow(cur)
        // overflow-safe inclusive advance
        val nxt = cur + st
        live = if (st > 0) nxt <= hi && nxt > cur else nxt >= hi && nxt < cur
        cur = nxt
        out
      }
    }
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(start = newChildren(0), stop = newChildren(1), step = newChildren(2))
}
