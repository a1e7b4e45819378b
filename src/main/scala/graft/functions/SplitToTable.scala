package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** split_to_table(str, delimiter) → rows of (ord, value) — a second
  * polymorphic table function through the TVF registration path next to
  * sequence() (reference table-function framework,
  * MAIN/operator/TableFunctionOperator.java:44). Registered both as a
  * Generator (LATERAL VIEW / SELECT position) and in the table-function
  * registry (FROM position). Delimiter is a literal string, split is
  * non-regex (java.util.regex quoted), empty trailing fields kept —
  * `split_to_table('a,,b', ',')` yields 3 rows. A generator runs inside
  * the scan's whole-stage pipeline: no shuffle, output rows stream
  * per-partition at any scale. */
case class SplitToTable(str: Expression, delim: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(str, delim)

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType == StringType && delim.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "split_to_table requires (string, string), got " +
        s"${str.dataType.simpleString}, ${delim.dataType.simpleString}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("value", StringType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = str.eval(input)
    val d = delim.eval(input)
    if (s == null || d == null) Nil
    else {
      val parts = s.toString.split(java.util.regex.Pattern.quote(d.toString), -1)
      parts.iterator.zipWithIndex.map { case (p, i) =>
        InternalRow((i + 1).toLong, UTF8String.fromString(p))
      }
    }
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(str = newChildren(0), delim = newChildren(1))
}
