package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** array_max_by / array_min_by (reference presto-sql-helpers
  * ArraySqlFunctions.java:114,127): the array element whose f-value is
  * maximal/minimal; NULL f-values are skipped (the repo's documented
  * deviation from the reference macro, which nulls the whole result —
  * same semantics as ArrayMapExtras.arrayMaxBy, the Column-API twin).
  * Ties: max_by keeps the LATEST such element, min_by the EARLIEST —
  * exactly the reference macro's array_max/array_min over (value, index)
  * rows. A dedicated HigherOrderFunction because Spark resolves a
  * lambda-bearing call only under a HOF class. */
case class ArrayMinMaxBy(
  argument: Expression,
  function: Expression,
  isMax: Boolean)
  extends HigherOrderFunction with CodegenFallback {

  override def arguments: Seq[Expression] = Seq(argument)
  override def argumentTypes: Seq[AbstractDataType] = Seq(ArrayType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(AnyDataType)
  override def children: Seq[Expression] = Seq(argument, function)

  @transient private lazy val elementType: DataType =
    argument.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = elementType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (isMax) "array_max_by" else "array_min_by"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isSuccess) base
    else TypeUtils.checkForOrderingExpr(function.dataType, prettyName)
  }

  override def bindInternal(
    f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ArrayMinMaxBy = {
    val ArrayType(et, cn) = argument.dataType
    copy(function = f(function, Seq((et, cn))))
  }

  @transient private lazy val elemVar: NamedLambdaVariable =
    function.asInstanceOf[LambdaFunction]
      .arguments.head.asInstanceOf[NamedLambdaVariable]

  @transient private lazy val fnForEval: Expression = functionsForEval.head

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(function.dataType)

  override def eval(input: InternalRow): Any = {
    val arr = argument.eval(input)
    if (arr == null) return null
    val data = arr.asInstanceOf[ArrayData]
    var best: Any = null
    var bestKey: Any = null
    var i = 0
    while (i < data.numElements()) {
      val v = if (data.isNullAt(i)) null else data.get(i, elementType)
      elemVar.value.set(v)
      val key = fnForEval.eval(input)
      if (key != null) {
        val take =
          if (bestKey == null) true
          else {
            val cmp = ordering.compare(key, bestKey)
            if (isMax) cmp >= 0 else cmp < 0
          }
        if (take) { best = v; bestKey = key }
      }
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(argument = newChildren(0), function = newChildren(1))
}
