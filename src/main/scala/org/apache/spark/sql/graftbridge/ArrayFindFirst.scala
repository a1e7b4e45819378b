package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** find_first / find_first_index (reference ArrayFindFirstFunction /
  * ArrayFindFirstIndexFunction): first element (or its 1-based index)
  * matching the lambda, NULL when nothing matches. Spark resolves a
  * lambda-bearing call only when the top-level expression is a
  * HigherOrderFunction, so this is a dedicated HOF rather than a
  * filter+element_at composition. */
case class ArrayFindFirst(
  argument: Expression,
  function: Expression,
  returnIndex: Boolean)
  extends HigherOrderFunction with CodegenFallback {

  override def arguments: Seq[Expression] = Seq(argument)
  override def argumentTypes: Seq[AbstractDataType] = Seq(ArrayType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(BooleanType)
  override def children: Seq[Expression] = Seq(argument, function)

  @transient private lazy val elementType: DataType =
    argument.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType =
    if (returnIndex) LongType else elementType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (returnIndex) "find_first_index" else "find_first"

  override def bindInternal(
    f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ArrayFindFirst = {
    val ArrayType(et, cn) = argument.dataType
    copy(function = f(function, Seq((et, cn))))
  }

  @transient private lazy val elemVar: NamedLambdaVariable =
    function.asInstanceOf[LambdaFunction]
      .arguments.head.asInstanceOf[NamedLambdaVariable]

  @transient private lazy val predForEval: Expression = functionsForEval.head

  override def eval(input: InternalRow): Any = {
    val arr = argument.eval(input)
    if (arr == null) return null
    val data = arr.asInstanceOf[ArrayData]
    var i = 0
    while (i < data.numElements()) {
      val v = data.get(i, elementType)
      elemVar.value.set(v)
      if (predForEval.eval(input) == true) {
        return if (returnIndex) (i + 1).toLong else v
      }
      i += 1
    }
    null
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(argument = newChildren(0), function = newChildren(1))
}
