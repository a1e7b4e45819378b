package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** none_match(a, f) — the reference's ArrayNoneMatchFunction: true when no
  * element matches, false when one does, NULL when nothing matches
  * outright but a NULL lambda result leaves it unknown (three-valued
  * logic, the complement of any_match). A dedicated HOF because Spark
  * only resolves lambda arguments under a top-level HigherOrderFunction. */
case class ArrayNoneMatch(argument: Expression, function: Expression)
  extends HigherOrderFunction with CodegenFallback {

  override def arguments: Seq[Expression] = Seq(argument)
  override def argumentTypes: Seq[AbstractDataType] = Seq(ArrayType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(BooleanType)
  override def children: Seq[Expression] = Seq(argument, function)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "none_match"

  @transient private lazy val elementType: DataType =
    argument.dataType.asInstanceOf[ArrayType].elementType

  override def bindInternal(
    f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): ArrayNoneMatch = {
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
    var sawNull = false
    var i = 0
    while (i < data.numElements()) {
      elemVar.value.set(data.get(i, elementType))
      predForEval.eval(input) match {
        case true => return false
        case null => sawNull = true
        case _ =>
      }
      i += 1
    }
    if (sawNull) null else true
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(argument = newChildren(0), function = newChildren(1))
}
