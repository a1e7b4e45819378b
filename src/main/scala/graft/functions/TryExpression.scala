package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** TRY(expr) — the reference's error-suppressing wrapper
  * (MAIN/operator/scalar/TryFunction.java + TryCastFunction.java): any
  * runtime evaluation error becomes NULL instead of failing the query.
  * Spark only has per-function try_* variants (try_divide, try_cast, …);
  * this closes the general form for expressions with no try twin — e.g.
  * graft's own strict kernels (hamming_distance length check, vector
  * dimension check). CodegenFallback: a catch-all handler cannot live
  * inside whole-stage codegen, and TRY sites are cold paths by design. */
case class TryExpression(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def prettyName: String = "try"
  override def eval(input: InternalRow): Any =
    try child.eval(input) catch { case _: Exception => null }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
