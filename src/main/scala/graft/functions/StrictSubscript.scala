package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Reference-contract subscript `x[i]` (ArraySubscriptOperator.java,
  * MapSubscriptOperator.java): unlike Spark's element_at (NULL on
  * out-of-bounds/missing), the reference RAISES —
  *   a[0]      → "SQL array indices start at 1"
  *   a[-n]     → "Array subscript is negative"
  *   a[n>len]  → "Array subscript out of bounds"
  *   m[absent] → "Key not present in map"
  * NULL container or NULL index still yield NULL (SQL null propagation).
  * The dialect rewrites `x[i]` here so TRY(x[i]) recovers NULL exactly
  * like the reference's TRY. CodegenFallback: subscript error paths are
  * cold; the hot valid-index path is one branch + array access. */
case class StrictSubscript(container: Expression, index: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(container, index)
  override def nullable: Boolean = true
  override def prettyName: String = "strict_subscript"

  override def dataType: DataType = container.dataType match {
    case ArrayType(et, _) => et
    case MapType(_, vt, _) => vt
    case _ => NullType
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = container.dataType match {
    case _: ArrayType if integral(index.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _: ArrayType =>
      TypeCheckResult.TypeCheckFailure(
        s"array subscript must be integral, got ${index.dataType.sql}")
    case MapType(kt, _, _) if DataType.equalsStructurally(kt, index.dataType,
        ignoreNullability = true) =>
      TypeCheckResult.TypeCheckSuccess
    case MapType(kt, _, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"map key type ${kt.sql} does not match subscript ${index.dataType.sql}")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"subscript needs an array or map, got ${other.sql}")
  }

  @transient private lazy val keyOrdering =
    container.dataType match {
      case MapType(kt, _, _) => TypeUtils.getInterpretedOrdering(kt)
      case _ => null
    }

  override def eval(input: InternalRow): Any = {
    val c = container.eval(input)
    if (c == null) return null
    val i = index.eval(input)
    if (i == null) return null
    container.dataType match {
      case ArrayType(et, _) =>
        val arr = c.asInstanceOf[ArrayData]
        val idx = i.asInstanceOf[Number].longValue()
        if (idx == 0)
          throw new RuntimeException("SQL array indices start at 1")
        if (idx < 0)
          throw new RuntimeException(s"Array subscript is negative: $idx")
        if (idx > arr.numElements())
          throw new RuntimeException(
            s"Array subscript out of bounds: $idx > ${arr.numElements()}")
        if (arr.isNullAt(idx.toInt - 1)) null else arr.get(idx.toInt - 1, et)
      case MapType(kt, vt, _) =>
        val map = c.asInstanceOf[MapData]
        val keys = map.keyArray(); val values = map.valueArray()
        var j = 0
        while (j < map.numElements()) {
          if (keyOrdering.asInstanceOf[Ordering[Any]]
              .equiv(keys.get(j, kt), i))
            return if (values.isNullAt(j)) null else values.get(j, vt)
          j += 1
        }
        throw new RuntimeException(s"Key not present in map: $i")
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(container = newChildren(0), index = newChildren(1))
}
