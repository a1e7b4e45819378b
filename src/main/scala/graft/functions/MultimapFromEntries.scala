package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** multimap_from_entries(array<row(K, V)>) → map<K, array<V>> (reference
  * MultimapFromEntriesFunction.java): duplicate keys collect their values
  * in encounter order instead of erroring like map_from_entries. Fields
  * are positional (first = key, second = value), so any 2-field struct
  * works regardless of names. NULL keys and NULL entries are rejected,
  * matching the reference's "map entry cannot be null" error contract
  * (MultimapFromEntriesFunction.java). */
case class MultimapFromEntries(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private lazy val entryType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def prettyName: String = "multimap_from_entries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multimap_from_entries requires array<struct<k, v>>, got ${other.simpleString}")
  }

  override def dataType: DataType = MapType(
    entryType.fields(0).dataType,
    ArrayType(entryType.fields(1).dataType,
      containsNull = entryType.fields(1).nullable),
    valueContainsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val kType = entryType.fields(0).dataType
    val vType = entryType.fields(1).dataType
    val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
    val values = scala.collection.mutable.LinkedHashMap
      .empty[Any, scala.collection.mutable.ArrayBuffer[Any]]
    var i = 0
    while (i < arr.numElements()) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException("map entry cannot be null")
      val row = arr.getStruct(i, 2)
      if (row.isNullAt(0))
        throw new IllegalArgumentException("map key cannot be null")
      val k = row.get(0, kType)
      val vv = if (row.isNullAt(1)) null else row.get(1, vType)
      values.getOrElseUpdate(k, {
        keys += k
        scala.collection.mutable.ArrayBuffer.empty[Any]
      }) += vv
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys.toArray),
      new GenericArrayData(
        keys.map(k => new GenericArrayData(values(k).toArray): Any).toArray))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
