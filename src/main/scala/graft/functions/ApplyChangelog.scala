package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** apply_changelog(ordinal, operation, row) — the reference's CDC fold
  * (presto-iceberg/.../function/changelog/ApplyChangelogFunction.java +
  * ChangelogRecord.java): per group (the row's key), fold an ordered
  * changelog of INSERT / UPDATE_BEFORE / UPDATE_AFTER / DELETE records
  * down to the latest surviving row. Contract mirrored exactly from
  * ChangelogRecord.merge:
  *   - higher ordinal wins unconditionally;
  *   - equal ordinals: an incoming INSERT/UPDATE_AFTER replaces the held
  *     record unless the held record is itself an INSERT (two inserts at
  *     one ordinal are unresolvable → error); an incoming UPDATE_BEFORE/
  *     DELETE at the held ordinal is dropped (pre-images never shadow);
  *   - output is NULL when the final operation is DELETE
  *     (ApplyChangelogFunction.output), and NULL for an empty group.
  *
  * The state is one (ordinal, operation, row) triple — O(1) per group,
  * mergeable in any order, combined map-side like any Spark partial
  * aggregate. At 100 TB a changelog apply is therefore one hash
  * aggregation shuffled on the key columns: no sort, no windowing, state
  * bounded by group count not record count. The row argument is generic
  * (any Spark SQL type) — partial-state serialization goes through an
  * UnsafeProjection of (bigint, string, T).
  */
case class ApplyChangelog(
    ordinal: Expression,
    operation: Expression,
    row: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ApplyChangelog.State] {

  import ApplyChangelog.State

  override def children: Seq[Expression] = Seq(ordinal, operation, row)
  override def nullable: Boolean = true
  override def dataType: DataType = row.dataType
  override def prettyName: String = "apply_changelog"

  override def createAggregationBuffer(): State = new State(Long.MinValue, null, null)

  private def copyVal(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case s: UTF8String => s.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case other => other
  }

  /** ChangelogRecord.merge, verbatim semantics. */
  private def mergeIn(st: State, ord: Long, op: String, v: Any): State = {
    if (st.op == null || ord > st.ordinal) {
      st.ordinal = ord; st.op = op; st.row = v
    } else if (ord == st.ordinal) {
      op.toUpperCase match {
        case "INSERT" | "UPDATE_AFTER" =>
          if (st.op.equalsIgnoreCase("INSERT"))
            throw new IllegalStateException(
              "unresolvable order for two inserts")
          st.ordinal = ord; st.op = op; st.row = v
        case "UPDATE_BEFORE" | "DELETE" => // pre-images never shadow
        case other =>
          throw new IllegalArgumentException(
            s"unsupported operation type $other")
      }
    }
    st
  }

  override def update(st: State, input: InternalRow): State = {
    val o = ordinal.eval(input)
    val op = operation.eval(input)
    if (o == null || op == null) st
    else {
      val ord = o match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case s: java.lang.Short => s.longValue()
        case b: java.lang.Byte => b.longValue()
        case other => throw new IllegalArgumentException(
          s"apply_changelog ordinal must be integral, got $other")
      }
      mergeIn(st, ord, op.asInstanceOf[UTF8String].toString,
        copyVal(row.eval(input)))
    }
  }

  override def merge(a: State, b: State): State =
    if (b.op == null) a else mergeIn(a, b.ordinal, b.op, b.row)

  override def eval(st: State): Any =
    if (st.op == null || st.op.equalsIgnoreCase("DELETE")) null else st.row

  @transient private lazy val ser =
    UnsafeProjection.create(Array[DataType](LongType, StringType, row.dataType))

  override def serialize(st: State): Array[Byte] =
    if (st.op == null) Array.emptyByteArray
    else ser(InternalRow(st.ordinal, UTF8String.fromString(st.op), st.row))
      .getBytes

  override def deserialize(bytes: Array[Byte]): State =
    if (bytes.isEmpty) createAggregationBuffer()
    else {
      val r = new UnsafeRow(3)
      r.pointTo(bytes, bytes.length)
      new State(r.getLong(0), r.getUTF8String(1).toString,
        copyVal(r.get(2, row.dataType)))
    }

  override def withNewMutableAggBufferOffset(o: Int): ApplyChangelog =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApplyChangelog =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(ordinal = cs(0), operation = cs(1), row = cs(2))
}

object ApplyChangelog {
  final class State(var ordinal: Long, var op: String, var row: Any)

  def column(ordinal: Column, operation: Column, row: Column): Column =
    Bridge.column(ApplyChangelog(Bridge.expression(ordinal),
      Bridge.expression(operation), Bridge.expression(row))
      .toAggregateExpression())
}
