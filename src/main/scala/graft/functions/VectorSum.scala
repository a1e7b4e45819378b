package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Elementwise vector sum over an embedding column — ONE aggregation state
  * of dimension d instead of d scalar sum states (the reason the reference
  * fuses wide sums: MAIN/sql/planner/iterative/rule/MergeSumsToVectorSum
  * .java:52; vector state seeds at CreateVectorIndexAggregation.java:37).
  * At 100 TB a 768-dim centroid computed as 768 separate sum() aggregates
  * carries 768 buffer slots + 768 merge loops per group through the
  * shuffle; one primitive double[768] buffer is the same bytes but one
  * state, one merge loop, no per-aggregate dispatch.
  *
  * Buffer: primitive Array[Double] (length fixed by the first non-null
  * vector; mismatched dimensions are an error, mirroring VectorUtils).
  * Merge is elementwise + — associative/commutative, so partial aggregation
  * across executors is exactly Spark's normal sum tree.
  */
object VecSum {
  def add(buf: Array[Double], v: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = v.numElements()
    val b = if (buf.length == 0) new Array[Double](n)
    else {
      if (buf.length != n) throw new IllegalArgumentException(
        s"vector_sum: dimensions must match: ${buf.length} vs $n")
      buf
    }
    var i = 0
    while (i < n) {
      b(i) += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i))
      i += 1
    }
    b
  }

  def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    if (a.length != b.length) throw new IllegalArgumentException(
      s"vector_sum: dimensions must match: ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  def ser(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  def deser(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }
}

sealed trait VectorAggBase extends TypedImperativeAggregate[Array[Double]] {
  def child: Expression
  protected def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = VecSum.merge(a, b)
  override def serialize(buf: Array[Double]): Array[Byte] = VecSum.ser(buf)
  override def deserialize(bytes: Array[Byte]): Array[Double] = VecSum.deser(bytes)
}

/** vector_sum(array<float|double>) → array<double> (float-sum semantics:
  * value-equal to d parallel sum(v[i]) aggregates up to double reordering —
  * the fusion target of rules.MergeSumsToVectorSum). */
case class VectorSumAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends VectorAggBase {

  override def prettyName: String = "vector_sum"

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else VecSum.add(buf, v.asInstanceOf[ArrayData], isFloat)
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null else new GenericArrayData(buf)
  override def withNewMutableAggBufferOffset(o: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Null-aware vector sum used by the MergeSumsToVectorSum optimizer rule:
  * per-position sums AND per-position non-null counts, so position i
  * evaluates to NULL exactly when `sum(col_i)` would (no non-null inputs)
  * — the fusion is semantics-preserving for nullable columns. Buffer is
  * one primitive double[2d] (sums ++ counts): still ONE aggregation state
  * and one merge loop where the unfused plan carried d. */
case class VectorSumNullableAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends VectorAggBase {

  override def prettyName: String = "vector_sum_nullable"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length == 0) new Array[Double](2 * n)
    else {
      if (buf.length != 2 * n) throw new IllegalArgumentException(
        s"vector_sum: dimensions must match: ${buf.length / 2} vs $n")
      buf
    }
    val fl = isFloat
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        b(i) += (if (fl) arr.getFloat(i).toDouble else arr.getDouble(i))
        b(n + i) += 1d
      }
      i += 1
    }
    b
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null
    else {
      val n = buf.length / 2
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (buf(n + i) > 0) java.lang.Double.valueOf(buf(i)) else null
        i += 1
      }
      new GenericArrayData(out)
    }
  override def withNewMutableAggBufferOffset(o: Int): VectorSumNullableAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumNullableAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** vector_sum(v, scale) → array<double>: each element is first rounded
  * HALF_UP to `scale` decimals and accumulated as an exact scaled long —
  * bit-identical to SUM(CAST(v[i] AS DECIMAL(18,scale))) regardless of
  * partitioning/merge order. This is the cross-engine-deterministic mode
  * the oracle gate uses (same convention as Tables.dsum). */
case class VectorSumExactAgg(
  child: Expression,
  scale: Int,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends VectorAggBase {

  require(scale >= 0 && scale <= 9, s"vector_sum scale must be 0..9, got $scale")
  private val factor = math.pow(10d, scale)

  override def prettyName: String = "vector_sum_exact"

  // buffer doubles hold exact scaled-long values (|sum| < 2^53 at scale<=9)
  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val b = if (buf.length == 0) new Array[Double](n)
    else {
      if (buf.length != n) throw new IllegalArgumentException(
        s"vector_sum: dimensions must match: ${buf.length} vs $n")
      buf
    }
    val fl = isFloat
    var i = 0
    while (i < n) {
      val x = if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)
      b(i) += java.math.BigDecimal.valueOf(x)
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .movePointRight(scale).doubleValue()
      i += 1
    }
    b
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.length == 0) null
    else new GenericArrayData(buf.map(_ / factor))
  override def withNewMutableAggBufferOffset(o: Int): VectorSumExactAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumExactAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
