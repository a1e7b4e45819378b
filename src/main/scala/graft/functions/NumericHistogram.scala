package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Streaming numeric histogram — the reference's `numeric_histogram`
  * aggregate (DoubleHistogramAggregation.java over NumericHistogram.java:36):
  * keeps at most `maxBuckets` (value, weight) bins; when full, repeatedly
  * merges the adjacent pair with the least variance-increase penalty
  * (NumericHistogram.java:314 computePenalty). Mergeable across partitions
  * (concat + re-compact), so partial aggregation works at any parallelism;
  * when the number of distinct inputs is ≤ maxBuckets the result is exact
  * and independent of partitioning — which is what the oracle gate pins.
  */
object NumericHist {

  /** Bins kept sorted ascending by value after every compact. */
  final case class Hist(maxBuckets: Int, values: Array[Double],
                        weights: Array[Double]) {
    def n: Int = values.length
  }

  def empty(maxBuckets: Int): Hist =
    Hist(maxBuckets, Array.empty, Array.empty)

  /** Sort by value and sum weights of identical values. */
  private def mergeSame(vs: Array[Double], ws: Array[Double]): (Array[Double], Array[Double]) = {
    if (vs.isEmpty) return (vs, ws)
    val idx = vs.indices.toArray.sortBy(vs)
    val ov = new Array[Double](vs.length)
    val ow = new Array[Double](vs.length)
    var o = 0
    ov(0) = vs(idx(0)); ow(0) = ws(idx(0))
    var i = 1
    while (i < idx.length) {
      val v = vs(idx(i)); val w = ws(idx(i))
      if (v == ov(o)) ow(o) += w
      else { o += 1; ov(o) = v; ow(o) = w }
      i += 1
    }
    (ov.take(o + 1), ow.take(o + 1))
  }

  /** NumericHistogram.java:314 — variance-increase cost of merging two bins. */
  private def penalty(v1: Double, w1: Double, v2: Double, w2: Double): Double = {
    val w = w1 + w2
    w * (v1 - v2) * (v1 - v2) * ((w1 * w2) / (w * w))
  }

  /** Merge adjacent min-penalty pairs until at most `target` bins remain.
    * Input must be sorted ascending; stays sorted. */
  private def mergeBuckets(vs0: Array[Double], ws0: Array[Double], target: Int): (Array[Double], Array[Double]) = {
    var vs = vs0.toBuffer
    var ws = ws0.toBuffer
    while (vs.length > target) {
      var best = 0
      var bestP = Double.MaxValue
      var i = 0
      while (i < vs.length - 1) {
        val p = penalty(vs(i), ws(i), vs(i + 1), ws(i + 1))
        if (p < bestP) { bestP = p; best = i }
        i += 1
      }
      val nw = ws(best) + ws(best + 1)
      val nv = (vs(best) * ws(best) + vs(best + 1) * ws(best + 1)) / nw
      vs(best) = nv; ws(best) = nw
      vs.remove(best + 1); ws.remove(best + 1)
    }
    (vs.toArray, ws.toArray)
  }

  def compact(h: Hist): Hist = {
    val (v1, w1) = mergeSame(h.values, h.weights)
    if (v1.length <= h.maxBuckets) Hist(h.maxBuckets, v1, w1)
    else {
      val (v2, w2) = mergeBuckets(v1, w1, h.maxBuckets)
      Hist(h.maxBuckets, v2, w2)
    }
  }

  def add(h: Hist, value: Double, weight: Double): Hist = {
    val appended = Hist(h.maxBuckets, h.values :+ value, h.weights :+ weight)
    // buffer twice maxBuckets before paying for a compact, like the reference
    if (appended.n >= h.maxBuckets * 2) compact(appended) else appended
  }

  def merge(a: Hist, b: Hist): Hist = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    compact(Hist(math.max(a.maxBuckets, b.maxBuckets),
      a.values ++ b.values, a.weights ++ b.weights))
  }

  def serialize(h: Hist): Array[Byte] = {
    val c = compact(h)
    val bb = ByteBuffer.allocate(8 + 16 * c.n)
    bb.putInt(c.maxBuckets); bb.putInt(c.n)
    c.values.foreach(bb.putDouble); c.weights.foreach(bb.putDouble)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Hist = {
    val bb = ByteBuffer.wrap(bytes)
    val mb = bb.getInt; val n = bb.getInt
    val vs = Array.fill(n)(bb.getDouble)
    val ws = Array.fill(n)(bb.getDouble)
    Hist(mb, vs, ws)
  }
}

/** numeric_histogram(buckets, value[, weight]) → map<double,double>. */
case class NumericHistogramAgg(
    child: Expression,
    weight: Option[Expression],
    maxBuckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NumericHist.Hist] {

  require(maxBuckets > 1, "numeric_histogram bucket count must be > 1")
  override def children: Seq[Expression] = Seq(child) ++ weight.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(DoubleType, DoubleType, valueContainsNull = false)
  override def prettyName: String = "numeric_histogram"

  override def createAggregationBuffer(): NumericHist.Hist =
    NumericHist.empty(maxBuckets)

  override def update(buf: NumericHist.Hist, input: InternalRow): NumericHist.Hist = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val w = weight.map(_.eval(input)) match {
        case Some(null) => return buf
        case Some(x: Number) => x.doubleValue()
        case None => 1.0
        case other => throw new IllegalStateException(s"bad weight $other")
      }
      NumericHist.add(buf, v.asInstanceOf[Number].doubleValue(), w)
    }
  }

  override def merge(a: NumericHist.Hist, b: NumericHist.Hist): NumericHist.Hist =
    NumericHist.merge(a, b)

  override def eval(buf: NumericHist.Hist): Any = {
    val c = NumericHist.compact(buf)
    ArrayBasedMapData(c.values.map(_.asInstanceOf[Any]),
      c.weights.map(_.asInstanceOf[Any]))
  }

  override def serialize(buf: NumericHist.Hist): Array[Byte] = NumericHist.serialize(buf)
  override def deserialize(bytes: Array[Byte]): NumericHist.Hist = NumericHist.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): NumericHistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): NumericHistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    if (cs.length == 2) copy(child = cs(0), weight = Some(cs(1)))
    else copy(child = cs(0))
}

object NumericHistogramAgg {
  def column(value: Column, buckets: Int): Column =
    Bridge.column(NumericHistogramAgg(Bridge.expression(value), None, buckets)
      .toAggregateExpression())
  def column(value: Column, weight: Column, buckets: Int): Column =
    Bridge.column(NumericHistogramAgg(Bridge.expression(value),
      Some(Bridge.expression(weight)), buckets).toAggregateExpression())
}
