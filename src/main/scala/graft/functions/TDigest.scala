package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable t-digest with the k1 (arcsine) scale function — the reference's
  * tdigest surface (operator/aggregation/TDigestAggregationFunction.java:29,
  * operator/scalar/TDigestFunctions.java: value_at_quantile,
  * quantile_at_value, trimmed_mean, merge_tdigest) as a first-class binary
  * VALUE: store sketches in a table, merge across queries, ask quantiles
  * later. Differs from graft's QDigest (equi-weight centroids, uniform
  * O(1/K) rank error) by concentrating centroids at the distribution tails:
  * the k1 potential k(q) = (δ/2π)·asin(2q−1) bounds each centroid's q-span
  * by the derivative of its inverse, so p99/p999 stay sharp at 100 TB scale
  * while the middle of the distribution is compressed aggressively.
  *
  * Merging is concat + scale-bounded recompress: associative up to the
  * digest's own error bound and fully deterministic given the multiset of
  * inputs per partition, so Spark's PARTIAL→FINAL split and cross-query
  * merge trees never add surprise error.
  */
object TDigest {
  val DefaultCompression = 100.0

  /** centroids sorted by mean; min/max kept for tail interpolation. */
  final case class Digest(compression: Double, means: Array[Double],
    weights: Array[Double], min: Double, max: Double) {
    def n: Int = means.length
    def totalWeight: Double = {
      var s = 0.0; var i = 0
      while (i < weights.length) { s += weights(i); i += 1 }
      s
    }
  }

  def empty(compression: Double): Digest =
    Digest(compression, Array.empty, Array.empty,
      Double.PositiveInfinity, Double.NegativeInfinity)

  private def kScale(q: Double, compression: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Scale-bounded greedy recompression of centroids sorted by mean. */
  def compress(d: Digest): Digest = {
    if (d.n <= 1) return d
    val idx = d.means.indices.toArray.sortBy(i => d.means(i))
    val total = d.totalWeight
    val outM = new Array[Double](d.n)
    val outW = new Array[Double](d.n)
    var o = 0
    outM(0) = d.means(idx(0)); outW(0) = d.weights(idx(0))
    var cumLeft = 0.0 // weight strictly left of current output centroid
    var i = 1
    while (i < idx.length) {
      val m = d.means(idx(i)); val w = d.weights(idx(i))
      val proposed = outW(o) + w
      val q0 = cumLeft / total
      val q1 = (cumLeft + proposed) / total
      if (kScale(q1, d.compression) - kScale(q0, d.compression) <= 1.0) {
        outM(o) = (outM(o) * outW(o) + m * w) / proposed
        outW(o) = proposed
      } else {
        cumLeft += outW(o)
        o += 1
        outM(o) = m; outW(o) = w
      }
      i += 1
    }
    Digest(d.compression, outM.take(o + 1), outW.take(o + 1), d.min, d.max)
  }

  def add(d: Digest, x: Double): Digest = {
    val ms = new Array[Double](d.n + 1)
    val ws = new Array[Double](d.n + 1)
    System.arraycopy(d.means, 0, ms, 0, d.n)
    System.arraycopy(d.weights, 0, ws, 0, d.n)
    ms(d.n) = x; ws(d.n) = 1.0
    val nd = Digest(d.compression, ms, ws, math.min(d.min, x), math.max(d.max, x))
    // buffer up to 4δ raw points between recompressions (amortized O(log n))
    if (nd.n > 4 * d.compression) compress(nd) else nd
  }

  def merge(a: Digest, b: Digest): Digest = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    compress(Digest(math.max(a.compression, b.compression),
      a.means ++ b.means, a.weights ++ b.weights,
      math.min(a.min, b.min), math.max(a.max, b.max)))
  }

  /** value at quantile q: interpolate over centroid weight midpoints with
    * min/max anchoring the extreme tails (TDigestFunctions.java
    * value_at_quantile). */
  def quantile(d0: Digest, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    val d = compress(d0)
    if (d.n == 0) return Double.NaN
    if (d.n == 1) return d.means(0)
    val total = d.totalWeight
    val target = q * total
    // anchor points: (cumulative weight at centroid midpoint, mean),
    // plus (0, min) and (total, max)
    var cum = 0.0
    var prevX = d.min
    var prevC = 0.0
    var i = 0
    while (i < d.n) {
      val mid = cum + d.weights(i) / 2
      if (target <= mid) {
        val frac = if (mid == prevC) 0.0 else (target - prevC) / (mid - prevC)
        return prevX + math.min(1.0, math.max(0.0, frac)) * (d.means(i) - prevX)
      }
      prevX = d.means(i)
      prevC = mid
      cum += d.weights(i)
      i += 1
    }
    val frac = if (total == prevC) 1.0 else (target - prevC) / (total - prevC)
    prevX + math.min(1.0, math.max(0.0, frac)) * (d.max - prevX)
  }

  /** rank of x as a fraction in [0,1] (TDigestFunctions.java
    * quantile_at_value): inverse of [[quantile]] over the same anchors. */
  def rank(d0: Digest, x: Double): Double = {
    val d = compress(d0)
    if (d.n == 0) return Double.NaN
    if (x <= d.min) return 0.0
    if (x >= d.max) return 1.0
    val total = d.totalWeight
    var cum = 0.0
    var prevX = d.min
    var prevC = 0.0
    var i = 0
    while (i < d.n) {
      val mid = cum + d.weights(i) / 2
      if (x <= d.means(i)) {
        val frac = if (d.means(i) == prevX) 0.0 else (x - prevX) / (d.means(i) - prevX)
        return (prevC + frac * (mid - prevC)) / total
      }
      prevX = d.means(i)
      prevC = mid
      cum += d.weights(i)
      i += 1
    }
    val frac = if (d.max == prevX) 1.0 else (x - prevX) / (d.max - prevX)
    math.min(1.0, (prevC + frac * (total - prevC)) / total)
  }

  /** mean of the values between quantiles [lo, hi] (TDigestFunctions.java
    * trimmed_mean): centroids partially inside the band contribute the
    * overlapped share of their weight. */
  def trimmedMean(d0: Digest, lo: Double, hi: Double): Double = {
    require(lo >= 0 && hi <= 1 && lo <= hi,
      s"trimmed_mean bounds must satisfy 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val d = compress(d0)
    if (d.n == 0) return Double.NaN
    val total = d.totalWeight
    val loW = lo * total; val hiW = hi * total
    var cum = 0.0
    var sum = 0.0; var wsum = 0.0
    var i = 0
    while (i < d.n) {
      val w = d.weights(i)
      val overlap = math.min(cum + w, hiW) - math.max(cum, loW)
      if (overlap > 0) { sum += d.means(i) * overlap; wsum += overlap }
      cum += w
      i += 1
    }
    if (wsum == 0) Double.NaN else sum / wsum
  }

  def serialize(d: Digest): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 + 4 + 16 * d.n)
    bb.putDouble(d.compression).putDouble(d.min).putDouble(d.max).putInt(d.n)
    var i = 0
    while (i < d.n) { bb.putDouble(d.means(i)); bb.putDouble(d.weights(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytesIn: Array[Byte]): Digest = {
    val bytes = SketchTag.payload(bytesIn)
    if (bytes.isEmpty) return empty(DefaultCompression)
    val bb = ByteBuffer.wrap(bytes)
    val compression = bb.getDouble
    val mn = bb.getDouble; val mx = bb.getDouble; val n = bb.getInt
    val ms = new Array[Double](n); val ws = new Array[Double](n)
    var i = 0
    while (i < n) { ms(i) = bb.getDouble; ws(i) = bb.getDouble; i += 1 }
    Digest(compression, ms, ws, mn, mx)
  }

  // codegen entry points
  def valueAtQuantile(bytes: Array[Byte], q: Double): Double =
    quantile(deserialize(bytes), q)
  def quantileAtValue(bytes: Array[Byte], x: Double): Double =
    rank(deserialize(bytes), x)
  def trimmedMeanOf(bytes: Array[Byte], lo: Double, hi: Double): Double =
    trimmedMean(deserialize(bytes), lo, hi)
}

/** tdigest_agg(x[, compression]) → varbinary t-digest. */
case class TDigestAgg(
  child: Expression,
  compression: Double = TDigest.DefaultCompression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest.Digest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tdigest_agg"

  override def createAggregationBuffer(): TDigest.Digest = TDigest.empty(compression)

  override def update(buf: TDigest.Digest, input: InternalRow): TDigest.Digest = {
    val v = child.eval(input)
    if (v == null) buf
    else TDigest.add(buf, v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: Decimal => d.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
    })
  }

  override def merge(a: TDigest.Digest, b: TDigest.Digest): TDigest.Digest =
    TDigest.merge(a, b)
  override def eval(buf: TDigest.Digest): Any =
    SketchTag.wrap(SketchTag.TDigest, TDigest.serialize(TDigest.compress(buf)))
  override def serialize(buf: TDigest.Digest): Array[Byte] = TDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): TDigest.Digest =
    TDigest.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** merge_tdigest(sketch) → sketch (TDigestAggregationFunction merge path). */
case class TDigestMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigest.Digest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_tdigest"

  override def createAggregationBuffer(): TDigest.Digest =
    TDigest.empty(TDigest.DefaultCompression)

  override def update(buf: TDigest.Digest, input: InternalRow): TDigest.Digest = {
    val v = child.eval(input)
    if (v == null) buf
    else TDigest.merge(buf, TDigest.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: TDigest.Digest, b: TDigest.Digest): TDigest.Digest =
    TDigest.merge(a, b)
  override def eval(buf: TDigest.Digest): Any =
    if (buf.n == 0) null
    else SketchTag.wrap(SketchTag.TDigest, TDigest.serialize(buf))
  override def serialize(buf: TDigest.Digest): Array[Byte] = TDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): TDigest.Digest =
    TDigest.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** value_at_quantile(tdigest, q) → double over a t-digest sketch. */
case class TDigestValueAtQuantile(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "tdigest value_at_quantile requires (varbinary, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tdigest_value_at_quantile"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    TDigest.valueAtQuantile(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TDigest.valueAtQuantile($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** quantile_at_value(tdigest, x) → double rank in [0,1]
  * (TDigestFunctions.java quantile_at_value). */
case class QuantileAtValue(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "quantile_at_value requires (varbinary, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantile_at_value"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    TDigest.quantileAtValue(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TDigest.quantileAtValue($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** trimmed_mean(tdigest, lo, hi) → double (TDigestFunctions.java). */
case class TrimmedMean(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == DoubleType &&
      third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "trimmed_mean requires (varbinary, double, double), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "trimmed_mean"
  override protected def nullSafeEval(s: Any, lo: Any, hi: Any): Any =
    TDigest.trimmedMeanOf(s.asInstanceOf[Array[Byte]],
      lo.asInstanceOf[Double], hi.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.TDigest.trimmedMeanOf($a, $b, $c)")
  override protected def withNewChildrenInternal(
    f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
