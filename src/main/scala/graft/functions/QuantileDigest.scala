package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Mergeable quantile digest with first-class binary state — the
  * reference's qdigest/tdigest surface (QuantileDigestAggregationFunction
  * .java:32, TDigestAggregationFunction.java:29, QuantileDigestFunctions
  * .java value_at_quantile) where the sketch is a VALUE: store it in a
  * table, merge sketches across queries/days, query quantiles later.
  * Spark's approx_percentile keeps its digest internal; this exposes it.
  *
  * Structure: a centroid list (mean, weight) capped at K entries,
  * compressed by equi-weight greedy merging in mean order. Compression
  * caps each centroid at ceil(W/K) weight, so rank error is O(1/K)
  * (K = 200 → ≈0.5%). Merge = concat + compress: associative up to the
  * O(1/K) bound, so 1000-executor partial aggregation and cross-query
  * merge trees degrade gracefully, never silently wrong.
  */
object QDigest {
  val DefaultK = 200

  /** digest = (k, centroids sorted by mean). */
  final case class Digest(k: Int, means: Array[Double], weights: Array[Double]) {
    def n: Int = means.length
    def totalWeight: Double = { var s = 0.0; var i = 0; while (i < weights.length) { s += weights(i); i += 1 }; s }
  }

  def empty(k: Int): Digest = Digest(k, Array.empty, Array.empty)

  /** Greedy equi-weight compression of (mean, weight) pairs sorted by mean. */
  def compress(k: Int, ms: Array[Double], ws: Array[Double]): Digest = {
    if (ms.length <= k) return Digest(k, ms, ws)
    val idx = ms.indices.toArray.sortBy(i => ms(i))
    var total = 0.0
    ws.foreach(total += _)
    val cap = total / k
    // greedy merging can fragment to more than k outputs (a centroid heavier
    // than cap keeps its own slot) — bounded by ~2k, never truncated
    val outM = new Array[Double](ms.length)
    val outW = new Array[Double](ms.length)
    var o = -1
    for (i <- idx) {
      val m = ms(i); val w = ws(i)
      if (o >= 0 && outW(o) + w <= cap) {
        val nw = outW(o) + w
        outM(o) = (outM(o) * outW(o) + m * w) / nw
        outW(o) = nw
      } else {
        o += 1
        outM(o) = m; outW(o) = w
      }
    }
    Digest(k, outM.take(o + 1), outW.take(o + 1))
  }

  def add(d: Digest, x: Double): Digest = add(d, x, 1.0)

  /** Weighted insertion (QuantileDigestAggregationFunction's weighted
    * signature): one centroid of weight w — identical to inserting x
    * w times, at any weight scale. */
  def add(d: Digest, x: Double, w: Double): Digest = {
    require(w > 0, s"qdigest weight must be positive, got $w")
    val ms = new Array[Double](d.n + 1)
    val ws = new Array[Double](d.n + 1)
    System.arraycopy(d.means, 0, ms, 0, d.n)
    System.arraycopy(d.weights, 0, ws, 0, d.n)
    ms(d.n) = x; ws(d.n) = w
    if (ms.length > 2 * d.k) compress(d.k, ms, ws) else Digest(d.k, ms, ws)
  }

  def merge(a: Digest, b: Digest): Digest = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val k = math.max(a.k, b.k)
    compress(k, a.means ++ b.means, a.weights ++ b.weights)
  }

  /** Quantile by linear interpolation over cumulative centroid weights. */
  def quantile(d: Digest, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    if (d.n == 0) return Double.NaN
    val idx = d.means.indices.toArray.sortBy(i => d.means(i))
    val total = d.totalWeight
    val target = q * total
    var cum = 0.0
    var prevMean = d.means(idx.head)
    var prevCum = 0.0
    for (i <- idx) {
      val mid = cum + d.weights(i) / 2
      if (mid >= target) {
        if (prevCum == 0.0 && mid == prevCum) return d.means(i)
        val frac = if (mid == prevCum) 0.0 else (target - prevCum) / (mid - prevCum)
        return prevMean + frac.max(0).min(1) * (d.means(i) - prevMean)
      }
      prevMean = d.means(i)
      prevCum = mid
      cum += d.weights(i)
    }
    d.means(idx.last)
  }

  def serialize(d: Digest): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * d.n)
    bb.putInt(d.k).putInt(d.n)
    var i = 0
    while (i < d.n) { bb.putDouble(d.means(i)); bb.putDouble(d.weights(i)); i += 1 }
    bb.array()
  }

  def deserialize(bytesIn: Array[Byte]): Digest = {
    val bytes = SketchTag.payload(bytesIn)
    if (bytes.isEmpty) return empty(DefaultK)
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt
    val ms = new Array[Double](n); val ws = new Array[Double](n)
    var i = 0
    while (i < n) { ms(i) = bb.getDouble; ws(i) = bb.getDouble; i += 1 }
    Digest(k, ms, ws)
  }

  /** Entry point for the scalar expression's codegen. */
  def valueAtQuantile(bytes: Array[Byte], q: Double): Double =
    quantile(deserialize(bytes), q)
}

/** qdigest_agg(x[, w][, k]) → varbinary quantile digest. A weight child
  * makes each row count as w occurrences of x (the reference's
  * QuantileDigestAggregationFunction weighted signature); null-weight rows
  * are skipped like null values. */
case class QDigestAgg(
  child: Expression,
  weight: Option[Expression] = None,
  k: Int = QDigest.DefaultK,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigest.Digest] {

  override def children: Seq[Expression] = child +: weight.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "qdigest_agg"

  override def createAggregationBuffer(): QDigest.Digest = QDigest.empty(k)

  private def asDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
  }

  override def update(buf: QDigest.Digest, input: InternalRow): QDigest.Digest = {
    val v = child.eval(input)
    if (v == null) return buf
    weight match {
      case None => QDigest.add(buf, asDouble(v))
      case Some(we) =>
        val w = we.eval(input)
        if (w == null) buf else QDigest.add(buf, asDouble(v), asDouble(w))
    }
  }

  override def merge(a: QDigest.Digest, b: QDigest.Digest): QDigest.Digest =
    QDigest.merge(a, b)
  override def eval(buf: QDigest.Digest): Any =
    SketchTag.wrap(SketchTag.QDigest,
      QDigest.serialize(QDigest.compress(buf.k, buf.means, buf.weights)))
  override def serialize(buf: QDigest.Digest): Array[Byte] = QDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QDigest.Digest =
    QDigest.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): QDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
}

/** approx_percentile_w(x, w, p) → double — the reference's weighted
  * approx_percentile overload (ApproximateLongPercentileAggregations
  * weighted signatures), computed as value_at_quantile over a weighted
  * qdigest in one aggregate. */
case class ApproxPercentileWeightedAgg(
  child: Expression,
  weight: Expression,
  percentage: Double,
  k: Int = QDigest.DefaultK,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigest.Digest] {

  require(percentage >= 0.0 && percentage <= 1.0,
    s"approx_percentile_w percentage must be in [0, 1], got $percentage")

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "approx_percentile_w"

  override def createAggregationBuffer(): QDigest.Digest = QDigest.empty(k)

  private def asDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
  }

  override def update(buf: QDigest.Digest, input: InternalRow): QDigest.Digest = {
    val v = child.eval(input)
    if (v == null) return buf
    val w = weight.eval(input)
    if (w == null) buf else QDigest.add(buf, asDouble(v), asDouble(w))
  }

  override def merge(a: QDigest.Digest, b: QDigest.Digest): QDigest.Digest =
    QDigest.merge(a, b)
  override def eval(buf: QDigest.Digest): Any =
    if (buf.n == 0) null else QDigest.quantile(buf, percentage)
  override def serialize(buf: QDigest.Digest): Array[Byte] = QDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QDigest.Digest =
    QDigest.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): ApproxPercentileWeightedAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxPercentileWeightedAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), weight = newChildren(1))
}

/** merge_qdigest(sketch) → sketch — cross-query re-aggregation of stored
  * digests (QuantileDigestAggregationFunction merge path). */
case class QDigestMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QDigest.Digest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_qdigest"

  override def createAggregationBuffer(): QDigest.Digest =
    QDigest.empty(QDigest.DefaultK)

  override def update(buf: QDigest.Digest, input: InternalRow): QDigest.Digest = {
    val v = child.eval(input)
    if (v == null) buf
    else QDigest.merge(buf, QDigest.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: QDigest.Digest, b: QDigest.Digest): QDigest.Digest =
    QDigest.merge(a, b)
  override def eval(buf: QDigest.Digest): Any =
    if (buf.n == 0) null
    else SketchTag.wrap(SketchTag.QDigest, QDigest.serialize(buf))
  override def serialize(buf: QDigest.Digest): Array[Byte] = QDigest.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QDigest.Digest =
    QDigest.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): QDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** value_at_quantile(sketch, q) → double (QuantileDigestFunctions.java). */
case class ValueAtQuantile(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "value_at_quantile requires (varbinary sketch, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "value_at_quantile"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    QDigest.valueAtQuantile(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(
    ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
    ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.QDigest.valueAtQuantile($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
