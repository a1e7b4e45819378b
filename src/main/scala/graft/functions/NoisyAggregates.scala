package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Differential-privacy "noisy" aggregates (reference family:
  * MAIN/operator/aggregation/noisyaggregation/NoisyCountAggregationUtils
  * .java:32-99, NoisyCountAndSumAggregationUtils.java:30-113):
  *
  *  - noisy_count_gaussian(value, noiseScale[, seed])    → bigint
  *  - noisy_count_if_gaussian(cond, noiseScale[, seed])  → bigint
  *  - noisy_sum_gaussian(x, noiseScale[, lo, hi][, seed]) → double
  *  - noisy_avg_gaussian(x, noiseScale[, lo, hi][, seed]) → double
  *
  * Semantics pinned to the reference: nulls are skipped; zero rows → NULL
  * (not 0); counts are `round(max(true + N(0, scale²), 0))`; sum/avg add
  * the noise AFTER the exact aggregate; optional [lo, hi] clips each input
  * value before accumulation (clip(v) = max(lo, min(hi, v)),
  * NoisyCountAndSumAggregationUtils.clip); `noiseScale < 0` is an error,
  * `noiseScale = 0` degrades to the exact aggregate (the oracle gate path).
  * A seeded run draws ONE Gaussian per group via `new Random(seed)
  * .nextGaussian()` — deterministic regardless of partitioning because the
  * noise is applied at finalization, never in partial aggregation. That is
  * the property that lets this run unchanged on a 1000-executor cluster:
  * the distributed part is a plain (count, sum) pair with map-side
  * partials; the privacy mechanism is a driver-side finalization.
  */
object NoisyGaussian {
  final val ModeCount = 0
  final val ModeCountIf = 1
  final val ModeSum = 2
  final val ModeAvg = 3

  def noise(scale: Double, seed: Option[Long]): Double =
    if (scale == 0d) 0d
    else {
      val rnd = seed match {
        case Some(s) => new java.util.Random(s)
        case None => new java.security.SecureRandom()
      }
      rnd.nextGaussian() * scale
    }
}

/** Mutable (count, sum) pair — the entire distributed state. */
final class NoisyState(var count: Long, var sum: Double) extends Serializable

case class NoisyGaussianAgg(
  child: Expression,
  noiseScale: Double,
  lower: Option[Double],
  upper: Option[Double],
  seed: Option[Long],
  mode: Int,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NoisyState] {

  if (noiseScale < 0)
    throw new IllegalArgumentException("Noise scale must be >= 0")
  if (lower.isDefined != upper.isDefined)
    throw new IllegalArgumentException(
      "Lower and upper should either both be set or both be absent")
  for (lo <- lower; hi <- upper; if hi < lo)
    throw new IllegalArgumentException("Lower must be <= upper")

  override def prettyName: String = mode match {
    case NoisyGaussian.ModeCount => "noisy_count_gaussian"
    case NoisyGaussian.ModeCountIf => "noisy_count_if_gaussian"
    case NoisyGaussian.ModeSum => "noisy_sum_gaussian"
    case NoisyGaussian.ModeAvg => "noisy_avg_gaussian"
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (mode <= NoisyGaussian.ModeCountIf) LongType else DoubleType

  override def checkInputDataTypes(): TypeCheckResult = mode match {
    case NoisyGaussian.ModeCountIf => child.dataType match {
      case BooleanType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a boolean condition, got ${other.simpleString}")
    }
    case NoisyGaussian.ModeCount => TypeCheckResult.TypeCheckSuccess
    case _ => child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric argument, got ${other.simpleString}")
    }
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: Decimal => d.toDouble
    case other => throw new IllegalStateException(
      s"$prettyName: unexpected input ${other.getClass.getName}")
  }

  override def createAggregationBuffer(): NoisyState = new NoisyState(0L, 0d)

  override def update(buf: NoisyState, input: InternalRow): NoisyState = {
    val v = child.eval(input)
    if (v == null) return buf
    mode match {
      case NoisyGaussian.ModeCount => buf.count += 1
      case NoisyGaussian.ModeCountIf =>
        if (v.asInstanceOf[Boolean]) buf.count += 1
      case _ =>
        buf.count += 1
        var x = toDouble(v)
        for (lo <- lower; hi <- upper) x = math.max(lo, math.min(hi, x))
        buf.sum += x
    }
    buf
  }

  override def merge(a: NoisyState, b: NoisyState): NoisyState = {
    a.count += b.count
    a.sum += b.sum
    a
  }

  override def eval(buf: NoisyState): Any = {
    // count==0 → NULL on every mode, matching writeNoisyCountOutput — for
    // count_if the reference only touches state on TRUE rows, so an
    // all-false group is NULL there as well.
    if (buf.count == 0) return null
    val n = NoisyGaussian.noise(noiseScale, seed)
    mode match {
      case NoisyGaussian.ModeCount | NoisyGaussian.ModeCountIf =>
        math.round(math.max(buf.count + n, 0d))
      case NoisyGaussian.ModeSum => buf.sum + n
      case NoisyGaussian.ModeAvg => buf.sum / buf.count + n
    }
  }

  override def serialize(buf: NoisyState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(buf.count).putDouble(buf.sum)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): NoisyState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    new NoisyState(bb.getLong, bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): NoisyGaussianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): NoisyGaussianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** SQL-arity dispatch shared by the four names. */
object NoisyBuilders {
  private def foldD(e: Expression, what: String): Double = {
    val v = if (e.foldable) e.eval(null) else null
    v match {
      case n: Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case _ => throw new IllegalArgumentException(
        s"$what must be a foldable numeric literal, got ${e.sql}")
    }
  }
  private def foldL(e: Expression, what: String): Long = {
    val v = if (e.foldable) e.eval(null) else null
    v match {
      case n: Number => n.longValue()
      case _ => throw new IllegalArgumentException(
        s"$what must be a foldable integer literal, got ${e.sql}")
    }
  }

  /** count/count_if: (value, noiseScale[, randomSeed]). */
  def count(name: String, mode: Int)(es: Seq[Expression]): Expression = {
    if (es.length < 2 || es.length > 3) throw new IllegalArgumentException(
      s"$name(value, noiseScale[, randomSeed]) takes 2 or 3 arguments, got ${es.length}")
    NoisyGaussianAgg(es.head, foldD(es(1), "noiseScale"), None, None,
      if (es.length == 3) Some(foldL(es(2), "randomSeed")) else None, mode)
      .toAggregateExpression()
  }

  /** sum/avg: (x, noiseScale[, lower, upper][, randomSeed]) — arities 2-5
    * mirroring the reference's plain/Clipping/RandomSeed overloads. */
  def sumAvg(name: String, mode: Int)(es: Seq[Expression]): Expression = {
    val (lo, hi, seed) = es.length match {
      case 2 => (None, None, None)
      case 3 => (None, None, Some(foldL(es(2), "randomSeed")))
      case 4 => (Some(foldD(es(2), "lower")), Some(foldD(es(3), "upper")), None)
      case 5 => (Some(foldD(es(2), "lower")), Some(foldD(es(3), "upper")),
        Some(foldL(es(4), "randomSeed")))
      case n => throw new IllegalArgumentException(
        s"$name(x, noiseScale[, lower, upper][, randomSeed]) takes 2-5 arguments, got $n")
    }
    NoisyGaussianAgg(es.head, foldD(es(1), "noiseScale"), lo, hi, seed, mode)
      .toAggregateExpression()
  }
}
