package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** differential_entropy — continuous-distribution entropy estimates in bits
  * (reference: MAIN/operator/aggregation/differentialentropy/
  * DifferentialEntropyAggregation.java:36-103, strategies per
  * DifferentialEntropyStateStrategy.java:35-76):
  *
  *  - differential_entropy(size, x)            — reservoir sample (≤ size
  *    values kept), Vasicek spacing estimator (EntropyCalculations
  *    .calculateFromSamplesUsingVasicek:28-46)
  *  - differential_entropy(size, x, w)         — weighted reservoir
  *    (A-Res priority sampling, WeightedDoubleReservoirSample.java:72-79),
  *    same Vasicek finalization
  *  - differential_entropy(size, x, w, 'fixed_histogram_mle', min, max)
  *    — fixed equi-width histogram, MLE plug-in estimate
  *    (FixedHistogramMleStateStrategy.calculateEntropy:87-102)
  *  - differential_entropy(size, x, w, 'fixed_histogram_jacknife', min, max)
  *    — jackknife bias-corrected histogram estimate
  *    (FixedHistogramJacknifeStateStrategy.calculateEntropy:93-144)
  *
  * Scale shape: the distributed state is bounded — `size` doubles for the
  * reservoirs, `bucketCount` weights for MLE, distinct (bucket, weight)
  * pairs for jackknife — so partial aggregation and the merge tree behave
  * exactly like any built-in sketch at 100 TB. Reservoir eviction draws
  * from ThreadLocalRandom (as the reference does): runs whose group
  * cardinality exceeds `size` are estimates, not replayable values; the
  * oracle gates keep n ≤ size where every strategy is deterministic.
  * Jackknife holdout terms are summed in sorted (bucket, weight) order so
  * repeated runs bit-agree despite hash-map state.
  */
object DiffEntropy {
  final val Vasicek = 0
  final val VasicekWeighted = 1
  final val HistoMle = 2
  final val HistoJacknife = 3

  def methodOf(name: String): Int = name match {
    case "fixed_histogram_mle" => HistoMle
    case "fixed_histogram_jacknife" => HistoJacknife
    case other => throw new IllegalArgumentException(
      s"differential_entropy: unknown method $other " +
        "(expected fixed_histogram_mle or fixed_histogram_jacknife)")
  }

  /** Vasicek 1976 spacing estimator, Noughabi & Arghami 2010 variant —
    * literal transcription of EntropyCalculations
    * .calculateFromSamplesUsingVasicek (bits, NaN on empty). */
  def vasicek(samples0: Array[Double]): Double = {
    if (samples0.isEmpty) return Double.NaN
    val samples = samples0.clone()
    java.util.Arrays.sort(samples)
    val n = samples.length
    val m = math.max(math.round(math.sqrt(n.toDouble)), 2L).toInt
    var entropy = 0d
    var i = 0
    while (i < n) {
      val sIPlusM = if (i + m < n) samples(i + m) else samples(n - 1)
      val sIMinusM = if (i - m > 0) samples(i - m) else samples(0)
      val aI = if (i + m < n && i - m > 0) 2d else 1d
      entropy += math.log(n / (aI * m) * (sIPlusM - sIMinusM))
      i += 1
    }
    entropy / n / math.log(2)
  }

  def xLogX(x: Double): Double = if (x > 0) x * math.log(x) else 0d

  /** max((ln(width·Σw) − Σ(w·ln w)/Σw)/ln 2, 0) — EntropyCalculations
    * .calculateEntropyFromHistogramAggregates (jackknife building block). */
  def histoAggEntropy(width: Double, sumWeight: Double, sumWLW: Double): Double =
    math.max((math.log(width * sumWeight) - sumWLW / sumWeight) / math.log(2.0), 0d)

  def bucketIndex(buckets: Int, min: Double, max: Double, v: Double): Int = {
    if (!(v >= min && v < max)) throw new IllegalArgumentException(
      s"value must be within range: $v [$min, $max]")
    math.min((buckets * (v - min) / (max - min)).toInt, buckets - 1)
  }
}

/** Aggregation buffer: one of three bounded shapes. */
final class DEBuffer(
  val mode: Int,
  val size: Int, // reservoir capacity or bucket count
  val min: Double,
  val max: Double) extends Serializable {
  // reservoirs
  var samples: Array[Double] = _
  var priorities: Array[Double] = _ // weighted reservoir (A-Res keys), min-heap
  var count: Int = 0 // kept samples
  var seen: Long = 0 // unweighted: total rows seen
  // fixed histogram MLE
  var weights: Array[Double] = _
  // jackknife breakdown: (bucket, weight) -> multiplicity
  var breakdown: java.util.TreeMap[(Int, Double), Long] = _

  def init(): DEBuffer = {
    mode match {
      case DiffEntropy.Vasicek => samples = new Array[Double](size)
      case DiffEntropy.VasicekWeighted =>
        samples = new Array[Double](size); priorities = new Array[Double](size)
      case DiffEntropy.HistoMle => weights = new Array[Double](size)
      case DiffEntropy.HistoJacknife =>
        breakdown = new java.util.TreeMap[(Int, Double), Long](
          implicitly[Ordering[(Int, Double)]])
    }
    this
  }
}

case class DifferentialEntropyAgg(
  sample: Expression,
  weight: Option[Expression],
  size: Int,
  mode: Int,
  min: Double = 0d,
  max: Double = 0d,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DEBuffer] {

  if (size <= 0) throw new IllegalArgumentException(
    s"differential_entropy: size must be positive, got $size")
  if (mode >= DiffEntropy.HistoMle) {
    if (size < 2) throw new IllegalArgumentException(
      s"differential_entropy: bucketCount must be at least 2, got $size")
    if (!(min < max)) throw new IllegalArgumentException(
      s"differential_entropy: min must be smaller than max: $min $max")
  }

  override def prettyName: String = "differential_entropy"
  override def children: Seq[Expression] = sample +: weight.toSeq
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric sample/weight")

  private def d(v: Any): Double = v match {
    case x: Double => x
    case x: Float => x.toDouble
    case x: Int => x.toDouble
    case x: Long => x.toDouble
    case x: Short => x.toDouble
    case x: Byte => x.toDouble
    case x: Decimal => x.toDouble
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  override def createAggregationBuffer(): DEBuffer =
    new DEBuffer(mode, size, min, max).init()

  private def rng = java.util.concurrent.ThreadLocalRandom.current()

  private def addUnweighted(b: DEBuffer, x: Double): Unit = {
    b.seen += 1
    if (b.seen <= b.samples.length) {
      b.samples(b.seen.toInt - 1) = x
      b.count = b.seen.toInt
      return
    }
    val idx = rng.nextLong(0, b.seen)
    if (idx < b.samples.length) b.samples(idx.toInt) = x
  }

  /** A-Res: keep the `size` largest priorities u^(1/w) in a min-heap. */
  private def addWeighted(b: DEBuffer, x: Double, pri: Double): Unit = {
    def bubbleUp(): Unit = {
      var i = b.count - 1
      while (i > 0 && b.priorities((i - 1) / 2) > b.priorities(i)) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    }
    def swap(i: Int, j: Int): Unit = {
      val ts = b.samples(i); b.samples(i) = b.samples(j); b.samples(j) = ts
      val tp = b.priorities(i); b.priorities(i) = b.priorities(j); b.priorities(j) = tp
    }
    def bubbleDown(): Unit = {
      var i = 0
      var done = false
      while (!done) {
        var smallest = i
        val l = 2 * i + 1; val r = 2 * i + 2
        if (l < b.count && b.priorities(l) < b.priorities(smallest)) smallest = l
        if (r < b.count && b.priorities(r) < b.priorities(smallest)) smallest = r
        if (smallest == i) done = true
        else { swap(i, smallest); i = smallest }
      }
    }
    if (b.count < b.samples.length) {
      b.samples(b.count) = x
      b.priorities(b.count) = pri
      b.count += 1
      bubbleUp()
    } else if (pri > b.priorities(0)) {
      b.samples(0) = x
      b.priorities(0) = pri
      bubbleDown()
    }
  }

  override def update(b: DEBuffer, input: InternalRow): DEBuffer = {
    val sv = sample.eval(input)
    if (sv == null) return b
    val x = d(sv)
    val wv = weight.map(_.eval(input))
    if (wv.contains(null)) return b
    val w = wv.map(d).getOrElse(1.0)
    if (w < 0) throw new IllegalArgumentException(
      s"Weight $w cannot be negative")
    mode match {
      case DiffEntropy.Vasicek => addUnweighted(b, x)
      case DiffEntropy.VasicekWeighted =>
        addWeighted(b, x, math.pow(rng.nextDouble(), 1.0 / w))
      case DiffEntropy.HistoMle =>
        b.weights(DiffEntropy.bucketIndex(size, min, max, x)) += w
      case DiffEntropy.HistoJacknife =>
        val key = (DiffEntropy.bucketIndex(size, min, max, x), w)
        b.breakdown.merge(key, 1L, (a, c) => a + c)
    }
    b
  }

  override def merge(a: DEBuffer, b: DEBuffer): DEBuffer = mode match {
    case DiffEntropy.Vasicek =>
      // UnweightedDoubleReservoirSample.mergeWith:80-116
      if (b.seen < b.samples.length) {
        var i = 0
        while (i < b.count) { addUnweighted(a, b.samples(i)); i += 1 }
        a
      } else if (a.seen < a.samples.length) {
        val aCount = a.count
        val aSamples = java.util.Arrays.copyOf(a.samples, aCount)
        a.samples = b.samples.clone(); a.seen = b.seen; a.count = b.count
        var i = 0
        while (i < aCount) { addUnweighted(a, aSamples(i)); i += 1 }
        a
      } else {
        shuffle(a.samples); shuffle(b.samples)
        val merged = new Array[Double](a.samples.length)
        var ai = 0; var bi = 0; var i = 0
        while (i < merged.length) {
          if (rng.nextLong(0, a.seen + b.seen) < a.seen) {
            merged(i) = a.samples(ai); ai += 1
          } else {
            merged(i) = b.samples(bi); bi += 1
          }
          i += 1
        }
        a.samples = merged; a.seen += b.seen
        a
      }
    case DiffEntropy.VasicekWeighted =>
      var i = 0
      while (i < b.count) { addWeighted(a, b.samples(i), b.priorities(i)); i += 1 }
      a
    case DiffEntropy.HistoMle =>
      var i = 0
      while (i < size) { a.weights(i) += b.weights(i); i += 1 }
      a
    case DiffEntropy.HistoJacknife =>
      b.breakdown.forEach((k, v) => a.breakdown.merge(k, v, (x, y) => x + y))
      a
  }

  private def shuffle(arr: Array[Double]): Unit = {
    var i = arr.length - 1
    while (i > 0) {
      val j = rng.nextInt(i + 1)
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i -= 1
    }
  }

  override def eval(b: DEBuffer): Any = mode match {
    case DiffEntropy.Vasicek | DiffEntropy.VasicekWeighted =>
      if (b.count == 0) null
      else DiffEntropy.vasicek(java.util.Arrays.copyOf(b.samples, b.count))
    case DiffEntropy.HistoMle =>
      var sum = 0d
      var i = 0
      while (i < size) { sum += b.weights(i); i += 1 }
      if (sum == 0d) null
      else {
        var raw = 0d
        i = 0
        while (i < size) { raw -= DiffEntropy.xLogX(b.weights(i) / sum); i += 1 }
        (raw + math.log((max - min) / size)) / math.log(2)
      }
    case DiffEntropy.HistoJacknife =>
      if (b.breakdown.isEmpty) null
      else {
        val width = (max - min) / size
        val bucketW = new Array[Double](size)
        var n = 0L
        b.breakdown.forEach { (k, c) => bucketW(k._1) += c * k._2; n += c }
        var sumW = 0d
        var sumWLW = 0d
        var i = 0
        while (i < size) {
          sumW += bucketW(i)
          sumWLW += (if (bucketW(i) == 0d) 0d else bucketW(i) * math.log(bucketW(i)))
          i += 1
        }
        if (sumW == 0d) null
        else {
          var entropy = n * DiffEntropy.histoAggEntropy(width, sumW, sumWLW)
          b.breakdown.forEach { (k, c) =>
            val bw = bucketW(k._1)
            if (bw > 0d) {
              val holdoutBw = math.max(bw - k._2, 0d)
              val holdoutSumW = sumW - bw + holdoutBw
              val holdoutSumWLW =
                sumWLW - DiffEntropy.xLogX(bw) + DiffEntropy.xLogX(holdoutBw)
              entropy -= c * (n - 1) *
                DiffEntropy.histoAggEntropy(width, holdoutSumW, holdoutSumWLW) / n
            }
          }
          entropy
        }
      }
  }

  override def serialize(b: DEBuffer): Array[Byte] = mode match {
    case DiffEntropy.Vasicek =>
      val bb = ByteBuffer.allocate(12 + 8 * b.count)
      bb.putLong(b.seen).putInt(b.count)
      var i = 0
      while (i < b.count) { bb.putDouble(b.samples(i)); i += 1 }
      bb.array()
    case DiffEntropy.VasicekWeighted =>
      val bb = ByteBuffer.allocate(4 + 16 * b.count)
      bb.putInt(b.count)
      var i = 0
      while (i < b.count) {
        bb.putDouble(b.samples(i)); bb.putDouble(b.priorities(i)); i += 1
      }
      bb.array()
    case DiffEntropy.HistoMle =>
      val bb = ByteBuffer.allocate(8 * size)
      var i = 0
      while (i < size) { bb.putDouble(b.weights(i)); i += 1 }
      bb.array()
    case DiffEntropy.HistoJacknife =>
      val bb = ByteBuffer.allocate(4 + 20 * b.breakdown.size())
      bb.putInt(b.breakdown.size())
      b.breakdown.forEach { (k, c) =>
        bb.putInt(k._1); bb.putDouble(k._2); bb.putLong(c)
      }
      bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DEBuffer = {
    val b = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    mode match {
      case DiffEntropy.Vasicek =>
        b.seen = bb.getLong; b.count = bb.getInt
        var i = 0
        while (i < b.count) { b.samples(i) = bb.getDouble; i += 1 }
      case DiffEntropy.VasicekWeighted =>
        b.count = bb.getInt
        var i = 0
        while (i < b.count) {
          b.samples(i) = bb.getDouble; b.priorities(i) = bb.getDouble; i += 1
        }
      case DiffEntropy.HistoMle =>
        var i = 0
        while (i < size) { b.weights(i) = bb.getDouble; i += 1 }
      case DiffEntropy.HistoJacknife =>
        val n = bb.getInt
        var i = 0
        while (i < n) {
          val k = (bb.getInt, bb.getDouble)
          b.breakdown.put(k, bb.getLong)
          i += 1
        }
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): DifferentialEntropyAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DifferentialEntropyAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    if (weight.isDefined) copy(sample = newChildren(0), weight = Some(newChildren(1)))
    else copy(sample = newChildren.head)
}
