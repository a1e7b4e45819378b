package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SFM ("Sketch-Flip-Merge") differentially-private distinct-count sketch
  * (reference: MAIN/operator/aggregation/noisyaggregation/sketch/SfmSketch
  * .java:51-443, after Hehir/Ting/Cormode, arXiv:2302.02056):
  *
  *  - an FM85-style bitmap of `buckets × precision` bits; each value sets
  *    bit (bucket(hash), min(precision-1, trailingZeros(hash)))
  *    (addHash :119-126)
  *  - privacy = flip every bit with probability 1/(e^ε + 1) ONCE at
  *    finalization (enablePrivacy :170-185); ε = ∞ flips nothing and the
  *    sketch is a deterministic bitmap
  *  - cardinality = Newton's method on the randomized-response
  *    pseudolikelihood (:144-157, :268-312) — works for private AND
  *    non-private bitmaps
  *  - merge of non-private sketches is bitwise OR; merging private ones
  *    draws each output bit from the Theorem-4.8 coupling (:343-384)
  *
  * Distributed shape: partial states stay non-private (cheap OR merges up
  * the agg tree), the ε-flip happens once in the final eval — one noise
  * draw per group, exactly the reference's combine/output split, so the
  * privacy budget is not re-spent per partition and a 1000-executor run
  * is as private as a single-node one.
  *
  * Deviation from the reference, by design: values are hashed with the
  * engine-wide XXH64 kernel (same as our HLL/SetDigest and Spark's
  * xxhash64()) instead of airlift Murmur3Hash128.hash64 — sketch payloads
  * are engine-specific either way; estimates carry the same guarantees.
  */
final class Sfm(
  val indexBitLength: Int,
  val precision: Int,
  var randomizedResponseProbability: Double,
  val words: Array[Long]) extends Serializable {

  def buckets: Int = 1 << indexBitLength
  def bits: Int = buckets * precision

  def getBit(i: Int): Boolean = (words(i >> 6) & (1L << (i & 63))) != 0
  def setBit(i: Int, v: Boolean): Unit =
    if (v) words(i >> 6) |= (1L << (i & 63))
    else words(i >> 6) &= ~(1L << (i & 63))

  private def bitLocation(bucket: Int, level: Int): Int = level * buckets + bucket

  def isPrivacyEnabled: Boolean = randomizedResponseProbability > 0

  def addHash(hash: Long): Unit = {
    require(!isPrivacyEnabled, "privacy-enabled SfmSketch is immutable")
    val index = (hash >>> (64 - indexBitLength)).toInt
    val zeros = math.min(precision - 1,
      java.lang.Long.numberOfTrailingZeros(hash | (1L << (64 - indexBitLength))))
    setBit(bitLocation(index, zeros), true)
  }

  /** Flip every bit with probability 1/(e^ε + 1) — Lemma 4.7. ε=∞ → no-op. */
  def enablePrivacy(epsilon: Double, rng: java.util.Random): Unit = {
    require(!isPrivacyEnabled, "sketch is already privacy-enabled")
    require(epsilon > 0, "epsilon must be positive")
    val p = if (epsilon.isPosInfinity) 0d else 1.0 / (math.exp(epsilon) + 1)
    randomizedResponseProbability = p
    if (p > 0) {
      var i = 0
      while (i < bits) {
        if (rng.nextDouble() < p) setBit(i, !getBit(i))
        i += 1
      }
    }
  }

  private def onProbability: Double = 1 - randomizedResponseProbability

  private def observationProbability(level: Int): Double =
    math.pow(2.0, -(level + 1)) / buckets

  private def llTerm1(level: Int, on: Boolean, n: Double): Double = {
    val p = observationProbability(level)
    val sign = if (on) -1 else 1
    val c1 = if (on) onProbability else 1 - onProbability
    val c2 = onProbability - randomizedResponseProbability
    math.log1p(-p) * (1 - c1 / (c1 + sign * c2 * math.pow(1 - p, n)))
  }

  private def llTerm2(level: Int, on: Boolean, n: Double): Double = {
    val p = observationProbability(level)
    val sign = if (on) -1 else 1
    val c1 = if (on) onProbability else 1 - onProbability
    val c2 = onProbability - randomizedResponseProbability
    sign * c1 * c2 * math.pow(math.log1p(-p), 2) * math.pow(1 - p, n) *
      math.pow(c1 + sign * c2 * math.pow(1 - p, n), -2)
  }

  private def llDerivative(n: Double, second: Boolean): Double = {
    var result = 0d
    var level = 0
    while (level < precision) {
      val termOn = if (second) llTerm2(level, on = true, n) else llTerm1(level, on = true, n)
      val termOff = if (second) llTerm2(level, on = false, n) else llTerm1(level, on = false, n)
      var bucket = 0
      while (bucket < buckets) {
        result += (if (getBit(bitLocation(bucket, level))) termOn else termOff)
        bucket += 1
      }
      level += 1
    }
    result
  }

  /** Maximum-pseudolikelihood estimate via Newton's method (:144-157). */
  def cardinality(): Long = {
    var guess = 1d
    var change = Double.PositiveInfinity
    var iterations = 0
    while (math.abs(change) > 0.1 && iterations < 1000) {
      change = -llDerivative(guess, second = false) / llDerivative(guess, second = true)
      guess += change
      iterations += 1
    }
    math.max(0L, math.round(guess))
  }

  /** Theorem-4.8 merged flip probability. */
  private def mergeProb(p1: Double, p2: Double): Double =
    (p1 + p2 - 3 * p1 * p2) / (1 - 2 * p1 * p2)

  def mergeWith(other: Sfm, rng: java.util.Random): Unit = {
    require(precision == other.precision && indexBitLength == other.indexBitLength,
      s"cannot merge SFM sketches with different shape: " +
        s"($buckets,$precision) vs (${other.buckets},${other.precision})")
    if (!isPrivacyEnabled && !other.isPrivacyEnabled) {
      var w = 0
      while (w < words.length) { words(w) |= other.words(w); w += 1 }
    } else {
      val p1 = randomizedResponseProbability
      val p2 = other.randomizedResponseProbability
      val p = mergeProb(p1, p2)
      val normalizer = (1 - 2 * p) / ((1 - 2 * p1) * (1 - 2 * p2))
      var i = 0
      while (i < bits) {
        val bit1 = if (getBit(i)) 1d else 0d
        val bit2 = if (other.getBit(i)) 1d else 0d
        val x = 1 - 2 * p - normalizer * (1 - p1 - bit1) * (1 - p2 - bit2)
        val probability = math.min(1.0, math.max(0.0, p + normalizer * x))
        setBit(i, rng.nextDouble() < probability)
        i += 1
      }
    }
    randomizedResponseProbability =
      mergeProb(randomizedResponseProbability, other.randomizedResponseProbability)
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 4 + 8 + 4 + words.length * 8)
    bb.put(7.toByte) // FORMAT_TAG (SfmSketch.java:55)
    bb.putInt(indexBitLength).putInt(precision)
    bb.putDouble(randomizedResponseProbability)
    bb.putInt(words.length * 8)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object Sfm {
  val DefaultBuckets = 4096 // SfmSketchAggregationUtils.java:31
  val DefaultPrecision = 24 // :32

  def create(buckets: Int, precision: Int): Sfm = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"numberOfBuckets must be a power of 2, actual: $buckets")
    require(precision >= 1 && precision <= 64,
      s"precision must be between 1 and 64, actual: $precision")
    val indexBitLength = java.lang.Integer.numberOfTrailingZeros(buckets)
    new Sfm(indexBitLength, precision, 0d,
      new Array[Long]((buckets * precision + 63) / 64))
  }

  def deserialize(bytesIn: Array[Byte]): Sfm = {
    val bb = ByteBuffer.wrap(SketchTag.payload(bytesIn))
    val tag = bb.get()
    require(tag == 7, s"unexpected SFM sketch format tag $tag")
    val indexBitLength = bb.getInt
    val precision = bb.getInt
    val prob = bb.getDouble
    val byteLen = bb.getInt
    val words = new Array[Long](byteLen / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    new Sfm(indexBitLength, precision, prob, words)
  }

  /** Same value→bytes→XXH64 kernel as the HLL sketch (Sketches.scala). */
  def hashOf(v: Any): Long = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case l: Long => ByteBuffer.allocate(8).putLong(l).array()
      case i: Int => ByteBuffer.allocate(8).putLong(i.toLong).array()
      case d: Double =>
        ByteBuffer.allocate(8).putLong(java.lang.Double.doubleToLongBits(d)).array()
      case b: Array[Byte] => b
      case other => UTF8String.fromString(other.toString).getBytes
    }
    Hll.hash(bytes)
  }
}

/** SQL arity dispatch: (x, epsilon[, buckets[, precision]]). */
object SfmBuilders {
  def foldNumPub(e: Expression, what: String): Double = foldNum(e, what)
  private def foldNum(e: Expression, what: String): Double = {
    val v = if (e.foldable) e.eval(null) else null
    v match {
      case n: Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case _ => throw new IllegalArgumentException(
        s"sfm: $what must be a foldable numeric literal, got ${e.sql}")
    }
  }
  def agg(distinct: Boolean)(es: Seq[Expression]): Expression = {
    if (es.length < 2 || es.length > 4) throw new IllegalArgumentException(
      s"sfm aggregate takes 2-4 arguments (x, epsilon[, buckets[, precision]]), got ${es.length}")
    val eps = foldNum(es(1), "epsilon")
    val buckets = if (es.length >= 3) foldNum(es(2), "buckets").toInt else Sfm.DefaultBuckets
    val precision = if (es.length == 4) foldNum(es(3), "precision").toInt else Sfm.DefaultPrecision
    val agg = if (distinct) SfmDistinctAgg(es.head, eps, buckets, precision)
    else SfmAgg(es.head, eps, buckets, precision)
    agg.toAggregateExpression()
  }
}

sealed trait SfmAggBase extends TypedImperativeAggregate[Option[Sfm]] {
  def child: Expression
  def epsilon: Double
  def buckets: Int
  def precision: Int

  if (!(epsilon > 0)) throw new IllegalArgumentException("epsilon must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def createAggregationBuffer(): Option[Sfm] = None

  override def update(buf: Option[Sfm], input: InternalRow): Option[Sfm] = {
    val v = child.eval(input)
    if (v == null) return buf
    val s = buf.getOrElse(Sfm.create(buckets, precision))
    s.addHash(Sfm.hashOf(v))
    Some(s)
  }

  override def merge(a: Option[Sfm], b: Option[Sfm]): Option[Sfm] = (a, b) match {
    case (Some(x), Some(y)) =>
      x.mergeWith(y, java.util.concurrent.ThreadLocalRandom.current()); Some(x)
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }

  override def serialize(buf: Option[Sfm]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[Sfm] =
    if (bytes.isEmpty) None else Some(Sfm.deserialize(bytes))

  /** ε-flip once, at finalization (SfmSketchAggregationUtils.java:130-151). */
  protected def finalSketch(buf: Option[Sfm]): Option[Sfm] = buf.map { s =>
    s.enablePrivacy(epsilon, new java.security.SecureRandom())
    s
  }
}

/** noisy_approx_set_sfm(x, epsilon[, buckets[, precision]]) → sketch. */
case class SfmAgg(
  child: Expression,
  epsilon: Double,
  buckets: Int = Sfm.DefaultBuckets,
  precision: Int = Sfm.DefaultPrecision,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0) extends SfmAggBase {
  override def prettyName: String = "noisy_approx_set_sfm"
  override def dataType: DataType = BinaryType
  override def eval(buf: Option[Sfm]): Any =
    finalSketch(buf).map(s => SketchTag.wrap(SketchTag.Sfm, s.serialize())).orNull
  override def withNewMutableAggBufferOffset(o: Int): SfmAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SfmAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** noisy_approx_distinct_sfm(x, epsilon[, buckets[, precision]]) → bigint. */
case class SfmDistinctAgg(
  child: Expression,
  epsilon: Double,
  buckets: Int = Sfm.DefaultBuckets,
  precision: Int = Sfm.DefaultPrecision,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0) extends SfmAggBase {
  override def prettyName: String = "noisy_approx_distinct_sfm"
  override def dataType: DataType = LongType
  override def eval(buf: Option[Sfm]): Any =
    finalSketch(buf).map(s => java.lang.Long.valueOf(s.cardinality())).orNull
  override def withNewMutableAggBufferOffset(o: Int): SfmDistinctAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SfmDistinctAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** merge_sfm(sketch) aggregate — union of already-built sketches
  * (SfmSketchMergeAggregation.java). Inputs may already be private; the
  * randomized merge handles every combination and no additional ε is
  * spent here. */
case class SfmMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[Option[Sfm]] {
  override def prettyName: String = "merge_sfm"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge_sfm requires a varbinary sketch, got ${other.simpleString}")
  }
  override def createAggregationBuffer(): Option[Sfm] = None
  override def update(buf: Option[Sfm], input: InternalRow): Option[Sfm] = {
    val v = child.eval(input)
    if (v == null) return buf
    val incoming = Sfm.deserialize(v.asInstanceOf[Array[Byte]])
    buf match {
      case Some(s) =>
        s.mergeWith(incoming, java.util.concurrent.ThreadLocalRandom.current())
        Some(s)
      case None => Some(incoming)
    }
  }
  override def merge(a: Option[Sfm], b: Option[Sfm]): Option[Sfm] = (a, b) match {
    case (Some(x), Some(y)) =>
      x.mergeWith(y, java.util.concurrent.ThreadLocalRandom.current()); Some(x)
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }
  override def serialize(buf: Option[Sfm]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[Sfm] =
    if (bytes.isEmpty) None else Some(Sfm.deserialize(bytes))
  override def eval(buf: Option[Sfm]): Any =
    buf.map(s => SketchTag.wrap(SketchTag.Sfm, s.serialize())).orNull
  override def withNewMutableAggBufferOffset(o: Int): SfmMergeAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SfmMergeAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** noisy_approx_set_sfm_from_index_and_zeros(index, zeros, epsilon,
  * buckets[, precision]) — build a sketch from pre-hashed (bucket index,
  * trailing-zero count) pairs (NoisyApproximateSetSfmFromIndexAndZeros
  * Aggregation.java; kernel addIndexAndZeros SfmSketch.java:128-139). The
  * path for re-aggregating externally-hashed data where the raw values
  * are gone. */
case class SfmFromIndexZerosAgg(
  index: Expression,
  zeros: Expression,
  epsilon: Double,
  buckets: Int = Sfm.DefaultBuckets,
  precision: Int = Sfm.DefaultPrecision,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0) extends TypedImperativeAggregate[Option[Sfm]] {

  if (!(epsilon > 0)) throw new IllegalArgumentException("epsilon must be positive")

  override def prettyName: String = "noisy_approx_set_sfm_from_index_and_zeros"
  override def children: Seq[Expression] = Seq(index, zeros)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => Seq[DataType](LongType, IntegerType, ShortType, ByteType)
      .contains(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral index and zeros")

  override def createAggregationBuffer(): Option[Sfm] = None

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def update(buf: Option[Sfm], input: InternalRow): Option[Sfm] = {
    val iv = index.eval(input)
    val zv = zeros.eval(input)
    if (iv == null || zv == null) return buf
    val idx = asLong(iv)
    val z = asLong(zv)
    if (idx < 0 || idx >= buckets) throw new IllegalArgumentException(
      s"index $idx must be between zero (inclusive) and the number of buckets-1 ${buckets - 1}")
    if (z < 0 || z > 64) throw new IllegalArgumentException(
      s"zeros $z must be between 0 and 64")
    val s = buf.getOrElse(Sfm.create(buckets, precision))
    s.setBit(math.min(precision - 1, z.toInt) * s.buckets + idx.toInt, v = true)
    Some(s)
  }

  override def merge(a: Option[Sfm], b: Option[Sfm]): Option[Sfm] = (a, b) match {
    case (Some(x), Some(y)) =>
      x.mergeWith(y, java.util.concurrent.ThreadLocalRandom.current()); Some(x)
    case (Some(x), None) => Some(x)
    case (None, y) => y
  }
  override def serialize(buf: Option[Sfm]): Array[Byte] =
    buf.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[Sfm] =
    if (bytes.isEmpty) None else Some(Sfm.deserialize(bytes))
  override def eval(buf: Option[Sfm]): Any = buf.map { s =>
    s.enablePrivacy(epsilon, new java.security.SecureRandom())
    SketchTag.wrap(SketchTag.Sfm, s.serialize())
  }.orNull
  override def withNewMutableAggBufferOffset(o: Int): SfmFromIndexZerosAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SfmFromIndexZerosAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    c: IndexedSeq[Expression]): Expression =
    copy(index = c(0), zeros = c(1))
}

/** noisy_empty_approx_set_sfm(epsilon[, buckets[, precision]]) → an empty
  * privacy-enabled sketch (SfmSketchFunctions.java:70-92). Nondeterministic
  * for finite ε (fresh randomized-response draw per call), deterministic
  * all-zeros at ε=∞. */
case class SfmEmptySketch(epsilon: Double, buckets: Int, precision: Int)
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  if (!(epsilon > 0)) throw new IllegalArgumentException("epsilon must be positive")
  override def prettyName: String = "noisy_empty_approx_set_sfm"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override lazy val deterministic: Boolean = epsilon.isPosInfinity
  override def eval(input: InternalRow): Any = {
    val s = Sfm.create(buckets, precision)
    s.enablePrivacy(epsilon, new java.security.SecureRandom())
    SketchTag.wrap(SketchTag.Sfm, s.serialize())
  }
}

/** merge_sfm(array<sketch>) → sketch — the scalar array-merge variant
  * (SfmSketchFunctions.java:39-63); null elements are skipped, an empty or
  * all-null array yields NULL. */
case class SfmScalarMerge(child: Expression) extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "merge_sfm"
  override def dataType: DataType = BinaryType
  // empty/all-null array → NULL even when child (e.g. CreateArray) is
  // non-nullable; without this, codegen would emit isNull=false
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(BinaryType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"merge_sfm requires array<varbinary>, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var acc: Sfm = null
    val rng = java.util.concurrent.ThreadLocalRandom.current()
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = Sfm.deserialize(arr.getBinary(i))
        if (acc == null) acc = s else acc.mergeWith(s, rng)
      }
      i += 1
    }
    if (acc == null) null else SketchTag.wrap(SketchTag.Sfm, acc.serialize())
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** sfm_cardinality(sketch) → bigint (reference scalar `cardinality` over
  * the SfmSketch type, SfmSketchFunctions.java:31-37; renamed here because
  * Spark's `cardinality` is the collection-size builtin). */
case class SfmCardinality(child: Expression) extends UnaryExpression {
  override def prettyName: String = "sfm_cardinality"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sfm_cardinality requires a varbinary sketch, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any =
    Sfm.deserialize(v.asInstanceOf[Array[Byte]]).cardinality()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Sfm.deserialize($c).cardinality()")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
