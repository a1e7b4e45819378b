package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's RESUMABLE reservoir_sample aggregate
  * (MAIN/operator/aggregation/reservoirsample/ReservoirSampleFunction.java:
  * `reservoir_sample(initial_sample array(T), initial_processed_count
  * bigint, value T, desired_sample_size int)` →
  * `row(processed_count bigint, sample array(T))`).
  *
  * Semantics replicated from ReservoirSample.java:
  *  - per-row Vitter update: first k rows fill the reservoir, row n>k
  *    replaces a random slot with probability k/n (`add`, :178-195);
  *  - partial-buffer merge proportional to processed counts: both
  *    reservoirs shuffled, each output slot drawn from side A with
  *    probability processedA/(processedA+processedB) (`merge` +
  *    `mergeBlockSamples`, :215-244 / :108-121) — the property that makes
  *    a 1000-executor merge tree distribution-identical to a single scan;
  *  - the initial (resume) state is NOT counted during accumulation; the
  *    output step seeds a reservoir with it and weight-merges the
  *    newly-built sample into it (`output`, ReservoirSampleFunction.java:
  *    96-119), so processed_count = initial + new;
  *  - contract checks: initial sample must be empty when initial count
  *    <= 0; a resumed sample must either be full (size k) or carry
  *    initial_count == its own size (the not-yet-full resume case).
  *
  * An optional 5th literal argument seeds the RNG (the reference uses
  * ThreadLocalRandom; a seed makes single-partition tests reproducible —
  * same convention as the engine's seeded Sample operator).
  */
object Reservoir {
  /** Mutable reservoir state; initCount = -1 until a resume state is
    * captured (mirrors ReservoirSample.initialProcessedCount). */
  final class Res(
    val k: Int,
    var processed: Long,
    var items: ArrayBuffer[Any],
    var initSample: Array[Any],
    var initCount: Long,
    val rng: java.util.Random)

  def empty(k: Int, seed: Option[Long]): Res =
    new Res(k, 0L, new ArrayBuffer[Any](math.min(k, 1 << 12)), null, -1L,
      seed.map(new java.util.Random(_))
        .getOrElse(new java.util.Random()))

  def add(r: Res, v: Any): Unit = {
    r.processed += 1
    if (r.processed <= r.k) r.items += v
    else {
      val idx = nextLong(r.rng, r.processed)
      if (idx < r.items.length) r.items(idx.toInt) = v
    }
  }

  /** uniform long in [0, bound) — ThreadLocalRandom.nextLong(0, bound). */
  private def nextLong(rng: java.util.Random, bound: Long): Long = {
    var bits = 0L; var v = 0L
    do { bits = rng.nextLong() >>> 1; v = bits % bound }
    while (bits - v + (bound - 1) < 0)
    v
  }

  private def shuffle(rng: java.util.Random, a: ArrayBuffer[Any]): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = rng.nextInt(i + 1)
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
  }

  /** ReservoirSample.merge: small sides stream element-wise, two full
    * reservoirs combine proportionally to their processed counts. */
  def merge(a: Res, b: Res): Res = {
    if (b.processed < b.k) {
      var i = 0
      while (i < b.items.length) { add(a, b.items(i)); i += 1 }
      captureInit(a, b.initSample, b.initCount)
      return a
    }
    if (a.processed < a.k) {
      val keep = a.items
      val kept = a.processed
      a.items = b.items
      a.processed = b.processed
      var i = 0
      while (i < kept) { add(a, keep(i)); i += 1 }
      captureInit(a, b.initSample, b.initCount)
      return a
    }
    require(a.k == b.k, s"maximum number of samples ${a.k} must be equal to that of other ${b.k}")
    shuffle(a.rng, a.items)
    shuffle(a.rng, b.items)
    val merged = new ArrayBuffer[Any](a.items.length)
    var ia = 0; var ib = 0; var i = 0
    while (i < a.items.length) {
      if (nextLong(a.rng, a.processed + b.processed) < a.processed) {
        merged += a.items(ia); ia += 1
      } else {
        merged += b.items(ib); ib += 1
      }
      i += 1
    }
    a.items = merged
    a.processed += b.processed
    captureInit(a, b.initSample, b.initCount)
    a
  }

  /** initializeInitialSample: first capture wins, later ones ignored. */
  def captureInit(r: Res, sample: Array[Any], count: Long): Unit =
    if (r.initCount < 0 && count >= 0) {
      if (sample != null && sample.length > 0)
        require(count >= sample.length,
          "initialProcessedCount must be greater than or equal to the " +
            "number of positions in the initial sample")
      r.initSample = sample
      r.initCount = count
    }
}

case class ReservoirSampleAgg(
  initialSample: Expression,
  initialCount: Expression,
  child: Expression,
  k: Int,
  seed: Option[Long] = None,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Reservoir.Res] {

  require(k > 0, "desired sample size must be > 0")

  override def children: Seq[Expression] = Seq(initialSample, initialCount, child)
  override def nullable: Boolean = false
  override def prettyName: String = "reservoir_sample"
  override def dataType: DataType = StructType(Seq(
    StructField("processed_count", LongType, nullable = false),
    StructField("sample", ArrayType(child.dataType, containsNull = true))))

  override def checkInputDataTypes(): TypeCheckResult = {
    val okInit = initialSample.dataType match {
      case ArrayType(et, _) => DataType.equalsStructurally(et, child.dataType, true)
      case NullType => true
      case _ => false
    }
    if (!okInit) TypeCheckResult.TypeCheckFailure(
      "reservoir_sample initial sample must be an array of the value type, " +
        s"got ${initialSample.dataType.simpleString} vs ${child.dataType.simpleString}")
    else if (!initialCount.dataType.isInstanceOf[LongType] &&
      !initialCount.dataType.isInstanceOf[IntegerType])
      TypeCheckResult.TypeCheckFailure(
        s"reservoir_sample initial count must be bigint, got ${initialCount.dataType.simpleString}")
    else child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | DoubleType |
           FloatType | StringType | BooleanType | DateType | TimestampType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"reservoir_sample does not support ${other.simpleString} values")
    }
  }

  override def createAggregationBuffer(): Reservoir.Res = Reservoir.empty(k, seed)

  override def update(buf: Reservoir.Res, input: InternalRow): Reservoir.Res = {
    if (buf.initCount < 0) {
      val cnt = initialCount.eval(input)
      if (cnt != null) {
        val c = cnt match { case l: Long => l; case i: Int => i.toLong }
        val arr = initialSample.eval(input) match {
          case null => null
          // copy string elements: unsafe arrays may alias a reused buffer
          case a: ArrayData => a.toObjectArray(childElementType).map(copyValue)
        }
        if (c <= 0)
          require(arr == null || arr.isEmpty,
            "initial state array must be null or empty when initial processed count is <= 0")
        Reservoir.captureInit(buf, arr, c)
      }
    }
    Reservoir.add(buf, copyValue(child.eval(input)))
    buf
  }

  private def childElementType: DataType = child.dataType

  private def copyValue(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case other => other
  }

  override def merge(a: Reservoir.Res, b: Reservoir.Res): Reservoir.Res =
    Reservoir.merge(a, b)

  override def eval(buf: Reservoir.Res): Any = {
    val initLen = if (buf.initSample == null) 0 else buf.initSample.length
    // ReservoirSampleFunction.output contract: a resumed sample is either
    // full (k elements) or still filling with initCount == its own length
    require(!(buf.initCount != -1 && buf.initCount != initLen) || k == initLen,
      "when a positive initial_processed_count is provided the size of " +
        "the initial sample must be equal to desired_sample_size parameter")
    val base = Reservoir.empty(k, seed.map(_ + 1))
    if (initLen > 0) {
      base.items ++= buf.initSample
      base.processed = math.max(buf.initCount, 0L)
    } else base.processed = math.max(buf.initCount, 0L)
    val merged = Reservoir.merge(base, buf)
    InternalRow(merged.processed,
      new GenericArrayData(merged.items.toArray))
  }

  // ---- shuffle codec: dataType-directed, same style as MostFrequentAgg ----
  private def writeValue(out: DataOutputStream, v: Any): Unit = {
    if (v == null) { out.writeBoolean(true); return }
    out.writeBoolean(false)
    child.dataType match {
      case LongType => out.writeLong(v.asInstanceOf[Long])
      case IntegerType | DateType => out.writeInt(v.asInstanceOf[Int])
      case ShortType => out.writeShort(v.asInstanceOf[Short].toInt)
      case ByteType => out.writeByte(v.asInstanceOf[Byte].toInt)
      case DoubleType => out.writeDouble(v.asInstanceOf[Double])
      case FloatType => out.writeFloat(v.asInstanceOf[Float])
      case BooleanType => out.writeBoolean(v.asInstanceOf[Boolean])
      case TimestampType => out.writeLong(v.asInstanceOf[Long])
      case StringType =>
        val b = v.asInstanceOf[UTF8String].getBytes
        out.writeInt(b.length); out.write(b)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  private def readValue(in: DataInputStream): Any = {
    if (in.readBoolean()) return null
    child.dataType match {
      case LongType => in.readLong()
      case IntegerType | DateType => in.readInt()
      case ShortType => in.readShort()
      case ByteType => in.readByte()
      case DoubleType => in.readDouble()
      case FloatType => in.readFloat()
      case BooleanType => in.readBoolean()
      case TimestampType => in.readLong()
      case StringType =>
        val b = new Array[Byte](in.readInt()); in.readFully(b)
        UTF8String.fromBytes(b)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
  }

  override def serialize(buf: Reservoir.Res): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.processed)
    out.writeInt(buf.items.length)
    buf.items.foreach(writeValue(out, _))
    out.writeLong(buf.initCount)
    if (buf.initSample == null) out.writeInt(-1)
    else {
      out.writeInt(buf.initSample.length)
      buf.initSample.foreach(writeValue(out, _))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Reservoir.Res = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val r = Reservoir.empty(k, seed.map(_ + 2))
    r.processed = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { r.items += readValue(in); i += 1 }
    r.initCount = in.readLong()
    val m = in.readInt()
    if (m >= 0) {
      val arr = new Array[Any](m)
      i = 0
      while (i < m) { arr(i) = readValue(in); i += 1 }
      r.initSample = arr
    }
    r
  }

  override def withNewMutableAggBufferOffset(o: Int): ReservoirSampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ReservoirSampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(initialSample = newChildren(0), initialCount = newChildren(1),
      child = newChildren(2))
}
