package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog sketches with first-class mergeable binary state — the
  * reference's approx_set / merge / cardinality surface
  * (ApproximateSetAggregation.java, MergeHyperLogLogAggregation.java,
  * HyperLogLogFunctions.java) where the sketch is a VALUE that can be
  * stored in a table and merged across queries, not just an internal
  * accumulator like Spark's approx_count_distinct.
  *
  * Layout: byte 0 = precision p, bytes 1..2^p = registers. Register merge is
  * elementwise max — associative + commutative, so partial aggregation
  * across 1000 executors and cross-query merges are exact (the estimate's
  * error comes only from the sketch itself, never from the merge tree).
  * Hashing is Spark's XXH64 (the same kernel xxhash64() exposes).
  */
object Hll {
  val DefaultP = 12 // 4096 registers → ~1.6% relative error
  val Seed = 42L

  def emptyBuffer(p: Int): Array[Byte] = {
    val b = new Array[Byte](1 + (1 << p))
    b(0) = p.toByte
    b
  }

  def hash(bytes: Array[Byte]): Long =
    XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, Seed)

  def add(buf: Array[Byte], h: Long): Unit = {
    val p = buf(0).toInt
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rank, 64 - p + 1)
    if (r > buf(1 + idx)) buf(1 + idx) = r.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a(0) == b(0), s"cannot merge HLL sketches of precision ${a(0)} and ${b(0)}")
    var i = 1
    while (i < a.length) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  /** Standard HLL estimator with linear-counting small-range correction.
    * Accepts tagged or raw register arrays (SketchTag.payload strips). */
  def cardinality(bufIn: Array[Byte]): Long = {
    val buf = SketchTag.payload(bufIn)
    val p = buf(0).toInt
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf(1 + i).toInt
      sum += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val est =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.rint(est).toLong
  }
}

/** approx_set(x[, p]) → varbinary HLL sketch (TypedImperativeAggregate:
  * partial buffers live unserialized per partition, serialize only at
  * shuffle — the PARTIAL/FINAL split Presto's AccumulatorCompiler builds is
  * exactly what Spark derives from this class). */
case class HllSketchAgg(
  child: Expression,
  precision: Int = Hll.DefaultP,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "approx_set"

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyBuffer(precision)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v match {
        case s: UTF8String => s.getBytes
        case l: Long => java.nio.ByteBuffer.allocate(8).putLong(l).array()
        case i: Int => java.nio.ByteBuffer.allocate(8).putLong(i.toLong).array()
        case d: Double =>
          java.nio.ByteBuffer.allocate(8).putLong(
            java.lang.Double.doubleToLongBits(d)).array()
        case b: Array[Byte] => b
        case other => UTF8String.fromString(other.toString).getBytes
      }
      Hll.add(buf, Hll.hash(bytes))
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  override def eval(buf: Array[Byte]): Any = SketchTag.wrap(SketchTag.Hll, buf)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** merge(hll) → hll — re-aggregates stored sketches (the cross-query merge
  * path: MergeHyperLogLogAggregation.java). */
case class HllMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_hll"

  // empty marker until the first sketch arrives (precision unknown up front)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = SketchTag.payload(v.asInstanceOf[Array[Byte]])
      if (buf.isEmpty) sk.clone()
      else Hll.merge(buf, sk)
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else Hll.merge(a, b)
  override def eval(buf: Array[Byte]): Any =
    if (buf.isEmpty) null else SketchTag.wrap(SketchTag.Hll, buf)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** cardinality(hll) → bigint (HyperLogLogFunctions.java cardinality). */
case class HllCardinality(child: Expression)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_cardinality requires a varbinary sketch, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_cardinality"
  override protected def nullSafeEval(v: Any): Any =
    Hll.cardinality(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hll.cardinality($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
