package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash set digest — the reference's setdigest type family
  * (type/setdigest/SetDigest.java:50, SetDigestFunctions.java:38-81:
  * make_set_digest, merge, cardinality, intersection_cardinality,
  * jaccard_index), re-expressed as a k-minimum-values sketch (Broder's
  * single-hash MinHash variant, which is what the reference cites too).
  *
  * State: the k smallest (unsigned) 64-bit hashes of the distinct inputs,
  * kept sorted. That one structure answers all three questions:
  *  - cardinality: KMV estimator (k-1)/u_k where u_k = kth-min / 2^64;
  *  - jaccard(A,B): of the k smallest hashes of A∪B, the fraction present
  *    in both A and B (unbiased MinHash estimate);
  *  - intersection ≈ jaccard × |A∪B| (reference SetDigestFunctions.java:47).
  * Merge is set-union-then-truncate: associative and commutative, so
  * partial aggregation across 1000 executors is exact w.r.t. the sketch.
  * Serialized form is ~8·k bytes (k=512 → 4 KiB), fine as a stored column.
  */
object SetDigestKmv {
  val DefaultK = 512

  /** Sorted (unsigned) distinct hashes, at most k. */
  final case class Digest(k: Int, hashes: Array[Long])

  def empty(k: Int): Digest = Digest(k, Array.empty)

  private def unsignedLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  /** Insert one hash, keeping the k unsigned-smallest distinct values. */
  def add(d: Digest, h: Long): Digest = {
    val pos = search(d.hashes, h)
    if (pos >= 0) return d // already present
    val ins = -pos - 1
    if (d.hashes.length >= d.k) {
      if (ins >= d.k) return d // larger than current kth min
      val out = new Array[Long](d.k)
      System.arraycopy(d.hashes, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(d.hashes, ins, out, ins + 1, d.k - ins - 1)
      Digest(d.k, out)
    } else {
      val out = new Array[Long](d.hashes.length + 1)
      System.arraycopy(d.hashes, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(d.hashes, ins, out, ins + 1, d.hashes.length - ins)
      Digest(d.k, out)
    }
  }

  /** Binary search under unsigned order (same contract as Arrays.binarySearch). */
  private def search(a: Array[Long], key: Long): Int = {
    var lo = 0
    var hi = a.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(a(mid), key)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  /** Sorted-merge union truncated to k smallest. */
  def merge(a: Digest, b: Digest): Digest = {
    if (a.hashes.isEmpty) return b
    if (b.hashes.isEmpty) return a
    val k = math.max(a.k, b.k)
    val out = new Array[Long](math.min(k, a.hashes.length + b.hashes.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.hashes.length || j < b.hashes.length)) {
      val takeA =
        j >= b.hashes.length ||
          (i < a.hashes.length && unsignedLt(a.hashes(i), b.hashes(j)))
      val v = if (takeA) { val v = a.hashes(i); i += 1; v }
              else { val v = b.hashes(j); j += 1; v }
      if (i < a.hashes.length && a.hashes(i) == v) i += 1 // drop duplicate
      if (j < b.hashes.length && b.hashes(j) == v) j += 1
      out(o) = v; o += 1
    }
    Digest(k, if (o == out.length) out else out.take(o))
  }

  /** KMV distinct-count estimate. Exact below k. */
  def cardinality(d: Digest): Long = {
    val n = d.hashes.length
    if (n < d.k) return n.toLong
    // normalize kth smallest (unsigned) to (0,1]
    val kth = d.hashes(n - 1)
    val unsignedD = if (kth >= 0) kth.toDouble else kth.toDouble + math.pow(2.0, 64)
    val u = unsignedD / math.pow(2.0, 64)
    if (u <= 0.0) return n.toLong
    math.rint((n - 1) / u).toLong
  }

  /** MinHash Jaccard estimate from the m smallest hashes of the union,
    * m = min(|a|, |b|): the m-th smallest union hash is ≤ both digests'
    * k-th minimums, so membership tests against the truncated digests are
    * reliable (no false negatives from truncation). */
  def jaccard(a: Digest, b: Digest): Double = {
    if (a.hashes.isEmpty && b.hashes.isEmpty) return 1.0
    if (a.hashes.isEmpty || b.hashes.isEmpty) return 0.0
    val m = math.min(a.hashes.length, b.hashes.length)
    val u = merge(a, b)
    var inBoth = 0
    var i = 0
    while (i < m) {
      val h = u.hashes(i)
      if (search(a.hashes, h) >= 0 && search(b.hashes, h) >= 0) inBoth += 1
      i += 1
    }
    inBoth.toDouble / m
  }

  def intersectionCardinality(a: Digest, b: Digest): Long =
    math.rint(jaccard(a, b) * cardinality(merge(a, b))).toLong

  def serialize(d: Digest): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * d.hashes.length)
    bb.putInt(d.k).putInt(d.hashes.length)
    d.hashes.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytesIn: Array[Byte]): Digest = {
    val bytes = SketchTag.payload(bytesIn)
    if (bytes.isEmpty) return empty(DefaultK)
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    Digest(k, hs)
  }

  // codegen entry points
  def jaccardBytes(a: Array[Byte], b: Array[Byte]): Double =
    jaccard(deserialize(a), deserialize(b))
  def intersectionBytes(a: Array[Byte], b: Array[Byte]): Long =
    intersectionCardinality(deserialize(a), deserialize(b))
  def cardinalityBytes(a: Array[Byte]): Long = cardinality(deserialize(a))

  def hashValue(v: Any): Long = {
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

/** make_set_digest(x[, k]) → varbinary KMV sketch. */
case class SetDigestAgg(
  child: Expression,
  k: Int = SetDigestKmv.DefaultK,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigestKmv.Digest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "make_set_digest"

  override def createAggregationBuffer(): SetDigestKmv.Digest = SetDigestKmv.empty(k)

  override def update(buf: SetDigestKmv.Digest, input: InternalRow): SetDigestKmv.Digest = {
    val v = child.eval(input)
    if (v == null) buf else SetDigestKmv.add(buf, SetDigestKmv.hashValue(v))
  }

  override def merge(a: SetDigestKmv.Digest, b: SetDigestKmv.Digest): SetDigestKmv.Digest =
    SetDigestKmv.merge(a, b)
  override def eval(buf: SetDigestKmv.Digest): Any =
    SketchTag.wrap(SketchTag.SetDigest, SetDigestKmv.serialize(buf))
  override def serialize(buf: SetDigestKmv.Digest): Array[Byte] = SetDigestKmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): SetDigestKmv.Digest =
    SetDigestKmv.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): SetDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SetDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** merge_set_digest(sketch) → sketch (SetDigestOperators merge path). */
case class SetDigestMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SetDigestKmv.Digest] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_set_digest"

  override def createAggregationBuffer(): SetDigestKmv.Digest =
    SetDigestKmv.empty(SetDigestKmv.DefaultK)

  override def update(buf: SetDigestKmv.Digest, input: InternalRow): SetDigestKmv.Digest = {
    val v = child.eval(input)
    if (v == null) buf
    else SetDigestKmv.merge(buf, SetDigestKmv.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: SetDigestKmv.Digest, b: SetDigestKmv.Digest): SetDigestKmv.Digest =
    SetDigestKmv.merge(a, b)
  override def eval(buf: SetDigestKmv.Digest): Any =
    if (buf.hashes.isEmpty) null
    else SketchTag.wrap(SketchTag.SetDigest, SetDigestKmv.serialize(buf))
  override def serialize(buf: SetDigestKmv.Digest): Array[Byte] = SetDigestKmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): SetDigestKmv.Digest =
    SetDigestKmv.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): SetDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SetDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** set_digest_cardinality(sketch) → bigint (SetDigestFunctions.java:40). */
case class SetDigestCardinality(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"set_digest_cardinality requires varbinary, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "set_digest_cardinality"
  override protected def nullSafeEval(v: Any): Any =
    SetDigestKmv.cardinalityBytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.SetDigestKmv.cardinalityBytes($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** jaccard_index(d1, d2) → double (SetDigestFunctions.java:71). */
case class JaccardIndex(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "jaccard_index requires two varbinary sketches, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_index"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    SetDigestKmv.jaccardBytes(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetDigestKmv.jaccardBytes($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** intersection_cardinality(d1, d2) → bigint (SetDigestFunctions.java:47). */
case class IntersectionCardinality(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "intersection_cardinality requires two varbinary sketches, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "intersection_cardinality"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    SetDigestKmv.intersectionBytes(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetDigestKmv.intersectionBytes($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
