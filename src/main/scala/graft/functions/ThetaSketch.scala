package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches: mergeable distinct-count sketches CLOSED UNDER SET
  * ALGEBRA — union, intersection and set difference of sketches are
  * themselves sketches (the reference's theta surface:
  * operator/scalar/ThetaSketchFunctions.java; same model as Apache
  * DataSketches theta). This is what HLL cannot do: HLL unions but never
  * intersects, while dedup/audience-overlap pipelines at 100 TB need
  * |A∩B| and |A\B| without rescanning A and B.
  *
  * Model: KMV — keep the k smallest 64-bit hashes (unsigned order) of the
  * distinct inputs; θ = exclusive upper bound on retained hashes (2^64 ≡
  * "keep everything" until k is exceeded). Estimate = |retained| / (θ/2^64).
  * Below k distinct values θ stays saturated and every operation is EXACT —
  * the regime the oracle verifies; above k the relative error is
  * ~1/sqrt(k-1) (k=4096 → ~1.6%).
  *
  * All ops are deterministic given the input multiset (pure hash-set math,
  * no RNG), so PARTIAL/FINAL splits and any merge-tree shape give
  * bit-identical sketches.
  */
object Theta {
  val DefaultK = 4096
  val ThetaMax: Long = -1L // unsigned 2^64-1: retain-all sentinel

  /** hashes: sorted ascending in UNSIGNED order, all unsigned-< theta. */
  final case class Sk(k: Int, theta: Long, hashes: Array[Long]) {
    def isExact: Boolean = theta == ThetaMax
  }

  def empty(k: Int): Sk = Sk(k, ThetaMax, Array.empty)

  private def ult(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0

  def hashOf(v: Any): Long = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case l: Long => ByteBuffer.allocate(8).putLong(l).array()
      case i: Int => ByteBuffer.allocate(8).putLong(i.toLong).array()
      case s: Short => ByteBuffer.allocate(8).putLong(s.toLong).array()
      case b: Byte => ByteBuffer.allocate(8).putLong(b.toLong).array()
      case d: Double => ByteBuffer.allocate(8).putLong(
        java.lang.Double.doubleToLongBits(d)).array()
      case d: Decimal => UTF8String.fromString(d.toString).getBytes
      case b: Array[Byte] => b
      case other => UTF8String.fromString(other.toString).getBytes
    }
    Hll.hash(bytes)
  }

  /** trim a sorted distinct hash array to the k smallest, tightening θ. */
  private def trim(k: Int, theta: Long, sorted: Array[Long]): Sk =
    if (sorted.length <= k) Sk(k, theta, sorted)
    else Sk(k, sorted(k), sorted.take(k)) // θ := (k+1)-th smallest, exclusive

  def add(s: Sk, h: Long): Sk = {
    if (!ult(h, s.theta)) return s
    val pos = unsignedSearch(s.hashes, h)
    if (pos >= 0) return s // duplicate
    val ins = -pos - 1
    val nh = new Array[Long](s.hashes.length + 1)
    System.arraycopy(s.hashes, 0, nh, 0, ins)
    nh(ins) = h
    System.arraycopy(s.hashes, ins, nh, ins + 1, s.hashes.length - ins)
    trim(s.k, s.theta, nh)
  }

  /** binary search in unsigned order; returns -(insertion)-1 if absent. */
  private def unsignedSearch(a: Array[Long], key: Long): Int = {
    var lo = 0; var hi = a.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(a(mid), key)
      if (c < 0) lo = mid + 1
      else if (c > 0) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }

  private def sortedUnsigned(a: Array[Long]): Array[Long] = {
    // flip sign bit → signed sort = unsigned sort → flip back
    val t = a.map(_ ^ Long.MinValue)
    java.util.Arrays.sort(t)
    t.map(_ ^ Long.MinValue)
  }

  def union(a: Sk, b: Sk): Sk = {
    val k = math.min(a.k, b.k)
    val theta = if (ult(a.theta, b.theta)) a.theta else b.theta
    val merged = sortedUnsigned((a.hashes ++ b.hashes).distinct)
      .filter(ult(_, theta))
    trim(k, theta, merged)
  }

  def intersect(a: Sk, b: Sk): Sk = {
    val k = math.min(a.k, b.k)
    val theta = if (ult(a.theta, b.theta)) a.theta else b.theta
    val bs = b.hashes.toSet
    val both = a.hashes.filter(h => ult(h, theta) && bs.contains(h))
    Sk(k, theta, both)
  }

  def aNotB(a: Sk, b: Sk): Sk = {
    val theta = if (ult(a.theta, b.theta)) a.theta else b.theta
    val bs = b.hashes.toSet
    val only = a.hashes.filter(h => ult(h, theta) && !bs.contains(h))
    Sk(a.k, theta, only)
  }

  def estimate(s: Sk): Double = {
    if (s.isExact) s.hashes.length.toDouble
    else {
      // θ/2^64 without losing unsigned precision
      val norm = (s.theta >>> 11).toDouble / 9007199254740992.0 // 2^53 mantissa
      s.hashes.length / norm
    }
  }

  def serialize(s: Sk): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 4 + 8 * s.hashes.length)
    bb.putInt(s.k).putLong(s.theta).putInt(s.hashes.length)
    s.hashes.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytesIn: Array[Byte]): Sk = {
    val bytes = SketchTag.payload(bytesIn)
    if (bytes.isEmpty) return empty(DefaultK)
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val theta = bb.getLong; val n = bb.getInt
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = bb.getLong; i += 1 }
    Sk(k, theta, hs)
  }

  // codegen entry points over serialized form
  def estimateOf(bytes: Array[Byte]): Double = estimate(deserialize(bytes))
  def unionOf(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SketchTag.wrap(SketchTag.Theta, serialize(union(deserialize(a), deserialize(b))))
  def intersectOf(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SketchTag.wrap(SketchTag.Theta, serialize(intersect(deserialize(a), deserialize(b))))
  def aNotBOf(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SketchTag.wrap(SketchTag.Theta, serialize(aNotB(deserialize(a), deserialize(b))))
}

/** theta_sketch_agg(x[, k]) → varbinary theta sketch. */
case class ThetaSketchAgg(
  child: Expression,
  k: Int = Theta.DefaultK,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Theta.Sk] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Theta.Sk = Theta.empty(k)

  override def update(buf: Theta.Sk, input: InternalRow): Theta.Sk = {
    val v = child.eval(input)
    if (v == null) buf else Theta.add(buf, Theta.hashOf(v))
  }

  override def merge(a: Theta.Sk, b: Theta.Sk): Theta.Sk = Theta.union(a, b)
  override def eval(buf: Theta.Sk): Any =
    SketchTag.wrap(SketchTag.Theta, Theta.serialize(buf))
  override def serialize(buf: Theta.Sk): Array[Byte] = Theta.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Theta.Sk = Theta.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** merge_theta(sketch) → sketch — aggregate union of stored sketches. */
case class ThetaMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Theta.Sk] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_theta"

  override def createAggregationBuffer(): Theta.Sk = Theta.empty(Theta.DefaultK)

  override def update(buf: Theta.Sk, input: InternalRow): Theta.Sk = {
    val v = child.eval(input)
    if (v == null) buf
    else Theta.union(buf, Theta.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: Theta.Sk, b: Theta.Sk): Theta.Sk = Theta.union(a, b)
  override def eval(buf: Theta.Sk): Any =
    if (buf.hashes.isEmpty && buf.isExact) null
    else SketchTag.wrap(SketchTag.Theta, Theta.serialize(buf))
  override def serialize(buf: Theta.Sk): Array[Byte] = Theta.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Theta.Sk = Theta.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** theta_sketch_estimate(sketch) → double distinct-count estimate. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_estimate requires varbinary, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_sketch_estimate"
  override protected def nullSafeEval(v: Any): Any =
    Theta.estimateOf(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Theta.estimateOf($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** sketch_theta_summary(sketch) → row(estimate, theta, upper_bound_std,
  * lower_bound_std, retained_entries) — reference ThetaSketchFunctions.java:55.
  * Bounds use the textbook theta-sketch estimator variance
  * var(est) ≈ n(1−θ)/θ² (est = n/θ), one standard deviation — a
  * clean-room stand-in for DataSketches' exact binomial bounds; exact
  * sketches report the retained count with zero-width bounds. */
case class ThetaSummary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sketch_theta_summary requires varbinary, got ${child.dataType.simpleString}")
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType), StructField("theta", DoubleType),
    StructField("upper_bound_std", DoubleType),
    StructField("lower_bound_std", DoubleType),
    StructField("retained_entries", IntegerType)))
  override def prettyName: String = "sketch_theta_summary"
  override protected def nullSafeEval(v: Any): Any = {
    val sk = Theta.deserialize(v.asInstanceOf[Array[Byte]])
    val est = Theta.estimate(sk)
    val n = sk.hashes.length
    val thetaFrac =
      if (sk.isExact) 1.0
      else (sk.theta >>> 11).toDouble / 9007199254740992.0
    val std =
      if (sk.isExact || n == 0) 0.0
      else math.sqrt(n * (1.0 - thetaFrac)) / thetaFrac
    org.apache.spark.sql.catalyst.InternalRow(
      est, thetaFrac, est + std, math.max(0.0, est - std), n)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[functions] sealed abstract class ThetaBinaryOp extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (varbinary, varbinary), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = BinaryType
}

/** theta_sketch_union(a, b) → sketch of A ∪ B. */
case class ThetaUnion(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_sketch_union"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Theta.unionOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Theta.unionOf($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** theta_sketch_intersect(a, b) → sketch of A ∩ B. */
case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_sketch_intersect"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Theta.intersectOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Theta.intersectOf($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** theta_sketch_a_not_b(a, b) → sketch of A \ B. */
case class ThetaANotB(left: Expression, right: Expression) extends ThetaBinaryOp {
  override def prettyName: String = "theta_sketch_a_not_b"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Theta.aNotBOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Theta.aNotBOf($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
