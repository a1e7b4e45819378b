package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketch — the reference's kll_sketch_agg /
  * kll_quantile / kll_rank surface (operator/aggregation
  * /KllSketchAggregationFunction.java, operator/scalar/KllSketchFunctions
  * .java) with the sketch as a first-class binary VALUE.
  *
  * Classic KLL compactor hierarchy (Karnin-Lang-Liberty 2016): level h holds
  * items each representing 2^h originals; when a level overflows its
  * geometric capacity cap(h)=max(k·(2/3)^(depth-1-h), 8) it is sorted and
  * every other item is promoted to level h+1. The usual coin flip that picks
  * odd/even survivors is derived from a counter hash (deterministic for a
  * fixed partition layout, unbiased across compactions), so the sketch
  * stays reproducible in tests while keeping the KLL rank-error guarantee
  * ε ≈ 1.7/k with high probability. Merge = levelwise concat + re-compact:
  * associative within the error bound — safe for PARTIAL/FINAL aggregation
  * and cross-query merge trees over 1000 executors.
  *
  * Unlike centroid digests (QDigest/TDigest), KLL answers quantiles with
  * RETAINED INPUT VALUES (quantile_disc semantics), so below k items it is
  * exactly DuckDB's quantile_disc — which is what the gate checks.
  */
object Kll {
  val DefaultK = 200

  final case class Sketch(k: Int, n: Long, compactions: Long,
    levels: Vector[Array[Double]]) { // levels(h) sorted ascending for h>=1
    def retained: Int = levels.map(_.length).sum
  }

  def empty(k: Int): Sketch = Sketch(k, 0L, 0L, Vector(Array.empty))

  private def cap(k: Int, depth: Int, h: Int): Int =
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, (depth - 1 - h).toDouble)).toInt)

  private def capacityTotal(k: Int, depth: Int): Int =
    (0 until depth).map(cap(k, depth, _)).sum

  /** deterministic unbiased "coin": hash of the compaction counter. */
  private def coin(compactions: Long): Int =
    (java.lang.Long.hashCode(compactions * 0x9E3779B97F4A7C15L) >>> 16) & 1

  def compactIfNeeded(s: Sketch): Sketch = {
    var cur = s
    while (cur.retained > capacityTotal(cur.k, cur.levels.length)) {
      val depth = cur.levels.length
      // compact the lowest level over its individual capacity (standard KLL)
      val h = (0 until depth).find(i =>
        cur.levels(i).length > cap(cur.k, depth, i)).getOrElse(0)
      val sorted = cur.levels(h).sorted
      val off = coin(cur.compactions)
      val promoted = Array.tabulate((sorted.length - off + 1) / 2)(i => sorted(off + 2 * i))
      val keepEven = sorted.length % 2 == 1 && off == 0
      val leftover = if (keepEven) Array(sorted.last) else Array.empty[Double]
      val withTarget = if (h + 1 < depth) cur.levels
        else cur.levels :+ Array.empty[Double]
      val merged = (withTarget(h + 1) ++ promoted).sorted
      val nl = withTarget.updated(h, leftover).updated(h + 1, merged)
      cur = Sketch(cur.k, cur.n, cur.compactions + 1, nl)
    }
    cur
  }

  def add(s: Sketch, x: Double): Sketch = {
    val l0 = s.levels(0)
    val nl0 = new Array[Double](l0.length + 1)
    System.arraycopy(l0, 0, nl0, 0, l0.length)
    nl0(l0.length) = x
    compactIfNeeded(Sketch(s.k, s.n + 1, s.compactions, s.levels.updated(0, nl0)))
  }

  def merge(a: Sketch, b: Sketch): Sketch = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val k = math.min(a.k, b.k)
    val depth = math.max(a.levels.length, b.levels.length)
    val lv = Vector.tabulate(depth) { h =>
      val x = if (h < a.levels.length) a.levels(h) else Array.empty[Double]
      val y = if (h < b.levels.length) b.levels(h) else Array.empty[Double]
      if (h == 0) x ++ y else (x ++ y).sorted
    }
    compactIfNeeded(Sketch(k, a.n + b.n, a.compactions + b.compactions, lv))
  }

  /** weighted (value, 2^level) pairs sorted by value. */
  private def weighted(s: Sketch): (Array[Double], Array[Long]) = {
    val total = s.retained
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var o = 0
    for (h <- s.levels.indices; v <- s.levels(h)) {
      vs(o) = v; ws(o) = 1L << h; o += 1
    }
    val idx = vs.indices.toArray.sortBy(i => vs(i))
    (idx.map(vs), idx.map(ws))
  }

  /** smallest retained value whose cumulative weight reaches q·n
    * (quantile_disc semantics — returns an actual input value). */
  def quantile(s: Sketch, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
    if (s.n == 0) return Double.NaN
    val (vs, ws) = weighted(s)
    val total = ws.sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var i = 0
    while (i < vs.length) {
      cum += ws(i)
      if (cum >= target) return vs(i)
      i += 1
    }
    vs.last
  }

  /** fraction of values <= x. */
  def rank(s: Sketch, x: Double): Double = {
    if (s.n == 0) return Double.NaN
    val (vs, ws) = weighted(s)
    val total = ws.sum
    var cum = 0L
    var i = 0
    while (i < vs.length && vs(i) <= x) { cum += ws(i); i += 1 }
    cum.toDouble / total
  }

  def serialize(s: Sketch): Array[Byte] = {
    val sz = 4 + 8 + 8 + 4 + s.levels.map(l => 4 + 8 * l.length).sum
    val bb = ByteBuffer.allocate(sz)
    bb.putInt(s.k).putLong(s.n).putLong(s.compactions).putInt(s.levels.length)
    s.levels.foreach { l =>
      bb.putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytesIn: Array[Byte]): Sketch = {
    val bytes = SketchTag.payload(bytesIn)
    if (bytes.isEmpty) return empty(DefaultK)
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getLong; val c = bb.getLong
    val depth = bb.getInt
    val lv = Vector.fill(depth) {
      val len = bb.getInt
      val a = new Array[Double](len)
      var i = 0
      while (i < len) { a(i) = bb.getDouble; i += 1 }
      a
    }
    Sketch(k, n, c, lv)
  }

  // codegen entry points
  def quantileOf(bytes: Array[Byte], q: Double): Double =
    quantile(deserialize(bytes), q)
  def rankOf(bytes: Array[Byte], x: Double): Double =
    rank(deserialize(bytes), x)
}

/** kll_sketch_agg(x[, k]) → varbinary KLL sketch. */
case class KllSketchAgg(
  child: Expression,
  k: Int = Kll.DefaultK,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Sketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): Kll.Sketch = Kll.empty(k)

  override def update(buf: Kll.Sketch, input: InternalRow): Kll.Sketch = {
    val v = child.eval(input)
    if (v == null) buf
    else Kll.add(buf, v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: Decimal => d.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
    })
  }

  override def merge(a: Kll.Sketch, b: Kll.Sketch): Kll.Sketch = Kll.merge(a, b)
  override def eval(buf: Kll.Sketch): Any =
    SketchTag.wrap(SketchTag.Kll, Kll.serialize(buf))
  override def serialize(buf: Kll.Sketch): Array[Byte] = Kll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kll.Sketch = Kll.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** merge_kll(sketch) → sketch. */
case class KllMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Sketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_kll"

  override def createAggregationBuffer(): Kll.Sketch = Kll.empty(Kll.DefaultK)

  override def update(buf: Kll.Sketch, input: InternalRow): Kll.Sketch = {
    val v = child.eval(input)
    if (v == null) buf
    else Kll.merge(buf, Kll.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: Kll.Sketch, b: Kll.Sketch): Kll.Sketch = Kll.merge(a, b)
  override def eval(buf: Kll.Sketch): Any =
    if (buf.n == 0) null
    else SketchTag.wrap(SketchTag.Kll, Kll.serialize(buf))
  override def serialize(buf: Kll.Sketch): Array[Byte] = Kll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kll.Sketch = Kll.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** kll_quantile(sketch, q) → double (a retained input value). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kll_quantile requires (varbinary, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Kll.quantileOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kll.quantileOf($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** kll_rank(sketch, x) → double fraction of values <= x. */
case class KllRank(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kll_rank requires (varbinary, double), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_rank"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Kll.rankOf(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kll.rankOf($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
