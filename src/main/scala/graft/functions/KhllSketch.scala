package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types._

/** KHyperLogLog — the reference's khyperloglog type family
  * (type/khyperloglog/KHyperLogLog.java:55, KHyperLogLogFunctions.java:33:
  * khyperloglog_agg, merge_khll, cardinality, intersection_cardinality,
  * jaccard_index, uniqueness_distribution, reidentification_potential),
  * per "KHyperLogLog: Estimating Reidentifiability and Joinability of
  * Large Data at Scale" (Chia et al., 2019).
  *
  * State: the K smallest hashes of the value column, each carrying an HLL
  * of the uii (user id) values seen with that value. One structure answers
  *  - |distinct values|: KMV density extrapolation past K, exact below it;
  *  - joinability of two columns: MinHash Jaccard over the stored hashes;
  *  - reidentifiability: the per-value uii cardinalities are an unbiased
  *    sample of the value→user fan-out, so `uniqueness_distribution` is a
  *    histogram of "how many users share a value" and
  *    `reidentification_potential` the fraction of values with ≤ t users.
  * Merge is per-key HLL-union then re-truncate to K smallest — associative
  * and commutative, so Spark's partial aggregation across executors loses
  * nothing. Serialized size ≤ K·(8 + 257) bytes (K=4096 → ~1 MiB cap,
  * typically far smaller); state is per-group, never per-row.
  */
object Khll {
  val DefaultMaxSize = 4096 // reference DEFAULT_MAX_SIZE (KHyperLogLog.java:58)
  val HllP = 8 // 256 registers — reference DEFAULT_HLL_BUCKETS (KHyperLogLog.java:57)
  val DefaultHistogramSize = 256L // KHyperLogLog.java:59

  private val HllBytes = 1 + (1 << HllP)

  /** Signed-ordered treemap of value-hash → serialized HLL registers, same
    * ordering as the reference's Long2ObjectRBTreeMap over murmur64. */
  final case class State(
    maxSize: Int,
    minhash: java.util.TreeMap[java.lang.Long, Array[Byte]])

  def empty(maxSize: Int = DefaultMaxSize): State =
    State(maxSize, new java.util.TreeMap[java.lang.Long, Array[Byte]])

  def isExact(s: State): Boolean = s.minhash.size < s.maxSize

  /** KHyperLogLog.java:240-257: insert only when the hash is tracked,
    * there is room, or it beats the current K-th minimum. */
  def add(s: State, value: Any, uii: Any): Unit = {
    val h = SetDigestKmv.hashValue(value)
    if (s.minhash.containsKey(h) || isExact(s) || h < s.minhash.lastKey) {
      val hll = s.minhash.computeIfAbsent(
        h, (_: java.lang.Long) => Hll.emptyBuffer(HllP))
      Hll.add(hll, SetDigestKmv.hashValue(uii))
      removeOverflow(s)
    }
  }

  private def removeOverflow(s: State): Unit =
    while (s.minhash.size > s.maxSize) s.minhash.remove(s.minhash.lastKey)

  /** Mutating merge of b into a (per-key HLL union, then truncate). The
    * clone keeps a independent of b's buffers — b may be a live partial. */
  def mergeInto(a: State, b: State): State = {
    val it = b.minhash.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val mine = a.minhash.get(e.getKey)
      if (mine != null) Hll.merge(mine, e.getValue)
      else a.minhash.put(e.getKey, e.getValue.clone())
    }
    removeOverflow(a)
    a
  }

  /** Fresh union at the smaller K (resolution is kept by the smaller
    * sketch — KHyperLogLog.java:189-198). */
  def union(a: State, b: State): State =
    mergeInto(mergeInto(empty(math.min(a.maxSize, b.maxSize)), a), b)

  /** Exact below K; else KMV density extrapolation with the Beyer et al.
    * bias correction (KHyperLogLog.java:259-272). */
  def cardinality(s: State): Long = {
    val n = s.minhash.size
    if (isExact(s)) return n.toLong
    val hashesRange = s.minhash.lastKey.longValue() - Long.MinValue
    val halfDensity = java.lang.Long.divideUnsigned(hashesRange, n - 1L) / 2.0
    (Long.MaxValue / halfDensity).toLong
  }

  /** MinHash Jaccard: of the m = min(|a|,|b|) smallest union hashes, the
    * fraction present in both (KHyperLogLog.java:166-187). */
  def jaccard(a: State, b: State): Double = {
    if (a.minhash.isEmpty && b.minhash.isEmpty) return 1.0
    if (a.minhash.isEmpty || b.minhash.isEmpty) return 0.0
    val m = math.min(a.minhash.size, b.minhash.size)
    val keys = new java.util.TreeSet[java.lang.Long](a.minhash.keySet)
    keys.addAll(b.minhash.keySet)
    var inter = 0
    var i = 0
    val it = keys.iterator
    while (it.hasNext && i < m) {
      val k = it.next()
      if (a.minhash.containsKey(k) && b.minhash.containsKey(k)) inter += 1
      i += 1
    }
    inter.toDouble / m
  }

  /** Exact set intersection below K on both sides; else Jaccard × |A∪B|,
    * clamped by the smaller side (KHyperLogLogFunctions.java:48-67). */
  def intersectionCardinality(a: State, b: State): Long = {
    if (isExact(a) && isExact(b)) {
      var n = 0
      val it = a.minhash.keySet.iterator
      while (it.hasNext) if (b.minhash.containsKey(it.next())) n += 1
      return n.toLong
    }
    val lowest = math.min(cardinality(a), cardinality(b))
    math.min(math.round(jaccard(a, b) * cardinality(union(a, b))), lowest)
  }

  /** Fraction of sampled values whose uii cardinality is ≤ threshold
    * (KHyperLogLog.java:297-305). */
  def reidentificationPotential(s: State, threshold: Long): Double = {
    if (s.minhash.isEmpty) return 0.0
    var few = 0
    val it = s.minhash.values.iterator
    while (it.hasNext) if (Hll.cardinality(it.next()) <= threshold) few += 1
    few.toDouble / s.minhash.size
  }

  /** Histogram of per-value uii cardinality, saturating at histogramSize,
    * each value weighted 1/|minhash| (KHyperLogLog.java:312-327). Keys
    * 1..histogramSize are always present (zero-initialized). */
  def uniquenessDistribution(s: State, histogramSize: Long): (Array[Long], Array[Double]) = {
    val n = math.max(histogramSize, 0L).toInt
    val keys = Array.tabulate(n)(i => (i + 1).toLong)
    val vals = new Array[Double](n)
    val size = s.minhash.size
    if (size > 0) {
      val it = s.minhash.values.iterator
      while (it.hasNext) {
        val c = Hll.cardinality(it.next())
        val bucket = math.min(math.max(c, 1L), histogramSize).toInt - 1
        vals(bucket) += 1.0 / size
      }
    }
    (keys, vals)
  }

  def serialize(s: State): Array[Byte] = {
    val n = s.minhash.size
    val bb = ByteBuffer.allocate(12 + n * (8 + HllBytes))
    bb.putInt(s.maxSize).putInt(HllP).putInt(n)
    val it = s.minhash.entrySet.iterator
    while (it.hasNext) { bb.putLong(it.next().getKey.longValue()) }
    val it2 = s.minhash.values.iterator
    while (it2.hasNext) { bb.put(it2.next()) }
    bb.array()
  }

  def deserialize(bytesIn: Array[Byte]): State = {
    val bytes = SketchTag.payload(bytesIn)
    if (bytes.isEmpty) return empty()
    val bb = ByteBuffer.wrap(bytes)
    val maxSize = bb.getInt
    val p = bb.getInt
    require(p == HllP, s"khyperloglog HLL precision mismatch: $p vs $HllP")
    val n = bb.getInt
    val keys = new Array[Long](n)
    var i = 0
    while (i < n) { keys(i) = bb.getLong; i += 1 }
    val m = new java.util.TreeMap[java.lang.Long, Array[Byte]]
    i = 0
    while (i < n) {
      val hll = new Array[Byte](HllBytes)
      bb.get(hll)
      m.put(keys(i), hll)
      i += 1
    }
    State(maxSize, m)
  }

  // codegen entry points
  def cardinalityBytes(a: Array[Byte]): Long = cardinality(deserialize(a))
  def jaccardBytes(a: Array[Byte], b: Array[Byte]): Double =
    jaccard(deserialize(a), deserialize(b))
  def intersectionBytes(a: Array[Byte], b: Array[Byte]): Long =
    intersectionCardinality(deserialize(a), deserialize(b))
  def reidentBytes(a: Array[Byte], threshold: Long): Double =
    reidentificationPotential(deserialize(a), threshold)
  def uniquenessMap(a: Array[Byte], histogramSize: Long): MapData = {
    val (k, v) = uniquenessDistribution(deserialize(a), histogramSize)
    ArrayBasedMapData(k, v)
  }
}

/** khyperloglog_agg(value, uii) → varbinary KHLL sketch
  * (KHyperLogLogAggregationFunction.java:36). */
case class KhllAgg(
  value: Expression,
  uii: Expression,
  maxSize: Int = Khll.DefaultMaxSize,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Khll.State] {

  override def children: Seq[Expression] = Seq(value, uii)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "khyperloglog_agg"

  override def createAggregationBuffer(): Khll.State = Khll.empty(maxSize)

  override def update(buf: Khll.State, input: InternalRow): Khll.State = {
    val v = value.eval(input)
    val u = uii.eval(input)
    if (v != null && u != null) Khll.add(buf, v, u)
    buf
  }

  override def merge(a: Khll.State, b: Khll.State): Khll.State = Khll.mergeInto(a, b)
  override def eval(buf: Khll.State): Any =
    SketchTag.wrap(SketchTag.Khll, Khll.serialize(buf))
  override def serialize(buf: Khll.State): Array[Byte] = Khll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Khll.State = Khll.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KhllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KhllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0), uii = newChildren(1))
}

/** merge_khll(sketch) → sketch (MergeKHyperLogLogAggregationFunction.java:34). */
case class KhllMergeAgg(
  child: Expression,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Khll.State] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "merge_khll"

  override def createAggregationBuffer(): Khll.State = Khll.empty()

  override def update(buf: Khll.State, input: InternalRow): Khll.State = {
    val v = child.eval(input)
    if (v == null) buf
    else Khll.mergeInto(buf, Khll.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: Khll.State, b: Khll.State): Khll.State = Khll.mergeInto(a, b)
  override def eval(buf: Khll.State): Any =
    if (buf.minhash.isEmpty) null
    else SketchTag.wrap(SketchTag.Khll, Khll.serialize(buf))
  override def serialize(buf: Khll.State): Array[Byte] = Khll.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Khll.State = Khll.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): KhllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KhllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** khll_cardinality(sketch) → bigint (KHyperLogLogFunctions.java:41). */
case class KhllCardinality(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"khll_cardinality requires varbinary, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "khll_cardinality"
  override protected def nullSafeEval(v: Any): Any =
    Khll.cardinalityBytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.Khll.cardinalityBytes($a)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** khll_jaccard_index(a, b) → double (KHyperLogLogFunctions.java:71; the
  * reference overloads jaccard_index on the khyperloglog type — here the
  * khll_ prefix stands in for type dispatch on varbinary). */
case class KhllJaccard(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "khll_jaccard_index requires two varbinary sketches, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "khll_jaccard_index"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Khll.jaccardBytes(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Khll.jaccardBytes($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** khll_intersection_cardinality(a, b) → bigint
  * (KHyperLogLogFunctions.java:48). */
case class KhllIntersection(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "khll_intersection_cardinality requires two varbinary sketches, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "khll_intersection_cardinality"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Khll.intersectionBytes(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Khll.intersectionBytes($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** reidentification_potential(sketch, threshold) → double
  * (KHyperLogLogFunctions.java:104-109). */
case class KhllReidentification(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "reidentification_potential requires (varbinary, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "reidentification_potential"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Khll.reidentBytes(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Khll.reidentBytes($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** uniqueness_distribution(sketch[, histogramSize]) → map<bigint,double>
  * (KHyperLogLogFunctions.java:79-102). */
case class KhllUniqueness(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "uniqueness_distribution requires (varbinary, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType =
    MapType(LongType, DoubleType, valueContainsNull = false)
  override def prettyName: String = "uniqueness_distribution"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    Khll.uniquenessMap(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Khll.uniquenessMap($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
