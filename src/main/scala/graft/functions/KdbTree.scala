package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KDB-tree spatial partitioning — the reference's spatial_partitioning /
  * spatial_partitions pair (geospatial/
  * SpatialPartitioningInternalAggregateFunction.java:43,
  * presto-geospatial-toolkit KdbTree.java:55): build a balanced
  * space-partitioning tree from a sample of envelopes, then route each
  * geometry to the leaves its envelope intersects. The leaf id becomes a
  * plain shuffle key, so a spatial join inherits Catalyst/AQE equi-join
  * machinery with data-adaptive (skew-resistant) cell boundaries instead
  * of a fixed grid.
  *
  * Spark-first deviation: the reference samples with a single-node
  * ThreadLocalRandom reservoir and forbids combining
  * (SpatialPartitioningInternalAggregateFunction.java:80 throws). Here
  * the sample is a BOTTOM-K sketch by xxhash64 of the envelope — an
  * order-independent uniform sample that merges exactly, so the aggregate
  * is a normal partial/final TypedImperativeAggregate that scales across
  * executors and is deterministic run-to-run.
  *
  * Split algorithm matches KdbTree.buildKdbTreeNode: leaves hold at most
  * ceil(sample/partitions) items; split on the longer extent side at the
  * midpoint between the middle item's min coordinate and the next distinct
  * value; fall back to the other axis; right/top boundaries exclusive.
  */
object Kdb {
  final case class Rect(xmin: Double, ymin: Double, xmax: Double, ymax: Double)
  sealed trait Node { def extent: Rect }
  final case class Leaf(extent: Rect, id: Int) extends Node
  final case class Internal(extent: Rect, left: Node, right: Node) extends Node

  // a bottom-k sample halves per level; 64 levels is unreachable in practice
  private val MaxLevels = 64

  def universe: Rect = Rect(
    Double.NegativeInfinity, Double.NegativeInfinity,
    Double.PositiveInfinity, Double.PositiveInfinity)

  def build(maxItemsPerNode: Int, items: IndexedSeq[Rect]): Node = {
    require(maxItemsPerNode > 0, "maxItemsPerNode must be > 0")
    val ids = new java.util.concurrent.atomic.AtomicInteger(0)
    buildNode(maxItemsPerNode, 0, universe, items, ids)
  }

  private def buildNode(
    cap: Int, level: Int, extent: Rect,
    items: IndexedSeq[Rect],
    ids: java.util.concurrent.atomic.AtomicInteger): Node = {
    if (items.length <= cap || level >= MaxLevels)
      return Leaf(extent, ids.getAndIncrement())
    val vertical = shouldSplitVertically(extent)
    trySplit(vertical, cap, level, extent, items, ids)
      .orElse(trySplit(!vertical, cap, level, extent, items, ids))
      .getOrElse(Leaf(extent, ids.getAndIncrement()))
  }

  /** Longer side first; infinite extents count as longer (KdbTree.java:324). */
  private def shouldSplitVertically(e: Rect): Boolean = {
    val hInf = (if (e.xmax.isPosInfinity) 1 else 0) + (if (e.xmin.isNegInfinity) 1 else 0)
    val vInf = (if (e.ymax.isPosInfinity) 1 else 0) + (if (e.ymin.isNegInfinity) 1 else 0)
    if (hInf == vInf) (e.xmax - e.xmin) >= (e.ymax - e.ymin) else hInf > vInf
  }

  private def trySplit(
    vertical: Boolean, cap: Int, level: Int, extent: Rect,
    items: IndexedSeq[Rect],
    ids: java.util.concurrent.atomic.AtomicInteger): Option[Node] = {
    val sorted =
      if (vertical) items.sortBy(r => (r.xmin, r.ymin))
      else items.sortBy(r => (r.ymin, r.xmin))
    val value: Rect => Double = if (vertical) _.xmin else _.ymin
    val mid = (sorted.length - 1) / 2
    val sv = value(sorted(mid))
    var si = mid
    while (si < sorted.length && value(sorted(si)) == sv) si += 1
    if (si == sorted.length) return None // all mins equal past middle: can't split
    val split = (sv + value(sorted(si))) / 2
    val (le, re) =
      if (vertical) (extent.copy(xmax = split), extent.copy(xmin = split))
      else (extent.copy(ymax = split), extent.copy(ymin = split))
    Some(Internal(extent,
      buildNode(cap, level + 1, le, sorted.take(si), ids),
      buildNode(cap, level + 1, re, sorted.drop(si), ids)))
  }

  def leaves(root: Node): Seq[Leaf] = {
    val out = Seq.newBuilder[Leaf]
    def walk(n: Node): Unit = n match {
      case l: Leaf => out += l
      case Internal(_, a, b) => walk(a); walk(b)
    }
    walk(root)
    out.result()
  }

  /** Leaves whose extent intersects the envelope; right/top boundaries are
    * exclusive (KdbTree.java:178-186), so a POINT always hits exactly one
    * leaf — point-probe joins need no pair dedup. */
  def intersectingLeaves(root: Node, r: Rect): Seq[Leaf] = {
    val out = Seq.newBuilder[Leaf]
    def hits(e: Rect): Boolean =
      e.xmin <= r.xmax && e.xmax > r.xmin && e.ymin <= r.ymax && e.ymax > r.ymin
    def walk(n: Node): Unit = n match {
      case l: Leaf => if (hits(l.extent)) out += l
      case Internal(e, a, b) => if (hits(e)) { walk(a); walk(b) }
    }
    walk(root)
    out.result()
  }

  // --- compact JSON form (infinities spelled "inf"/"-inf") ---

  private def num(d: Double): String =
    if (d.isPosInfinity) "\"inf\""
    else if (d.isNegInfinity) "\"-inf\""
    else d.toString

  def toJson(n: Node): String = n match {
    case Leaf(e, id) =>
      s"""{"extent":[${num(e.xmin)},${num(e.ymin)},${num(e.xmax)},${num(e.ymax)}],"leafId":$id}"""
    case Internal(e, l, r) =>
      s"""{"extent":[${num(e.xmin)},${num(e.ymin)},${num(e.xmax)},${num(e.ymax)}],""" +
        s""""left":${toJson(l)},"right":${toJson(r)}}"""
  }

  def fromJson(s: String): Node = new KdbJsonParser(s).parseNode()

  private final class KdbJsonParser(s: String) {
    private var i = 0
    private def skip(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      skip()
      require(i < s.length && s.charAt(i) == c, s"kdb json: expected '$c' at $i")
      i += 1
    }
    private def key(): String = {
      expect('"')
      val start = i
      while (s.charAt(i) != '"') i += 1
      val k = s.substring(start, i)
      i += 1
      expect(':')
      k
    }
    private def number(): Double = {
      skip()
      if (s.charAt(i) == '"') {
        expect('"')
        val start = i
        while (s.charAt(i) != '"') i += 1
        val t = s.substring(start, i)
        i += 1
        if (t == "inf") Double.PositiveInfinity
        else if (t == "-inf") Double.NegativeInfinity
        else t.toDouble
      } else {
        val start = i
        while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
        s.substring(start, i).toDouble
      }
    }
    private def rect(): Rect = {
      expect('[')
      val xmin = number(); expect(',')
      val ymin = number(); expect(',')
      val xmax = number(); expect(',')
      val ymax = number(); expect(']')
      Rect(xmin, ymin, xmax, ymax)
    }
    def parseNode(): Node = {
      expect('{')
      require(key() == "extent", "kdb json: extent first")
      val e = rect()
      expect(',')
      key() match {
        case "leafId" =>
          val id = number().toInt
          expect('}')
          Leaf(e, id)
        case "left" =>
          val l = parseNode()
          expect(',')
          require(key() == "right", "kdb json: right after left")
          val r = parseNode()
          expect('}')
          Internal(e, l, r)
        case other => throw new IllegalArgumentException(s"kdb json: unexpected key $other")
      }
    }
  }

  def hashRect(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Long = {
    val bb = ByteBuffer.allocate(32)
    bb.putLong(java.lang.Double.doubleToLongBits(xmin))
    bb.putLong(java.lang.Double.doubleToLongBits(ymin))
    bb.putLong(java.lang.Double.doubleToLongBits(xmax))
    bb.putLong(java.lang.Double.doubleToLongBits(ymax))
    Hll.hash(bb.array())
  }
}

/** spatial_partitioning(xmin, ymin, xmax, ymax, partitionCount[, sampleCap])
  * → varchar KDB-tree JSON. Mergeable bottom-k envelope sample (see Kdb). */
case class SpatialPartitioningAgg(
  xmin: Expression, ymin: Expression, xmax: Expression, ymax: Expression,
  partitionCount: Int,
  sampleCap: Int = 10000,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, Kdb.Rect]] {

  require(partitionCount > 0, "spatial_partitioning: partitionCount must be > 0")
  require(sampleCap > 0, "spatial_partitioning: sampleCap must be > 0")

  override def children: Seq[Expression] = Seq(xmin, ymin, xmax, ymax)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "spatial_partitioning"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, Kdb.Rect] =
    new java.util.TreeMap[java.lang.Long, Kdb.Rect]

  private def dbl(e: Expression, input: InternalRow): java.lang.Double =
    e.eval(input) match {
      case null => null
      case n: java.lang.Number => n.doubleValue()
      case d: Decimal => d.toDouble
    }

  override def update(
    buf: java.util.TreeMap[java.lang.Long, Kdb.Rect],
    input: InternalRow): java.util.TreeMap[java.lang.Long, Kdb.Rect] = {
    val x0 = dbl(xmin, input); val y0 = dbl(ymin, input)
    val x1 = dbl(xmax, input); val y1 = dbl(ymax, input)
    if (x0 == null || y0 == null || x1 == null || y1 == null) return buf
    val h = Kdb.hashRect(x0, y0, x1, y1)
    if (buf.size < sampleCap || h < buf.lastKey) {
      buf.put(h, Kdb.Rect(x0, y0, x1, y1))
      while (buf.size > sampleCap) buf.remove(buf.lastKey)
    }
    buf
  }

  override def merge(
    a: java.util.TreeMap[java.lang.Long, Kdb.Rect],
    b: java.util.TreeMap[java.lang.Long, Kdb.Rect]): java.util.TreeMap[java.lang.Long, Kdb.Rect] = {
    a.putAll(b)
    while (a.size > sampleCap) a.remove(a.lastKey)
    a
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, Kdb.Rect]): Any = {
    if (buf.isEmpty) return null
    val samples = buf.values.toArray(new Array[Kdb.Rect](0)).toIndexedSeq
    val maxItems = math.max(1, (samples.size + partitionCount - 1) / partitionCount)
    UTF8String.fromString(Kdb.toJson(Kdb.build(maxItems, samples)))
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, Kdb.Rect]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 40)
    bb.putInt(buf.size)
    val it = buf.entrySet.iterator
    while (it.hasNext) {
      val e = it.next()
      val r = e.getValue
      bb.putLong(e.getKey.longValue())
      bb.putDouble(r.xmin).putDouble(r.ymin).putDouble(r.xmax).putDouble(r.ymax)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, Kdb.Rect] = {
    val m = new java.util.TreeMap[java.lang.Long, Kdb.Rect]
    if (bytes.isEmpty) return m
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val h = bb.getLong
      m.put(h, Kdb.Rect(bb.getDouble, bb.getDouble, bb.getDouble, bb.getDouble))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SpatialPartitioningAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpatialPartitioningAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(xmin = newChildren(0), ymin = newChildren(1),
      xmax = newChildren(2), ymax = newChildren(3))
}

/** spatial_partitions(kdbTreeJson, xmin, ymin, xmax, ymax) → array<int> of
  * leaf ids the envelope intersects (KdbTree.findIntersectingLeaves). */
case class KdbPartitions(
  tree: Expression,
  xmin: Expression, ymin: Expression, xmax: Expression, ymax: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(tree, xmin, ymin, xmax, ymax)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "spatial_partitions"

  override def checkInputDataTypes(): TypeCheckResult = {
    val coordsOk = Seq(xmin, ymin, xmax, ymax).forall(
      _.dataType.isInstanceOf[NumericType])
    if (tree.dataType == StringType && coordsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "spatial_partitions requires (string, numeric×4), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  @transient private lazy val foldedTree: Kdb.Node =
    if (tree.foldable) {
      val t = tree.eval(null)
      if (t == null) null else Kdb.fromJson(t.toString)
    } else null

  // single-entry memo for the non-foldable path (same tree string per task)
  @transient private var lastJson: String = null
  @transient private var lastTree: Kdb.Node = null

  private def treeOf(input: InternalRow): Kdb.Node =
    if (tree.foldable) foldedTree
    else {
      val t = tree.eval(input)
      if (t == null) null
      else {
        val js = t.toString
        if (lastTree == null || lastJson != js) {
          lastJson = js
          lastTree = Kdb.fromJson(js)
        }
        lastTree
      }
    }

  private def dbl(e: Expression, input: InternalRow): java.lang.Double =
    e.eval(input) match {
      case null => null
      case n: java.lang.Number => n.doubleValue()
      case d: Decimal => d.toDouble
    }

  override def eval(input: InternalRow): Any = {
    val t = treeOf(input)
    if (t == null) return null
    val x0 = dbl(xmin, input); val y0 = dbl(ymin, input)
    val x1 = dbl(xmax, input); val y1 = dbl(ymax, input)
    if (x0 == null || y0 == null || x1 == null || y1 == null) return null
    val ids = Kdb.intersectingLeaves(t, Kdb.Rect(x0, y0, x1, y1)).map(_.id)
    new GenericArrayData(ids.toArray)
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(tree = newChildren(0), xmin = newChildren(1), ymin = newChildren(2),
      xmax = newChildren(3), ymax = newChildren(4))
}
