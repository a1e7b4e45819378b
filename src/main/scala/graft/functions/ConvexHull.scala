package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** convex_hull_agg over point structs — the reference's geometry
  * convex-hull aggregation (geospatial/aggregation/ConvexHullAggregation
  * .java area) re-expressed as a mergeable Spark aggregate. The buffer
  * keeps raw points only up to a small cap, then collapses to its own
  * hull (the hull of a union is the hull of the partial hulls), so state
  * stays KB-bounded regardless of group size — the property that makes
  * the aggregate safe at 100 TB: partial hulls combine map-side and the
  * final merge touches at most cap points per partition, never the raw
  * point set. Output: the CCW hull ring (Andrew monotone chain, collinear
  * boundary points dropped) starting from the lexicographically smallest
  * vertex — deterministic for any partitioning.
  */
object ConvexHull {

  /** Max raw points buffered before collapsing to the running hull. */
  val Cap = 1024

  def hull(pts: Array[(Double, Double)]): Array[(Double, Double)] = {
    val s = pts.distinct.sortBy(p => (p._1, p._2))
    if (s.length <= 2) return s
    def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val lower = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- s) {
      while (lower.length >= 2 &&
        cross(lower(lower.length - 2), lower.last, p) <= 0) lower.remove(lower.length - 1)
      lower += p
    }
    val upper = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (p <- s.reverseIterator) {
      while (upper.length >= 2 &&
        cross(upper(upper.length - 2), upper.last, p) <= 0) upper.remove(upper.length - 1)
      upper += p
    }
    (lower.dropRight(1) ++ upper.dropRight(1)).toArray
  }
}

/** convex_hull_agg(point) → array<struct<x,y>> CCW hull ring. */
case class ConvexHullAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Double, Double)]] {

  private type Buf = scala.collection.mutable.ArrayBuffer[(Double, Double)]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "convex_hull_agg"

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty

  private def compact(buf: Buf): Buf =
    if (buf.length <= ConvexHull.Cap) buf
    else scala.collection.mutable.ArrayBuffer.from(ConvexHull.hull(buf.toArray))

  // child is either one point struct<x,y> per row (the Column API) or an
  // array of them (the SQL name feeds a geometry's full point list per row)
  private lazy val arrayInput: Boolean =
    child.dataType.isInstanceOf[ArrayType]

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf
    else if (arrayInput) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val r = arr.getStruct(i, 2)
          if (!r.isNullAt(0) && !r.isNullAt(1))
            buf += ((r.getDouble(0), r.getDouble(1)))
        }
        i += 1
      }
      compact(buf)
    } else {
      val r = v.asInstanceOf[InternalRow]
      if (r.isNullAt(0) || r.isNullAt(1)) buf
      else compact(buf += ((r.getDouble(0), r.getDouble(1))))
    }
  }

  override def merge(a: Buf, b: Buf): Buf = compact(a ++= b)

  override def eval(buf: Buf): Any = {
    val h = ConvexHull.hull(buf.toArray)
    new GenericArrayData(h.map { case (x, y) =>
      new GenericInternalRow(Array[Any](x, y))
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val c = compact(buf)
    val bb = ByteBuffer.allocate(4 + 16 * c.length)
    bb.putInt(c.length)
    c.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var i = 0
    while (i < n) { out += ((bb.getDouble, bb.getDouble)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): ConvexHullAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ConvexHullAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object ConvexHullAgg {
  def column(point: Column): Column =
    Bridge.column(ConvexHullAgg(Bridge.expression(point))
      .toAggregateExpression())
}
