package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Precision-recall curve aggregates (reference
  * MAIN/operator/aggregation/PrecisionRecallAggregation.java + the five
  * ClassificationXxxAggregation subclasses): fixed `buckets`-bin weight
  * histograms over the [0,1] prediction domain, one for true outcomes and
  * one for false; every metric is a running-prefix scan over the merged
  * histograms. At bucket i (threshold i/buckets):
  *   TP = totalTrue − trueBelow, FN = trueBelow,
  *   FP = totalFalse − falseBelow, TN = falseBelow,
  * and emission stops once all true weight is below the threshold
  * (`totalTrue > runningTrue`), exactly like the reference's iterator.
  * State is 2·buckets doubles — KB-bounded, mergeable by element-wise
  * addition, so map-side partial aggregation holds at any scale. */
object PrecisionRecall {
  final case class Buf(var buckets: Int, var trueW: Array[Double],
      var falseW: Array[Double])

  def empty: Buf = Buf(0, Array.empty, Array.empty)

  def add(b: Buf, buckets: Int, outcome: Boolean, pred: Double,
      weight: Double): Buf = {
    if (pred < 0.0 || pred > 1.0)
      throw new IllegalArgumentException(
        "Prediction value must be between 0.0 and 1.0")
    if (weight < 0)
      throw new IllegalArgumentException("Weights must be non-negative")
    if (b.buckets == 0) {
      b.buckets = buckets
      b.trueW = new Array[Double](buckets)
      b.falseW = new Array[Double](buckets)
    } else if (b.buckets != buckets)
      throw new IllegalArgumentException("Bucket count must be constant")
    // bin of 1.0 clamps into the last bucket (reference MAX_…_FOR_HISTOGRAM)
    val i = math.min((pred * buckets).toInt, buckets - 1)
    if (outcome) b.trueW(i) += weight else b.falseW(i) += weight
    b
  }

  def merge(a: Buf, b: Buf): Buf = {
    if (b.buckets == 0) return a
    if (a.buckets == 0) return b
    if (a.buckets != b.buckets)
      throw new IllegalArgumentException("Bucket count must be constant")
    var i = 0
    while (i < a.buckets) {
      a.trueW(i) += b.trueW(i); a.falseW(i) += b.falseW(i); i += 1
    }
    a
  }

  /** One row per emitted bucket: (threshold, tp, fp, fn, tn, totT, totF). */
  def sweep(b: Buf): Seq[(Double, Double, Double, Double, Double, Double, Double)] = {
    if (b.buckets == 0) return Seq.empty
    val totT = b.trueW.sum
    val totF = b.falseW.sum
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Double, Double, Double, Double, Double, Double, Double)]
    var runT = 0.0
    var runF = 0.0
    var i = 0
    while (i < b.buckets && totT > runT) {
      val threshold = i.toDouble / b.buckets
      out += ((threshold, totT - runT, totF - runF, runT, runF, totT, totF))
      runT += b.trueW(i); runF += b.falseW(i)
      i += 1
    }
    out.toSeq
  }

  def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.buckets)
    bb.putInt(b.buckets)
    b.trueW.foreach(bb.putDouble)
    b.falseW.foreach(bb.putDouble)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val t = Array.fill(n)(bb.getDouble)
    val f = Array.fill(n)(bb.getDouble)
    Buf(n, t, f)
  }
}

/** classification_precision/recall/miss_rate/fall_out/thresholds
  * (buckets, outcome, pred[, weight]) → array<double>. `metric` selects
  * the per-bucket output. */
case class ClassificationMetricAgg(
  bucketsExpr: Expression,
  outcome: Expression,
  pred: Expression,
  weight: Option[Expression],
  metric: String,
  mutableAggBufferOffset: Int = 0,
  inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PrecisionRecall.Buf] {

  override def children: Seq[Expression] =
    Seq(bucketsExpr, outcome, pred) ++ weight

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = s"classification_$metric"

  override def checkInputDataTypes(): TypeCheckResult =
    (bucketsExpr.dataType, outcome.dataType, pred.dataType,
      weight.map(_.dataType)) match {
      case (ByteType | ShortType | IntegerType | LongType, BooleanType,
          DoubleType, None | Some(DoubleType)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, boolean, double[, double]), got $other")
    }

  override def createAggregationBuffer(): PrecisionRecall.Buf =
    PrecisionRecall.empty

  override def update(buf: PrecisionRecall.Buf,
      input: InternalRow): PrecisionRecall.Buf = {
    val b = bucketsExpr.eval(input)
    val o = outcome.eval(input)
    val p = pred.eval(input)
    val w = weight.map(_.eval(input)).getOrElse(1.0)
    if (b == null || o == null || p == null || w == null) buf
    else PrecisionRecall.add(buf, b.asInstanceOf[Number].intValue(),
      o.asInstanceOf[Boolean], p.asInstanceOf[Double],
      w.asInstanceOf[Double])
  }

  override def merge(a: PrecisionRecall.Buf,
      b: PrecisionRecall.Buf): PrecisionRecall.Buf = PrecisionRecall.merge(a, b)

  override def eval(buf: PrecisionRecall.Buf): Any = {
    val rows = PrecisionRecall.sweep(buf)
    val vals = metric match {
      case "precision" => rows.map { case (_, tp, fp, _, _, _, _) => tp / (tp + fp) }
      case "recall" => rows.map { case (_, tp, _, _, _, totT, _) => tp / totT }
      case "miss_rate" => rows.map { case (_, _, _, fn, _, totT, _) => fn / totT }
      case "fall_out" => rows.map { case (_, _, fp, _, _, _, totF) => fp / totF }
      case "thresholds" => rows.map(_._1)
    }
    new GenericArrayData(vals.toArray)
  }

  override def serialize(buf: PrecisionRecall.Buf): Array[Byte] =
    PrecisionRecall.serialize(buf)
  override def deserialize(bytes: Array[Byte]): PrecisionRecall.Buf =
    PrecisionRecall.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int): ClassificationMetricAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ClassificationMetricAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(bucketsExpr = c(0), outcome = c(1), pred = c(2),
      weight = if (c.length > 3) Some(c(3)) else None)
}
