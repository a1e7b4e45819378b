package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector kernels over float arrays (reference: cosine_similarity
  * MAIN/operator/scalar/MathFunctions.java:1710, l2_squared :1756, float dot
  * products :1853). Primitive loops over ArrayData — no per-element boxing,
  * no lambda dispatch — so the ANN inner loop stays at array-scan speed;
  * whole-stage codegen emits one static call per row. */
object VectorUtils {

  /** Mismatched dimensions are an error (the reference's vector functions
    * reject unequal lengths — MathFunctions.java checkCondition), never a
    * silently-truncated result. */
  private def sameDims(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vector dimensions must match: $n vs ${b.numElements()}")
    n
  }

  /** Double-precision dot product of two float vectors (sequential fold in
    * element order — bit-compatible with the HOF/oracle formulation). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = sameDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    sameDims(a, b)
    dotF(a, b) / (math.sqrt(dotF(a, a)) * math.sqrt(dotF(b, b)))
  }

  def l2SquaredF(a: ArrayData, b: ArrayData): Double = {
    val n = sameDims(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
}

sealed trait FloatVectorBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> arguments, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
}

/** cosine_similarity(array<float>, array<float>) → double. */
case class CosineSimilarity(left: Expression, right: Expression)
  extends FloatVectorBinary {
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtils.cosineF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtils.cosineF($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(array<float>, array<float>) → double. */
case class DotProduct(left: Expression, right: Expression)
  extends FloatVectorBinary {
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtils.dotF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtils.dotF($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_squared(array<float>, array<float>) → double. */
case class L2Squared(left: Expression, right: Expression)
  extends FloatVectorBinary {
  override def prettyName: String = "l2_squared"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorUtils.l2SquaredF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorUtils.l2SquaredF($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine_similarity(map<varchar,double>, map<varchar,double>) — the
  * reference's SPARSE-vector overload (MathFunctions.java:1712
  * mapCosineSimilarity): dot over shared keys / (‖l‖·‖r‖); a NULL map
  * value nulls the result (mapL2Norm:1884), an empty map yields NaN via
  * the zero norm — both mirrored. */
object MapCosine {
  def cosine(l: org.apache.spark.sql.catalyst.util.MapData,
      r: org.apache.spark.sql.catalyst.util.MapData): Any = {
    def norm(m: org.apache.spark.sql.catalyst.util.MapData): java.lang.Double = {
      var s = 0.0
      var i = 0
      while (i < m.numElements()) {
        if (m.valueArray().isNullAt(i)) return null
        val v = m.valueArray().getDouble(i)
        s += v * v
        i += 1
      }
      math.sqrt(s)
    }
    val nl = norm(l); val nr = norm(r)
    if (nl == null || nr == null) return null
    val rk = new java.util.HashMap[String, Double](r.numElements() * 2)
    var i = 0
    while (i < r.numElements()) {
      rk.put(r.keyArray().getUTF8String(i).toString,
        r.valueArray().getDouble(i))
      i += 1
    }
    var dot = 0.0
    i = 0
    while (i < l.numElements()) {
      val v = rk.get(l.keyArray().getUTF8String(i).toString)
      if (v != null) dot += l.valueArray().getDouble(i) * v.doubleValue()
      i += 1
    }
    dot / (nl * nr)
  }
}

case class MapCosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {
  private def isStrDouble(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrDouble(left.dataType) && isStrDouble(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cosine_similarity map form requires map<varchar,double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    MapCosine.cosine(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""Object mcRes = graft.functions.MapCosine$$.MODULE$$.cosine($a, $b);
         |if (mcRes == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) mcRes).doubleValue(); }
         |""".stripMargin)
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine_similarity with the reference's overload set: maps → sparse
  * kernel, arrays → the codegen'd dense float kernel. */
case class CosineDispatch(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  override lazy val replacement: Expression = left.dataType match {
    case _: org.apache.spark.sql.types.MapType =>
      MapCosineSimilarity(left, right)
    case _ => CosineSimilarity(left, right)
  }
  override def prettyName: String = "cosine_similarity"
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** width_bucket(x, bins array<double>) — the reference's explicit-bins
  * overload (MathFunctions.java:1667): binary search over ascending bins,
  * returns how many bins are <= x; probe-path validation (null / unsorted
  * / non-finite bins raise at the positions the search touches) mirrored
  * exactly. Spark's native 4-arg width_bucket keeps the uniform form. */
case class WidthBucketArray(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"width_bucket(x, bins) requires (double, array<double>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "width_bucket"
  override protected def nullSafeEval(x: Any, binsIn: Any): Any =
    WidthBucketArray.search(x.asInstanceOf[Double],
      binsIn.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.WidthBucketArray$$.MODULE$$.search($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WidthBucketArray {
  def search(operand: Double, bins: ArrayData): Long = {
    val n = bins.numElements()
    require(n > 0, "Bins cannot be an empty array")
    require(!operand.isNaN, "Operand cannot be NaN")
    var lower = 0
    var upper = n
    while (lower < upper) {
      val index = (lower + upper) / 2
      if (bins.isNullAt(lower) || bins.isNullAt(index) ||
        bins.isNullAt(upper - 1))
        throw new IllegalArgumentException("Bin values cannot be NULL")
      val bin = bins.getDouble(index)
      val lowerBin = bins.getDouble(lower)
      val upperBin = bins.getDouble(upper - 1)
      if (lowerBin > upperBin || lowerBin > bin || bin > upperBin)
        throw new IllegalArgumentException(
          "Bin values are not sorted in ascending order")
      if (!java.lang.Double.isFinite(bin) ||
        !java.lang.Double.isFinite(lowerBin) ||
        !java.lang.Double.isFinite(upperBin))
        throw new IllegalArgumentException("Bin values must be finite")
      if (operand < bin) upper = index else lower = index + 1
    }
    lower.toLong
  }
}
