package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** array_cum_sum (reference MAIN/operator/scalar/ArrayCumSum.java):
  * prefix sums in the element's own type; a NULL element makes every
  * position from it onward NULL (first element NULL → all NULL), exactly
  * the reference's early-break loop. Integer overflow raises like the
  * reference's checked ADD operator. One O(n) pass per row. */
case class ArrayCumSum(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"array_cum_sum requires an array of a numeric type, got " +
        child.dataType.simpleString)
  }

  override def dataType: DataType =
    ArrayType(elemType, containsNull = true)
  override def prettyName: String = "array_cum_sum"

  override protected def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[ArrayData]
    val n = in.numElements()
    val out = new Array[Any](n)
    val et = elemType
    var i = 0
    var broken = false
    var accL = 0L
    var accD = 0.0
    var accDec: java.math.BigDecimal = java.math.BigDecimal.ZERO
    while (i < n) {
      if (broken || in.isNullAt(i)) { broken = true; out(i) = null }
      else {
        et match {
          case LongType =>
            accL = Math.addExact(accL, in.getLong(i)); out(i) = accL
          case IntegerType =>
            accL = Math.addExact(accL.toInt, in.getInt(i)).toLong
            out(i) = accL.toInt
          case ShortType =>
            val s2 = accL.toInt + in.getShort(i)
            if (s2 < Short.MinValue || s2 > Short.MaxValue)
              throw new ArithmeticException("smallint addition overflow")
            accL = s2.toLong; out(i) = s2.toShort
          case ByteType =>
            val b2 = accL.toInt + in.getByte(i)
            if (b2 < Byte.MinValue || b2 > Byte.MaxValue)
              throw new ArithmeticException("tinyint addition overflow")
            accL = b2.toLong; out(i) = b2.toByte
          case DoubleType => accD += in.getDouble(i); out(i) = accD
          case FloatType =>
            accD += in.getFloat(i); out(i) = accD.toFloat
          case d: DecimalType =>
            accDec = accDec.add(
              in.get(i, d).asInstanceOf[Decimal].toJavaBigDecimal)
            out(i) = Decimal(accDec, d.precision, d.scale)
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** normalize(string[, form]) (reference StringFunctions.java normalize):
  * Unicode normalization, default NFC; form is one of NFC/NFD/NFKC/NFKD
  * (case-sensitive literal, invalid form raises like the reference). */
case class UnicodeNormalize(str: Expression, form: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(str, form)
  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType.isInstanceOf[StringType] &&
        form.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "normalize requires string arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "normalize"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = str.eval(input)
    val f = form.eval(input)
    if (s == null || f == null) return null
    val formName = f.toString
    val nf =
      try java.text.Normalizer.Form.valueOf(formName)
      catch {
        case _: IllegalArgumentException => throw new IllegalArgumentException(
          s"Normalization form must be one of [NFD, NFC, NFKD, NFKC]: $formName")
      }
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, nf))
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(str = newChildren(0), form = newChildren(1))
}
