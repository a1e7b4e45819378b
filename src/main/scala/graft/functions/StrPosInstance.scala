package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** strpos(string, substring, instance) — the reference's occurrence
  * variant (COMMON/…/StringFunctions.java stringPosition with the
  * instance argument): 1-based code-point position of the instance-th
  * occurrence, 0 when there is no such occurrence; negative instance
  * counts occurrences from the end; instance 0 raises. Successive
  * occurrences advance one code point past the previous match start, so
  * overlapping matches count (strpos('aaa', 'aa', 2) = 2), matching the
  * reference's scan. Empty substring returns 1 like 2-arg strpos. */
case class StrPosInstance(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "strpos"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"strpos expects (string, string, integral), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override protected def nullSafeEval(s: Any, sub: Any, inst: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    val pat = sub.asInstanceOf[UTF8String]
    val n = inst.asInstanceOf[Number].longValue()
    if (n == 0)
      throw new IllegalArgumentException("strpos: 'instance' must not be 0")
    if (pat.numChars() == 0) return 1L
    // collect occurrence start positions (code points) in scan order
    val occ = scala.collection.mutable.ArrayBuffer.empty[Int]
    var from = 0
    var idx = str.indexOf(pat, from)
    while (idx >= 0) {
      occ += idx
      from = idx + 1
      idx = str.indexOf(pat, from)
    }
    val k = math.abs(n)
    if (k > occ.length) 0L
    else if (n > 0) occ(k.toInt - 1) + 1L
    else occ(occ.length - k.toInt) + 1L
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
