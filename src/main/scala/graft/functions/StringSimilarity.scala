package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the string-similarity expressions. Kept as plain
  * static-shaped methods so whole-stage codegen emits a single call
  * (the same pattern Spark's own Levenshtein uses via UTF8String). */
object StringSimUtils {

  private[functions] def requireStrings(
    name: String, exprs: Expression*): TypeCheckResult =
    if (exprs.forall(_.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires string arguments, got " +
        exprs.map(_.dataType.simpleString).mkString(", "))

  /** Jaro-Winkler similarity, standard parameters (scaling 0.1, max prefix
    * 4, boost threshold 0.7; empty input → 0.0) — matches the reference's
    * jarowinkler_similarity (MAIN/operator/scalar/StringFunctions.java:760)
    * and the DuckDB oracle bit-for-bit. */
  def jaroWinkler(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t / 2).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxP = math.min(4, math.min(la, lb))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Hamming distance over equal-length strings, compared by Unicode code
    * point (not UTF-16 code unit — surrogate pairs count as one position,
    * matching the reference's code-point iteration in StringFunctions.java
    * hamming_distance); unequal lengths are an error in both the reference
    * and DuckDB. */
  def hamming(l: UTF8String, r: UTF8String): Long = {
    val a = l.toString
    val b = r.toString
    var d = 0L
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) d += 1
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    if (i < a.length || j < b.length)
      throw new IllegalArgumentException(
        "hamming_distance requires equal-length strings (" +
          s"${a.codePointCount(0, a.length)} vs ${b.codePointCount(0, b.length)} code points)")
    d
  }
}

/** jaro_winkler_similarity(varchar, varchar) → double. Null-safe binary
  * expression; whole-stage codegen emits one static call. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    StringSimUtils.requireStrings(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StringSimUtils.jaroWinkler(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimUtils.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** hamming_distance(varchar, varchar) → bigint. */
case class HammingDistance(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    StringSimUtils.requireStrings(prettyName, left, right)
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_distance"
  override protected def nullSafeEval(l: Any, r: Any): Any =
    StringSimUtils.hamming(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSimUtils.hamming($a, $b)")
  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
