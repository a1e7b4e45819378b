package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, HigherOrderFunction, LambdaFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** regexp_replace(subject, pattern, x -> …) — the reference's
  * lambda-variant regex replace (operator/scalar/
  * JoniRegexpReplaceLambdaFunction.java:44): for every match the lambda
  * receives the array of capture groups (1..groupCount, NULL for a
  * non-participating group) and returns the replacement text. A NULL
  * lambda result makes the whole result NULL (replacing with unknown is
  * unknown). Zero-width matches advance one character, so `''` between
  * every char behaves like the reference. Per-row codegen'd lambda body;
  * the pattern compiles once when foldable. */
case class RegexpReplaceLambda(
  subject: Expression,
  regexp: Expression,
  function: Expression)
  extends HigherOrderFunction with CodegenFallback {

  override def arguments: Seq[Expression] = Seq(subject, regexp)
  override def argumentTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def functions: Seq[Expression] = Seq(function)
  override def functionTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_replace"

  override def children: Seq[Expression] = Seq(subject, regexp, function)

  override def bindInternal(
    f: (Expression, Seq[(DataType, Boolean)]) => LambdaFunction): RegexpReplaceLambda =
    copy(function =
      f(function, Seq((ArrayType(StringType, containsNull = true), false))))

  @transient private lazy val groupsVar: NamedLambdaVariable =
    function.asInstanceOf[LambdaFunction]
      .arguments.head.asInstanceOf[NamedLambdaVariable]

  @transient private lazy val lambdaForEval: Expression = functionsForEval.head

  @transient private lazy val foldedPattern: java.util.regex.Pattern =
    if (regexp.foldable) {
      val p = regexp.eval(null)
      if (p == null) null else java.util.regex.Pattern.compile(p.toString)
    } else null

  override def eval(input: InternalRow): Any = {
    val s = subject.eval(input)
    if (s == null) return null
    val p = if (regexp.foldable) foldedPattern else {
      val pv = regexp.eval(input)
      if (pv == null) null else java.util.regex.Pattern.compile(pv.toString)
    }
    if (p == null) return null
    val src = s.toString
    val m = p.matcher(src)
    if (!m.find(0)) return s

    val sb = new java.lang.StringBuilder(src.length)
    var appendPos = 0
    var found = true
    while (found) {
      // zero-width match: step past one character so the scan advances
      // (JoniRegexpReplaceLambdaFunction.java:67-73)
      val nextStart = if (m.end == m.start) m.end + 1 else m.end
      sb.append(src, appendPos, m.start)
      appendPos = m.end
      val n = m.groupCount
      val groups = new Array[Any](n)
      var i = 1
      while (i <= n) {
        val g = m.group(i)
        groups(i - 1) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      groupsVar.value.set(new GenericArrayData(groups))
      val replaced = lambdaForEval.eval(input)
      if (replaced == null) return null
      sb.append(replaced.toString)
      found = nextStart <= src.length && m.find(nextStart)
    }
    sb.append(src, appendPos, src.length)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
    newChildren: IndexedSeq[Expression]): Expression =
    copy(subject = newChildren(0), regexp = newChildren(1),
      function = newChildren(2))
}
