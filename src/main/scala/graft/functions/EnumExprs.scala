package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Enum-type kernels (reference BigintEnumType / VarcharEnumType +
  * EnumCasts.java + LongEnumOperators/VarcharEnumOperators `enum_key`):
  * an enum is a named key→value map; casting a base value INTO the enum
  * validates membership (INVALID_CAST_ARGUMENT on miss), casting OUT is
  * identity, and enum_key reverse-maps a value to its key. Spark has no
  * user-defined SQL types, so enum values stay base-typed (bigint /
  * varchar) and the DEFINITION travels as a compact literal the dialect
  * splices at rewrite time (api/EnumTypes.scala) — the static-type
  * dispatch the reference does at analysis time happens in the rewrite
  * instead. */
object EnumRuntime {

  final class Def(
    val name: String,
    val isBigint: Boolean,
    val entries: Seq[(String, String)]) extends Serializable {
    val longValues: Set[Long] =
      if (isBigint) entries.map(_._2.toLong).toSet else Set.empty
    val strValues: Set[String] =
      if (isBigint) Set.empty else entries.map(_._2).toSet
    val keyOfLong: Map[Long, String] =
      if (isBigint) entries.map(e => e._2.toLong -> e._1).toMap else Map.empty
    val keyOfStr: Map[String, String] =
      if (isBigint) Map.empty else entries.map(e => e._2 -> e._1).toMap
  }

  /** length-prefixed codec (no delimiter collisions with user keys). */
  def encode(name: String, isBigint: Boolean,
      entries: Seq[(String, String)]): String = {
    val sb = new StringBuilder
    def w(s: String): Unit = { sb.append(s.length).append(':').append(s) }
    w(name); w(if (isBigint) "b" else "v"); w(entries.size.toString)
    entries.foreach { case (k, v) => w(k); w(v) }
    java.util.Base64.getEncoder.encodeToString(
      sb.toString.getBytes("UTF-8"))
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Def]()

  def decode(b64: String): Def = {
    val hit = cache.get(b64)
    if (hit != null) return hit
    val s = new String(java.util.Base64.getDecoder.decode(b64), "UTF-8")
    var pos = 0
    def r(): String = {
      val colon = s.indexOf(':', pos)
      val len = s.substring(pos, colon).toInt
      val out = s.substring(colon + 1, colon + 1 + len)
      pos = colon + 1 + len
      out
    }
    val name = r(); val kind = r(); val n = r().toInt
    val entries = (0 until n).map(_ => (r(), r()))
    val d = new Def(name, kind == "b", entries)
    cache.putIfAbsent(b64, d)
    d
  }

  // ---- codegen entry points (EnumCasts.java / *EnumOperators.java)
  def castLong(d: Def, v: Long): Long =
    if (d.longValues.contains(v)) v
    else throw new IllegalArgumentException(
      s"No value '$v' in enum '${d.name}'")
  def castStr(d: Def, v: UTF8String): UTF8String =
    if (d.strValues.contains(v.toString)) v
    else throw new IllegalArgumentException(
      s"No value '$v' in enum '${d.name}'")
  def keyLong(d: Def, v: Long): UTF8String = d.keyOfLong.get(v) match {
    case Some(k) => UTF8String.fromString(k)
    case None => throw new IllegalArgumentException(
      s"No value '$v' in enum type ${d.name}")
  }
  def keyStr(d: Def, v: UTF8String): UTF8String =
    d.keyOfStr.get(v.toString) match {
      case Some(k) => UTF8String.fromString(k)
      case None => throw new IllegalArgumentException(
        s"No value '$v' in enum type ${d.name}")
    }
}

/** CAST(x AS <enum>) — membership-validated identity (EnumCasts.java
  * castVarcharToEnum / the long twin). Output is the base type. */
case class EnumCast(defB64: String, child: Expression)
  extends UnaryExpression {
  @transient private lazy val d = EnumRuntime.decode(defB64)
  override def prettyName: String = "enum_cast"
  override def dataType: DataType =
    if (EnumRuntime.decode(defB64).isBigint) LongType else StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType
      if EnumRuntime.decode(defB64).isBigint => TypeCheckResult.TypeCheckSuccess
    case StringType if !EnumRuntime.decode(defB64).isBigint =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"Cannot cast ${other.simpleString} to enum " +
        s"${EnumRuntime.decode(defB64).name} (" +
        (if (EnumRuntime.decode(defB64).isBigint) "bigint" else "varchar") +
        " enum)")
  }
  override protected def nullSafeEval(v: Any): Any =
    if (d.isBigint)
      EnumRuntime.castLong(d, v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
      })
    else EnumRuntime.castStr(d, v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("enumDef", d,
      "graft.functions.EnumRuntime.Def")
    if (d.isBigint)
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.EnumRuntime$$.MODULE$$.castLong($ref, (long)($c))")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.EnumRuntime$$.MODULE$$.castStr($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** enum_key(<enum>, value) → varchar key for a value
  * (LongEnumOperators.java:158 / VarcharEnumOperators). The enum is named
  * by its first argument in SQL (the reference reads it from the static
  * type, which Spark doesn't carry). */
case class EnumKey(defB64: String, child: Expression)
  extends UnaryExpression {
  @transient private lazy val d = EnumRuntime.decode(defB64)
  override def prettyName: String = "enum_key"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType
      if EnumRuntime.decode(defB64).isBigint => TypeCheckResult.TypeCheckSuccess
    case StringType if !EnumRuntime.decode(defB64).isBigint =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"enum_key: ${other.simpleString} does not match enum " +
        EnumRuntime.decode(defB64).name)
  }
  override protected def nullSafeEval(v: Any): Any =
    if (d.isBigint)
      EnumRuntime.keyLong(d, v match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
      })
    else EnumRuntime.keyStr(d, v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("enumDef", d,
      "graft.functions.EnumRuntime.Def")
    if (d.isBigint)
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.EnumRuntime$$.MODULE$$.keyLong($ref, (long)($c))")
    else
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.EnumRuntime$$.MODULE$$.keyStr($ref, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
