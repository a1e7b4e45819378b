package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** url_encode / url_decode (reference: MAIN/operator/scalar/UrlFunctions
  * .java:149-175 — form-parameter escaping on encode, URLDecoder semantics
  * on decode).
  *
  * Encode keeps `[A-Za-z0-9]` and `-_.*` literal, writes space as `+`, and
  * percent-encodes every other UTF-8 byte as uppercase %XX. Decode reverses
  * both conventions and rejects malformed/truncated escapes with an error
  * (never a silent pass-through). Both are byte-level loops over the UTF-8
  * representation — no regex, no per-char boxing — and stay inside
  * whole-stage codegen via one static call per row. */
object UrlCodecUtils {
  private val HexUpper = "0123456789ABCDEF".getBytes
  private def isSafe(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '_' || b == '.' || b == '*'

  def encode(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new java.io.ByteArrayOutputStream(in.length + 8)
    var i = 0
    while (i < in.length) {
      val b = in(i)
      if (isSafe(b)) out.write(b)
      else if (b == ' ') out.write('+')
      else {
        out.write('%')
        out.write(HexUpper((b >> 4) & 0xF))
        out.write(HexUpper(b & 0xF))
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  private def hexVal(b: Byte): Int = b match {
    case d if d >= '0' && d <= '9' => d - '0'
    case h if h >= 'a' && h <= 'f' => h - 'a' + 10
    case h if h >= 'A' && h <= 'F' => h - 'A' + 10
    case other => throw new IllegalArgumentException(
      s"url_decode: illegal hex character '${other.toChar}' in escape pattern")
  }

  def decode(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    while (i < in.length) {
      in(i) match {
        case '+' => out.write(' '); i += 1
        case '%' =>
          if (i + 2 >= in.length)
            throw new IllegalArgumentException(
              "url_decode: incomplete trailing escape (%) pattern")
          out.write(((hexVal(in(i + 1)) << 4) | hexVal(in(i + 2))).toByte)
          i += 3
        case b => out.write(b); i += 1
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

sealed trait UrlCodecExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
    : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires varchar, got ${other.simpleString}")
    }
}

case class UrlEncode(child: Expression) extends UrlCodecExpr {
  override def prettyName: String = "url_encode"
  override protected def nullSafeEval(v: Any): Any =
    UrlCodecUtils.encode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCodecUtils.encode($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class UrlDecode(child: Expression) extends UrlCodecExpr {
  override def prettyName: String = "url_decode"
  override protected def nullSafeEval(v: Any): Any =
    UrlCodecUtils.decode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCodecUtils.decode($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
