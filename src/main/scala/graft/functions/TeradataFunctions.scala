package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Teradata-compatibility functions (reference presto-teradata-functions/
  * …/TeradataStringFunctions.java + TeradataDateFunctions.java +
  * dateformat/DateFormatParser.java): `index`, `char2hexint`, and the
  * to_char/to_date/to_timestamp trio over the Teradata format element
  * vocabulary — YYYY, YY, MM, DD, HH24, HH, MI, SS, everything else
  * literal. The parser tokenizes longest-first (HH24 before HH, YYYY
  * before YY) exactly like the reference's ANTLR lexer. */
object TeradataFormat {

  private val tokens: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy", "YY" -> "yy", "MM" -> "MM", "DD" -> "dd",
    "HH24" -> "HH", "HH" -> "hh", "MI" -> "mm", "SS" -> "ss")

  /** Does the format use the Teradata element vocabulary? The reference's
    * tokenizer is case-insensitive (its own tests spell
    * 'yyyy/mm/dd hh24:mi:ss' lowercase), so any SINGLE-CASED format —
    * all-upper or all-lower — whose elements match is Teradata. Mixed case
    * marks a Java pattern: treating it as Teradata would hijack patterns
    * like yyyy-MM-dd'T'HH:mm:ss.SSS that reach the overridden
    * to_date/to_timestamp names from the DataFrame API. */
  def looksTeradata(fmt: String): Boolean = {
    val letters = fmt.filter(_.isLetter)
    val singleCased = letters.forall(_.isUpper) || letters.forall(_.isLower)
    val up = fmt.toUpperCase
    singleCased &&
      Seq("YYYY", "YY", "DD", "HH24", "HH", "MI", "SS").exists(up.contains)
  }

  /** Teradata format → java DateTimeFormatter pattern. Non-element
    * letters are single-quoted so they stay literal. */
  def toJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      // case-insensitive element match (reference lexer), literal case kept
      tokens.find { case (td, _) =>
        fmt.regionMatches(true, i, td, 0, td.length) } match {
        case Some((td, j)) => sb.append(j); i += td.length
        case None =>
          val c = fmt.charAt(i)
          if (c.isLetter) sb.append('\'').append(c).append('\'')
          else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }
}

/** char2hexint(varchar) → uppercase hex of the UTF-16BE encoding
  * (TeradataStringFunctions.java:109). */
case class Char2HexInt(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "char2hexint"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char2hexint expects varchar, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02X"))
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
