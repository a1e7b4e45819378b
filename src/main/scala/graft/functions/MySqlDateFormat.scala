package graft.functions

/** MySQL → Java datetime format-string translation (the reference's
  * date_format/date_parse use MySQL patterns — DateTimeFunctions.java
  * `%`-specifiers — while Spark's date_format takes Java patterns; SURVEY
  * §2.5 flags the shim). Foldable formats translate once at plan time and
  * execute as Spark's codegen'd date_format; non-foldable (per-row) formats
  * go through `MySqlPatternToJava` below, which applies the same translation
  * per row. */
object MySqlFormat {

  private val map: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy",
    'm' -> "MM", 'c' -> "M",
    'd' -> "dd", 'e' -> "d",
    'H' -> "HH", 'k' -> "H", 'h' -> "hh", 'I' -> "hh", 'l' -> "h",
    'i' -> "mm", 's' -> "ss", 'S' -> "ss",
    'f' -> "SSSSSS",
    'W' -> "EEEE", 'a' -> "EEE",
    'b' -> "MMM", 'M' -> "MMMM",
    'j' -> "DDD",
    'T' -> "HH:mm:ss",
    'r' -> "hh:mm:ss a",
    'p' -> "a")

  /** Translate a MySQL format string to the Java pattern Spark understands.
    * Literal text (anything not behind `%`) is single-quoted so letters
    * survive; `%%` is a literal percent. Unsupported specifiers raise. */
  def toJava(mysql: String): String = {
    val out = new StringBuilder
    var i = 0
    def literal(s: String): Unit =
      if (s.nonEmpty) {
        if (s.exists(_.isLetter) || s.contains("'"))
          out.append("'").append(s.replace("'", "''")).append("'")
        else out.append(s)
      }
    val lit = new StringBuilder
    while (i < mysql.length) {
      val c = mysql.charAt(i)
      if (c == '%' && i + 1 < mysql.length) {
        val spec = mysql.charAt(i + 1)
        if (spec == '%') { lit.append('%'); i += 2 }
        else map.get(spec) match {
          case Some(java) =>
            literal(lit.toString); lit.clear()
            out.append(java)
            i += 2
          case None => throw new IllegalArgumentException(
            s"unsupported date_format specifier %$spec in '$mysql'")
        }
      } else { lit.append(c); i += 1 }
    }
    literal(lit.toString)
    out.toString
  }
}

/** Per-row MySQL→Java pattern conversion for a NON-literal format argument
  * (the reference accepts format expressions; the literal case folds at
  * plan time instead and keeps DateFormatClass's cached formatter). */
case class MySqlPatternToJava(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "mysql_pattern_to_java"
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override protected def nullSafeEval(v: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      MySqlFormat.toJava(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
