package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's SQL-invoked string helpers (StringSqlFunctions.java):
  * replace_first, trail, split_part_reverse — macro expansions over
  * builtins, composed the same way here. */
object StringExtras {

  /** replace_first(str, search, replace) — :27: only the first occurrence. */
  def replaceFirst(str: Column, search: Column, replacement: Column): Column = {
    val pos = locate_col(search, str)
    when(replacement.isNull, lit(null).cast("string"))
      .when(pos === 0, str)
      .otherwise(concat(
        substring(str, lit(1), pos - 1),
        replacement,
        substring(str, pos + length(search), length(str))))
  }

  // locate with Column pattern (functions.locate takes a String literal)
  private def locate_col(substr: Column, str: Column): Column =
    call_function("locate", substr, str)

  /** trail(str, n): last n characters — :36. */
  def trail(str: Column, n: Column): Column =
    reverse(reverse(str).substr(lit(1), n))

  /** split_part_reverse(str, delim, idx): 1-based from start, negative from
    * the end — :45 (ELEMENT_AT over SPLIT). Literal (non-regex) delimiter. */
  def splitPartReverse(str: Column, delim: String, idx: Column): Column =
    element_at(split(str, java.util.regex.Pattern.quote(delim)), idx)

  /** Column-delimiter variant for the SQL registration (\Q..\E quoting =
    * the same literal-delimiter contract); |idx| beyond the part count is
    * NULL like the reference's element_at, under ANSI sessions too. */
  def splitPartReverse(str: Column, delim: Column, idx: Column): Column = {
    val parts = call_function("split", str,
      concat(lit("\\Q"), delim, lit("\\E")))
    when(abs(idx) > size(parts), lit(null).cast("string"))
      .otherwise(element_at(parts, idx.cast("int")))
  }
}
