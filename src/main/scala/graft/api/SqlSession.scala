package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.functions.GraftFunctions

/** The engine's SQL entry point — the role of the reference's coordinator
  * dispatch path (SURVEY.md §3.1: QueuedStatementResource → parse → analyze
  * → plan), collapsed onto Catalyst: `sql(text)` returns a lazily-planned
  * DataFrame; Catalyst is the parser/analyzer/optimizer, our overlay
  * supplies reference-dialect function names and semantics knobs.
  *
  * Semantics configuration (SURVEY.md §7.4 hard parts):
  *  - duplicate map keys raise (spark.sql.mapKeyDedupPolicy=EXCEPTION,
  *    matching COMMON/block/DuplicateMapKeyException.java)
  *  - session timezone pinned UTC
  *  - custom function overlay registered (jaro_winkler_similarity,
  *    approx_set/merge_hll/hll_cardinality, cosine_similarity, …)
  *
  * Dialect notes: Spark SQL already accepts the bulk of the reference's
  * ANSI surface (date literals, INTERVAL, FILTER (WHERE), GROUPING SETS,
  * LATERAL, ||, 1-based element_at/subscripts). `Dialect.translate` shims
  * the residual function-name differences; full grammar translation
  * (UNNEST-as-relation, TRY(expr), GROUPS frames) is documented
  * out-of-scope for this layer.
  */
final class SqlSession private (val spark: SparkSession) {

  /** Run reference-dialect SQL; returns a lazily-planned DataFrame. */
  def sql(text: String): DataFrame = spark.sql(Dialect.translate(text))

  /** Register every fixture table under `dir` as a temp view. */
  def loadTables(dir: String): SqlSession = {
    Tables.registerAll(spark, dir)
    this
  }

  def table(name: String): DataFrame = spark.table(name)
}

object SqlSession {

  /** Wrap an existing SparkSession: set semantics knobs + function overlay
    * + graft optimizer rules (idempotent). */
  def wrap(spark: SparkSession): SqlSession = {
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    GraftFunctions.register(spark)
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.rules.CombineApproxPercentiles))
      spark.experimental.extraOptimizations =
        extra :+ graft.rules.CombineApproxPercentiles
    new SqlSession(spark)
  }

  /** Build a session from scratch (local default suitable for tests). */
  def create(master: String = "local[4]", shufflePartitions: Int = 4): SqlSession =
    wrap(SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
}

/** Textual shims for reference function names Spark spells differently.
  * Word-boundary, call-position replacement only (name followed by `(`),
  * case-insensitive. The text is first segmented into code vs quoted/comment
  * regions ('…' with '' escapes, "…" identifiers, `--` line and slash-star
  * block comments) — renames only ever touch code, so `SELECT 'call
  * arbitrary(x)'` keeps its literal intact. A 3-arg `strpos(s, sub, n)`
  * (occurrence variant — no Spark equivalent) raises a clear unsupported
  * error instead of silently renaming to 2-arg `instr` and failing analysis. */
object Dialect {

  private val renames: Seq[(String, String)] = Seq(
    "approx_distinct" -> "approx_count_distinct",
    "arbitrary" -> "any_value",
    "strpos" -> "instr",
    "json_extract_scalar" -> "get_json_object",
    "codepoint" -> "ascii",
    "to_unixtime" -> "unix_timestamp",
    "from_unixtime_ms" -> "timestamp_millis",
    // TRY(expr): general error→NULL wrapper (functions/TryExpression.scala);
    // \btry\b does not touch Spark's own try_* family (underscore = word char)
    "try" -> "try_expr",
    // reference date_format takes MySQL %-patterns, Spark's takes Java ones
    "date_format" -> "mysql_date_format",
    // KLL sketch family (reference KllSketchAggregationFunctions /
    // KllSketchFunctions) — our names carry the same arities
    "sketch_kll" -> "kll_sketch_agg",
    "sketch_kll_with_k" -> "kll_sketch_agg",
    "sketch_kll_quantile" -> "kll_quantile",
    "sketch_kll_rank" -> "kll_rank")

  /** (segment, isCode) spans covering the whole text in order. */
  private def segments(text: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val n = text.length
    var i = 0
    var start = 0
    def flushCode(end: Int): Unit =
      if (end > start) out += ((text.substring(start, end), true))
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\'' || c == '"') {
        flushCode(i)
        var j = i + 1
        var open = true
        while (j < n && open) {
          if (text.charAt(j) == c) {
            if (j + 1 < n && text.charAt(j + 1) == c) j += 2 // '' escape
            else { open = false; j += 1 }
          } else j += 1
        }
        out += ((text.substring(i, j), false)); i = j; start = j
      } else if (c == '-' && i + 1 < n && text.charAt(i + 1) == '-') {
        flushCode(i)
        var j = i
        while (j < n && text.charAt(j) != '\n') j += 1
        out += ((text.substring(i, j), false)); i = j; start = j
      } else if (c == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
        flushCode(i)
        val e = text.indexOf("*/", i + 2)
        val j = if (e < 0) n else e + 2
        out += ((text.substring(i, j), false)); i = j; start = j
      } else i += 1
    }
    flushCode(n)
    out.toSeq
  }

  /** Original text with non-code spans blanked — safe for paren matching. */
  private def masked(text: String): String =
    segments(text).map { case (seg, isCode) =>
      if (isCode) seg else " " * seg.length
    }.mkString

  private val strposCall = "(?i)\\bstrpos\\s*\\(".r

  /** Reject the 3-arg occurrence variant with a clear error (arity counted
    * on the masked text so commas in string literals don't miscount). */
  private def checkStrposArity(text: String): Unit = {
    val m = masked(text)
    strposCall.findAllMatchIn(m).foreach { hit =>
      var depth = 1
      var commas = 0
      var i = hit.end
      while (i < m.length && depth > 0) {
        m.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case ',' if depth == 1 => commas += 1
          case _ =>
        }
        i += 1
      }
      if (commas >= 2) throw new UnsupportedOperationException(
        "strpos(string, substring, instance) with an instance argument is not " +
          "supported by this engine; rewrite with 2-arg strpos/instr")
    }
  }

  /** Reference subscripts are 1-based `expr[i]` (ArraySubscriptOperator;
    * SURVEY §2.5 — Spark's `[]` is 0-based but element_at is 1-based and
    * also covers map keys, matching the reference's subscript on maps).
    * Single-level `ident[expr]` is rewritten; ARRAY[...] literal
    * constructors are left alone. */
  private val subscript =
    "(?i)\\b(?!array\\b)((?:[a-z_][a-z0-9_]*\\.)*[a-z_][a-z0-9_]*)\\s*\\[([^\\[\\]]+)\\]".r

  /** Match subscripts on the masked text (so brackets inside literals are
    * invisible) but splice replacement pieces from the original, keeping
    * literal index expressions like m['k'] intact. */
  private def rewriteSubscripts(original: String): String = {
    val m = masked(original)
    val sb = new StringBuilder
    var last = 0
    for (mt <- subscript.findAllMatchIn(m)) {
      sb.append(original.substring(last, mt.start))
      sb.append("element_at(")
        .append(original.substring(mt.start(1), mt.end(1)))
        .append(", ")
        .append(original.substring(mt.start(2), mt.end(2)))
        .append(")")
      last = mt.end
    }
    sb.append(original.substring(last))
    sb.toString
  }

  def translate(text: String): String = {
    checkStrposArity(text)
    segments(rewriteSubscripts(text)).map {
      case (seg, false) => seg
      case (seg, true) =>
        renames.foldLeft(seg) { case (t, (from, to)) =>
          t.replaceAll(s"(?i)\\b$from\\s*\\(", s"$to(")
        }
    }.mkString
  }
}
