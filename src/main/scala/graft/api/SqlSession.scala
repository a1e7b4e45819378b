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

  /** Wrap an existing SparkSession: set semantics knobs + function overlay. */
  def wrap(spark: SparkSession): SqlSession = {
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    GraftFunctions.register(spark)
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
  * case-insensitive — identifiers inside strings survive because the
  * shimmed names are uncommon as data. */
object Dialect {

  private val renames: Seq[(String, String)] = Seq(
    "approx_distinct" -> "approx_count_distinct",
    "arbitrary" -> "any_value",
    "strpos" -> "instr",
    "json_extract_scalar" -> "get_json_object",
    "codepoint" -> "ascii",
    "to_unixtime" -> "unix_timestamp",
    "from_unixtime_ms" -> "timestamp_millis")

  def translate(text: String): String =
    renames.foldLeft(text) { case (t, (from, to)) =>
      t.replaceAll(s"(?i)\\b$from\\s*\\(", s"$to(")
    }
}
