package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.SqlSession

/** Correctness gates for the DDL / catalog statement surface
  * (api/DdlStatements.scala) — the reference coordinator's
  * CreateViewTask / CreateTableTask / insert plan / RenameTableTask and
  * the ShowQueriesRewrite / ShowStatsRewrite catalog queries, driven
  * end-to-end through SqlSession exactly as a user would. */
object Ddl {

  private def ses(s: SparkSession, dir: String, tables: String*): SqlSession = {
    val x = SqlSession.wrap(s)
    tables.foreach(n => Tables(s, dir, n).createOrReplaceTempView(n))
    x
  }

  /** Full object lifecycle: a view over an aggregate, CTAS of half the
    * view, INSERT of the other half (positional, type-coerced), RENAME,
    * then a query joining the written table back to a dimension. The
    * written table is real parquet — the final join scans it with
    * pushdown/pruning like any source table. */
  def lifecycle(s: SparkSession, dir: String): DataFrame = {
    val q = ses(s, dir, "orders", "customer")
    q.sql("DROP TABLE IF EXISTS ddl_spend")
    q.sql("DROP TABLE IF EXISTS ddl_top_t")
    q.sql("DROP VIEW IF EXISTS ddl_rev_v")
    q.sql("""CREATE VIEW ddl_rev_v AS
      |SELECT o_custkey AS custkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_custkey""".stripMargin)
    q.sql("CREATE TABLE ddl_top_t AS SELECT * FROM ddl_rev_v WHERE custkey % 4 = 0")
    q.sql("INSERT INTO ddl_top_t SELECT * FROM ddl_rev_v WHERE custkey % 4 = 1")
    q.sql("ALTER TABLE ddl_top_t RENAME TO ddl_spend")
    q.sql("""SELECT c_mktsegment, count(*) AS n_cust,
      |  CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS total_rev,
      |  CAST(SUM(n_orders) AS BIGINT) AS total_orders
      |FROM ddl_spend JOIN customer ON custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** SHOW COLUMNS (ShowQueriesRewrite.java visitShowColumns) with
    * reference type spellings (varchar/integer/…). */
  def showColumns(s: SparkSession, dir: String): DataFrame =
    ses(s, dir, "nation").sql("SHOW COLUMNS FROM nation")
      .orderBy("column_name")

  /** SHOW STATS FOR t (ShowStatsRewrite.java): exact one-pass per-column
    * statistics + the row_count summary row. */
  def showStats(s: SparkSession, dir: String): DataFrame =
    ses(s, dir, "nation").sql("SHOW STATS FOR nation")
      .orderBy(col("column_name").asc_nulls_last)

  /** SHOW FUNCTIONS LIKE pattern over the session registry — pinned on the
    * classification_* aggregate family (stable, graft-registered). */
  def showFunctions(s: SparkSession, dir: String): DataFrame =
    ses(s, dir).sql("SHOW FUNCTIONS LIKE 'classification_%'")
      .orderBy("function_name")

  /** DCL lifecycle (api/AccessControl.scala — the reference's CREATE/DROP
    * ROLE, GRANT/REVOKE, SET ROLE, SHOW GRANTS statement family): role
    * hierarchy + user/role privilege grants, surfaced through the
    * reference's 10-column SHOW GRANTS shape. Deterministic: state is
    * reset, then rebuilt by the scripted statements. */
  def dcl(s: SparkSession, dir: String): DataFrame = {
    graft.api.AccessControl.reset(s)
    val q = ses(s, dir)
    q.sql("CREATE ROLE analyst")
    q.sql("CREATE ROLE reader")
    q.sql("GRANT reader TO ROLE analyst")
    q.sql("GRANT analyst TO USER graft")
    q.sql("GRANT SELECT ON lineitem TO ROLE reader")
    q.sql("GRANT SELECT, DELETE ON orders TO USER graft WITH GRANT OPTION")
    q.sql("GRANT ALL PRIVILEGES ON nation TO analyst")
    q.sql("REVOKE DELETE ON orders FROM USER graft")
    q.sql("SHOW GRANTS")
  }

  /** system.runtime.nodes (reference NodesSystemTable.java) — the
    * deterministic columns of the coordinator row; the dynamic registry
    * table system.runtime.queries + kill_query are SystemTablesSpec. */
  def runtimeNodes(s: SparkSession, dir: String): DataFrame =
    ses(s, dir).sql(
      """SELECT node_id, node_version, coordinator, state
        |FROM system.runtime.nodes""".stripMargin)

  /** information_schema.columns (InformationSchemaMetadata.java:63-66;
    * ANSI shape, reference type spellings) — pinned on nation. The
    * .tables relation and dynamic listings are DdlSpec. */
  def infoSchemaColumns(s: SparkSession, dir: String): DataFrame =
    ses(s, dir, "nation").sql(
      """SELECT table_name, column_name, ordinal_position, is_nullable,
        |  data_type
        |FROM information_schema.columns
        |WHERE table_name = 'nation' ORDER BY ordinal_position""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sys_info_schema_cols" -> infoSchemaColumns,
    "sys_runtime_nodes" -> runtimeNodes,
    "sql_dcl_grants" -> dcl,
    "sql_ddl_lifecycle" -> lifecycle,
    "sql_show_columns" -> showColumns,
    "sql_show_stats" -> showStats,
    "sql_show_functions" -> showFunctions)

  val oracle: Map[String, String] = Map(
    "sys_info_schema_cols" ->
      """SELECT * FROM (VALUES
        | ('nation', 'n_nationkey', CAST(1 AS BIGINT), 'YES', 'integer'),
        | ('nation', 'n_name', CAST(2 AS BIGINT), 'YES', 'varchar'),
        | ('nation', 'n_regionkey', CAST(3 AS BIGINT), 'YES', 'integer')
        |) AS t(table_name, column_name, ordinal_position, is_nullable,
        |  data_type)
        |ORDER BY ordinal_position""".stripMargin,
    "sys_runtime_nodes" ->
      """SELECT 'graft-coordinator' AS node_id,
        |  'graft-spark' AS node_version,
        |  true AS coordinator, 'active' AS state""".stripMargin,
    "sql_dcl_grants" ->
      """SELECT * FROM (VALUES
        | ('graft', 'USER', 'reader', 'ROLE', 'graft', 'default',
        |  'lineitem', 'SELECT', 'NO', 'NO'),
        | ('graft', 'USER', 'analyst', 'ROLE', 'graft', 'default',
        |  'nation', 'ALL', 'NO', 'NO'),
        | ('graft', 'USER', 'graft', 'USER', 'graft', 'default',
        |  'orders', 'SELECT', 'YES', 'NO')
        |) AS t("Grantor", "Grantor Type", "Grantee", "Grantee Type",
        |  "Catalog", "Schema", "Table", "Privilege", "Grantable",
        |  "With Hierarchy")""".stripMargin,
    "sql_ddl_lifecycle" ->
      """WITH rev AS (
        | SELECT o_custkey AS custkey,
        |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev,
        |   count(*) AS n_orders
        | FROM orders GROUP BY o_custkey),
        |spend AS (
        | SELECT * FROM rev WHERE custkey % 4 = 0
        | UNION ALL
        | SELECT * FROM rev WHERE custkey % 4 = 1)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(SUM(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS total_rev,
        |  CAST(SUM(n_orders) AS BIGINT) AS total_orders
        |FROM spend JOIN customer ON custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "sql_show_columns" ->
      """SELECT * FROM (VALUES
        | ('n_name', 'varchar', '', ''),
        | ('n_nationkey', 'integer', '', ''),
        | ('n_regionkey', 'integer', '', '')
        |) AS t(column_name, data_type, extra, comment)
        |ORDER BY column_name""".stripMargin,
    "sql_show_stats" ->
      """SELECT * FROM (
        | SELECT 'n_name' AS column_name,
        |   CAST(SUM(length(n_name)) AS DOUBLE) AS data_size,
        |   CAST(COUNT(DISTINCT n_name) AS DOUBLE) AS distinct_values_count,
        |   CAST(SUM(CASE WHEN n_name IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |     / count(*) AS nulls_fraction,
        |   CAST(NULL AS DOUBLE) AS row_count,
        |   CAST(min(n_name) AS VARCHAR) AS low_value,
        |   CAST(max(n_name) AS VARCHAR) AS high_value
        | FROM nation
        | UNION ALL
        | SELECT 'n_nationkey', CAST(NULL AS DOUBLE),
        |   CAST(COUNT(DISTINCT n_nationkey) AS DOUBLE),
        |   CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |     / count(*),
        |   CAST(NULL AS DOUBLE),
        |   CAST(min(n_nationkey) AS VARCHAR), CAST(max(n_nationkey) AS VARCHAR)
        | FROM nation
        | UNION ALL
        | SELECT 'n_regionkey', CAST(NULL AS DOUBLE),
        |   CAST(COUNT(DISTINCT n_regionkey) AS DOUBLE),
        |   CAST(SUM(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |     / count(*),
        |   CAST(NULL AS DOUBLE),
        |   CAST(min(n_regionkey) AS VARCHAR), CAST(max(n_regionkey) AS VARCHAR)
        | FROM nation
        | UNION ALL
        | SELECT CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |   CAST(count(*) AS DOUBLE),
        |   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
        | FROM nation
        |) ORDER BY column_name NULLS LAST""".stripMargin,
    "sql_show_functions" ->
      """SELECT * FROM (VALUES
        | ('classification_fall_out'),
        | ('classification_miss_rate'),
        | ('classification_precision'),
        | ('classification_recall'),
        | ('classification_thresholds')
        |) AS t(function_name) ORDER BY function_name""".stripMargin)
}
