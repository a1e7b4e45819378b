package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Changelog application (CDC) — the reference's `apply_changelog`
  * aggregate (presto-iceberg/.../function/changelog/
  * ApplyChangelogFunction.java), which folds an Iceberg changelog scan
  * (INSERT / UPDATE_BEFORE / UPDATE_AFTER / DELETE records with a commit
  * ordinal) down to the latest surviving row per key.
  *
  * Spark-first shape: one hash aggregation keyed by the row key, with the
  * custom mergeable ApplyChangelog aggregate (functions/
  * ApplyChangelog.scala) as the fold. No sort and no window: partials
  * combine map-side, so at 100 TB applying a billion-record changelog is
  * a single key-partitioned shuffle whose state is one record per key —
  * the same cost profile as a count(*) by key.
  */
object Cdc {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** DataFrame operator: fold `log` (ordinal, operation, payload struct)
    * to the latest surviving payload per key. Deleted keys yield a NULL
    * payload row (callers drop or keep them — the reference keeps NULL). */
  def applyChangelog(log: DataFrame, keyCols: Seq[String], ordCol: String,
      opCol: String, rowCol: String): DataFrame =
    log.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.ApplyChangelog.column(
        col(ordCol), col(opCol), col(rowCol)).as("row"))

  /** Gate: synthesize a deterministic changelog from orders — every key
    * is inserted at ordinal 1; keys %3=0 get an UPDATE_BEFORE/AFTER pair
    * (ordinals 2/3, price doubled); keys %5=0 are deleted at ordinal 4.
    * The SQL text drives the registered aggregate name through the
    * dialect; the oracle replays the fold's closed form. */
  def gateApplyChangelog(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_cdc")
    graft.api.SqlSession.wrap(s).sql(
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p
        |    FROM orders_cdc WHERE o_orderkey <= 600),
        |log AS (
        |  SELECT k, CAST(1 AS BIGINT) AS ord, 'INSERT' AS op,
        |    named_struct('price', p, 'status', 'O') AS rec FROM o
        |  UNION ALL
        |  SELECT k, CAST(2 AS BIGINT), 'UPDATE_BEFORE',
        |    named_struct('price', p, 'status', 'O') FROM o WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k, CAST(3 AS BIGINT), 'UPDATE_AFTER',
        |    named_struct('price', p * 2, 'status', 'U') FROM o WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k, CAST(4 AS BIGINT), 'DELETE',
        |    named_struct('price', p, 'status', 'O') FROM o WHERE k % 5 = 0)
        |SELECT k, r.price AS price, r.status AS status,
        |  r IS NULL AS deleted
        |FROM (SELECT k, apply_changelog(ord, op, rec) AS r
        |      FROM log GROUP BY k)
        |ORDER BY k""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_apply_changelog" -> gateApplyChangelog)

  val oracle: Map[String, String] = Map(
    "cdc_apply_changelog" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p
        |    FROM orders WHERE o_orderkey <= 600)
        |SELECT k,
        |  CASE WHEN k % 5 = 0 THEN NULL
        |       WHEN k % 3 = 0 THEN p * 2 ELSE p END AS price,
        |  CASE WHEN k % 5 = 0 THEN NULL
        |       WHEN k % 3 = 0 THEN 'U' ELSE 'O' END AS status,
        |  (k % 5 = 0) AS deleted
        |FROM o ORDER BY k""".stripMargin)
}
