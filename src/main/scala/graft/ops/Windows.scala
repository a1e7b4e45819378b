package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.Column
import graft.Tables

/** Window-function coverage (SURVEY.md §2.4): the reference registers 11
  * window functions (row_number, rank, dense_rank, percent_rank, cume_dist,
  * ntile, first_value, last_value, nth_value, lag, lead —
  * reference MAIN/metadata/BuiltInTypeAndFunctionNamespaceManager.java:678-688,
  * impls MAIN/operator/window/) plus any aggregate as a window function
  * (AggregateWindowFunction.java) with ROWS/RANGE frames
  * (SqlBase.g4:583-592, WindowNode.java:44).
  *
  * Scale notes: every window here partitions by a key (never a global
  * unpartitioned window, which would single-task at 100 TB); the
  * TopN-row-number shape (win_topn_rownum) is the filter Spark rewrites into
  * WindowGroupLimitExec — per-group heaps instead of a full sort, mirroring
  * the reference's TopNRowNumberOperator.java:37.
  *
  * Determinism: ORDER BY inside every window carries a unique tie-break
  * column; running/sliding double aggregates accumulate as DECIMAL(18,6)
  * (frame content is then exact, so engine-internal addition order is moot).
  */
object Windows {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Exact windowed sum of a double column: decimal-accumulate, emit double. */
  private def wsum(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, 6))).over(w).cast(DoubleType)

  /** row_number + per-group top-k filter (reference TopNRowNumberOperator). */
  def topnRownum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** rank + dense_rank with genuine ties (value-based, deterministic). */
  def rankDense(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(asc("c_nationkey"))
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_nationkey"),
        rank().over(w).cast("bigint").as("rnk"),
        dense_rank().over(w).cast("bigint").as("drnk"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** percent_rank + cume_dist (value-based over ties → deterministic). */
  def percentCume(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("s_nationkey").orderBy(asc("s_acctbal"))
    t(s, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("s_nationkey", "s_suppkey")
  }

  /** ntile over a unique ordering (deterministic bucket assignment). */
  def ntileBuckets(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy(asc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"),
        ntile(4).over(w).cast("bigint").as("quartile"))
      .groupBy("o_orderstatus", "quartile").agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus", "quartile")
  }

  /** lag/lead with offsets and defaults (reference LagFunction/LeadFunction). */
  def lagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        lag("value", 1).over(w).as("prev_value"),
        lead("value", 2, -1.0).over(w).as("lead2_value"))
      .orderBy("user_id", "event_id")
  }

  /** first_value / last_value / nth_value over an explicit full frame. */
  def firstLastNth(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_totalprice"), asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first("o_orderkey").over(w).as("cheapest_order"),
        last("o_orderkey").over(w).as("priciest_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Aggregate as window: running (prefix) sum/count per customer. */
  def runningAgg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(asc("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        wsum(col("o_totalprice"), w).as("running_spend"),
        count(lit(1)).over(w).as("running_orders"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Sliding ROWS frame: 3-row moving sum (2 preceding .. current). */
  def slidingRows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(-2, Window.currentRow)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        wsum(col("value"), w).as("moving_sum"),
        count(lit(1)).over(w).as("frame_rows"))
      .orderBy("user_id", "event_id")
  }

  /** RANGE frame over an integer ordering column: peers within 10 units of
    * p_size (value-based frame → deterministic under ties). */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(asc("p_size")).rangeBetween(-10, 0)
    t(s, dir, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        count(lit(1)).over(w).as("peers_within_10"))
      .orderBy("p_brand", "p_partkey")
  }

  /** GROUPS-frame emulation — the one frame type Spark lacks (SURVEY.md §2.4;
    * reference WindowNode.java:325, SqlBase.g4 GROUPS bounds). A GROUPS frame
    * of [lo, hi] over (partition, order) is exactly a RANGE frame of [lo, hi]
    * over dense_rank(order): peer groups become consecutive integers, so
    * "N peer groups preceding" = "dense_rank within N". Both windows share
    * the same partitioning, so at scale this is one shuffle + one sort —
    * the second WindowExec reuses the child ordering. */
  def groupsFrame(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("p_brand").orderBy(asc("p_size"))
    val wGroups = Window.partitionBy("p_brand").orderBy(asc("dr")).rangeBetween(-1, 1)
    t(s, dir, "part")
      .withColumn("dr", dense_rank().over(wOrd))
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        count(lit(1)).over(wGroups).as("peer3_rows"),
        wsum(col("p_retailprice"), wGroups).as("peer3_total"))
      .orderBy("p_brand", "p_partkey")
  }

  /** GROUPS frame accepted as SQL TEXT (SqlBase.g4:583-592): the dialect
    * wraps the FROM source with a dense_rank subquery and turns the GROUPS
    * window into RANGE over the dense rank (same rewrite as groupsFrame
    * above, applied textually). DuckDB runs the ORIGINAL GROUPS spelling
    * natively — a fully independent oracle for the rewrite. */
  def groupsSql(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "part").createOrReplaceTempView("part_wgs")
    graft.api.SqlSession.wrap(s).sql(
      """SELECT p_brand, p_partkey, p_size,
        | count(*) OVER (PARTITION BY p_brand ORDER BY p_size
        |   GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS peer3_rows
        |FROM part_wgs
        |ORDER BY p_brand, p_partkey""".stripMargin)
  }

  /** lag/lead/nth_value with IGNORE NULLS (reference window functions carry
    * an ignoreNulls flag — MAIN/operator/window/LagFunction.java). */
  def ignoreNulls(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .withColumn("v", when(col("event_type") === "click", col("value")))
      .select(col("user_id"), col("event_id"),
        lag(col("v"), 1, null, ignoreNulls = true).over(w).as("prev_click"),
        lead(col("v"), 1, null, ignoreNulls = true).over(w).as("next_click"),
        nth_value(col("v"), 1, ignoreNulls = true).over(wFull).as("first_click"))
      .orderBy("user_id", "event_id")
  }

  /** Gap-based sessionization — the event-analytics operator the
    * reference expresses as the lag + running-sum window idiom (its
    * sessionization cookbook shape; same machinery as
    * TopNRowNumberOperator's partitioned windows). A new session starts
    * when the gap to the user's previous event exceeds the threshold;
    * the session id is the running count of starts. One key-partitioned
    * sort, no self-join — linear at 100 TB. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    val byTs = Window.partitionBy(keyCol).orderBy(asc(tsCol))
    // integer microseconds: second-level truncation would misclassify
    // sub-second gaps differently from a fractional-epoch replay
    // NTZ inputs cast through the (UTC-pinned) session zone first —
    // unix_micros takes TIMESTAMP only
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prevUs = unix_micros(lag(col(tsCol), 1).over(byTs).cast("timestamp"))
    val isNew = when(
      us - prevUs > gapMinutes * 60L * 1000000L ||
        lag(col(tsCol), 1).over(byTs).isNull, 1L)
      .otherwise(0L)
    events.withColumn("session_id",
      sum(isNew).over(byTs.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  private def sessionizeGate(s: SparkSession, dir: String): DataFrame =
    sessionize(t(s, dir, "events"), "user_id", "ts", gapMinutes = 60)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"))
      .orderBy("user_id", "session_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_sessionize" -> sessionizeGate,
    "win_groups_frame" -> groupsFrame,
    "win_groups_sql" -> groupsSql,
    "win_ignore_nulls" -> ignoreNulls,
    "win_topn_rownum" -> topnRownum,
    "win_rank_dense" -> rankDense,
    "win_percent_cume" -> percentCume,
    "win_ntile" -> ntileBuckets,
    "win_lag_lead" -> lagLead,
    "win_first_last_nth" -> firstLastNth,
    "win_running_agg" -> runningAgg,
    "win_sliding_rows" -> slidingRows,
    "win_range_frame" -> rangeFrame)

  val oracle: Map[String, String] = Map(
    "win_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "win_groups_frame" ->
      """WITH d AS (SELECT p_brand, p_partkey, p_size, p_retailprice,
        |  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS dr
        | FROM part)
        |SELECT p_brand, p_partkey, p_size,
        | count(*) OVER w AS peer3_rows,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS peer3_total
        |FROM d
        |WINDOW w AS (PARTITION BY p_brand ORDER BY dr
        |             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        |ORDER BY p_brand, p_partkey""".stripMargin,
    "win_groups_sql" ->
      """WITH d AS (SELECT p_brand, p_partkey, p_size,
        |  dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS dr
        | FROM part)
        |SELECT p_brand, p_partkey, p_size,
        | count(*) OVER (PARTITION BY p_brand ORDER BY dr
        |   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS peer3_rows
        |FROM d ORDER BY p_brand, p_partkey""".stripMargin,
    "win_ignore_nulls" ->
      """SELECT user_id, event_id,
        | lag(v IGNORE NULLS) OVER w AS prev_click,
        | lead(v IGNORE NULLS) OVER w AS next_click,
        | nth_value(v, 1 IGNORE NULLS) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_click
        |FROM (SELECT user_id, event_id, ts,
        |       CASE WHEN event_type = 'click' THEN value END AS v FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_topn_rownum" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_rank_dense" ->
      """SELECT c_mktsegment, c_custkey, c_nationkey,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_nationkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "win_percent_cume" ->
      """SELECT s_nationkey, s_suppkey,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,
    "win_ntile" ->
      """SELECT o_orderstatus, quartile, count(*) AS n FROM (
        | SELECT o_orderstatus,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus
        |       ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        | FROM orders)
        |GROUP BY o_orderstatus, quartile ORDER BY o_orderstatus, quartile""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id, value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 2, -1.0) OVER w AS lead2_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_first_last_nth" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS cheapest_order,
        | last_value(o_orderkey) OVER w AS priciest_order,
        | nth_value(o_orderkey, 2) OVER w AS second_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_running_agg" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_spend,
        | count(*) OVER w AS running_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_sliding_rows" ->
      """SELECT user_id, event_id,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS moving_sum,
        | count(*) OVER w AS frame_rows
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "win_range_frame" ->
      """SELECT p_brand, p_partkey, p_size,
        | count(*) OVER w AS peers_within_10
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_size
        |             RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
        |ORDER BY p_brand, p_partkey""".stripMargin)
}
