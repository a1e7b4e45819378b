package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** AS-OF (temporal nearest) join — for every left row, the single right
  * row with the same key whose timestamp is the closest at-or-before
  * (backward) or at-or-after (forward) the left timestamp, optionally
  * within a tolerance. The classic event-stream enrichment operator
  * ("what was the latest quote when this trade printed"); the reference
  * expresses it as a correlated LATERAL TopN-1 subquery
  * (presto-main-base/src/main/java/com/facebook/presto/sql/planner/
  * optimizations/TransformCorrelatedLateralJoinToJoin.java planning path
  * plus the row_number cap in WindowFilterPushDown.java:65) — per left
  * row, ORDER BY right.ts DESC LIMIT 1.
  *
  * Spark-first shape — NOT a join at all: a lateral/non-equi range join
  * explodes to O(L × matches) before the per-row TopN cuts it back, which
  * dies on a hot key at 100 TB. Instead both sides UNION into one
  * timeline tagged by side, shuffle ONCE on the join key, and a single
  * ordered window carries the most recent right payload forward
  * (`last(_, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT):
  * every left row reads its answer off the running state. Cost is one
  * key-partitioned sort of L+R rows — the same profile as a windowed
  * aggregate, no intermediate blow-up, AQE-skew-splittable because the
  * window is rows-bounded. Forward as-of is the same plan with the
  * timeline ordered descending.
  */
object AsOfJoin {

  /** As-of join `left` to `right` on equal `keys` and the nearest
    * `rightTs` relative to `leftTs`.
    *
    * @param direction "backward" (right.ts <= left.ts, the default) or
    *                  "forward" (right.ts >= left.ts)
    * @param tolerance max |left.ts - right.ts| as a Spark interval
    *                  expression (e.g. `expr("INTERVAL 1 HOUR")`); a
    *                  match farther than this nulls out
    * @param allowExactMatch false = strict inequality (an equal-ts right
    *                        row does not match)
    * @param rightPrefix prefix for the right side's payload columns in
    *                    the output (keys are not repeated)
    * Unmatched left rows keep NULL right columns (LEFT OUTER as-of, the
    * pandas merge_asof / DuckDB ASOF LEFT JOIN contract). Ties on
    * (key, ts) among right rows break deterministically: largest payload
    * struct wins backward, smallest forward (the struct order follows
    * the timeline order of each direction).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, direction: String = "backward",
      tolerance: Option[Column] = None, allowExactMatch: Boolean = true,
      rightPrefix: String = ""): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward: $direction")
    val rPayload = right.columns.filterNot(keys.contains).toSeq
    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct(rPayload.map(col): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val lType = left.select(lStruct.as("l")).schema("l").dataType
    // exact matches allowed: right sorts BEFORE left at equal ts so the
    // running state includes it; strict: right sorts after
    val (lSide, rSide) = if (allowExactMatch) (1, 0) else (0, 1)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(lSide).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(rSide).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)
    val ordering: Seq[Column] =
      if (direction == "backward")
        Seq(col("__ts").asc, col("__side").asc, col("__r").asc_nulls_first)
      else
        Seq(col("__ts").desc, col("__side").asc, col("__r").desc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__m", last("__r", ignoreNulls = true).over(w))
      .where(col("__side") === lSide && col("__l").isNotNull)
    // tolerance applies to the matched right row's OWN timestamp
    val inTol = tolerance match {
      case None => matched
      case Some(tol) =>
        val mTs = col("__m").getField(rightTs)
        val ok =
          if (direction == "backward") mTs >= col("__ts") - tol
          else mTs <= col("__ts") + tol
        matched.withColumn("__m",
          when(col("__m").isNotNull && ok, col("__m")))
    }
    val lCols = left.columns.toSeq.map(c => col("__l").getField(c).as(c))
    val rCols = rPayload.map(c =>
      col("__m").getField(c).as(s"$rightPrefix$c"))
    inTol.select(lCols ++ rCols: _*)
  }

  // ---------- driver gates (events fixture: per-user event timeline)

  private def ev(s: SparkSession, dir: String, kind: String): DataFrame =
    Tables(s, dir, "events").where(col("event_type") === kind)

  /** Backward as-of: each purchase picks the user's latest click at or
    * before it. */
  def gateBackward(s: SparkSession, dir: String): DataFrame =
    asOfJoin(
      ev(s, dir, "purchase").select("event_id", "user_id", "ts"),
      ev(s, dir, "click").select("user_id", "ts", "value"),
      keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      rightPrefix = "click_")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_ts"), col("click_value").as("click_value"))
      .orderBy("event_id")

  /** Forward as-of: each purchase picks the user's next error event at
    * or after it. */
  def gateForward(s: SparkSession, dir: String): DataFrame =
    asOfJoin(
      ev(s, dir, "purchase").select("event_id", "user_id", "ts"),
      ev(s, dir, "error").select("user_id", "ts"),
      keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      direction = "forward", rightPrefix = "err_")
      .select(col("event_id"), col("user_id"), col("err_ts"))
      .orderBy("event_id")

  /** Backward as-of with a 1-hour tolerance: stale clicks null out. */
  def gateTolerance(s: SparkSession, dir: String): DataFrame =
    asOfJoin(
      ev(s, dir, "purchase").select("event_id", "user_id", "ts"),
      ev(s, dir, "click").select("user_id", "ts", "value"),
      keys = Seq("user_id"), leftTs = "ts", rightTs = "ts",
      tolerance = Some(expr("INTERVAL 1 HOUR")), rightPrefix = "click_")
      .select(col("event_id"), col("click_ts"),
        col("click_value").as("click_value"))
      .orderBy("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof" -> gateBackward,
    "join_asof_fwd" -> gateForward,
    "join_asof_tol" -> gateTolerance)

  val oracle: Map[String, String] = Map(
    // DuckDB's native ASOF LEFT JOIN is the independent oracle
    "join_asof" ->
      """SELECT l.event_id, l.user_id, l.ts,
        |  r.ts AS click_ts, r.value AS click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "join_asof_fwd" ->
      """SELECT l.event_id, l.user_id, r.ts AS err_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,
    // tolerance has no ASOF spelling: per-row LATERAL TopN-1 replays it
    "join_asof_tol" ->
      """SELECT l.event_id, m.click_ts, m.click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |LEFT JOIN LATERAL (
        |  SELECT r.ts AS click_ts, r.value AS click_value
        |  FROM events r
        |  WHERE r.event_type = 'click' AND r.user_id = l.user_id
        |    AND r.ts <= l.ts AND r.ts >= l.ts - INTERVAL 1 HOUR
        |  ORDER BY r.ts DESC LIMIT 1) m ON true
        |ORDER BY l.event_id""".stripMargin)
}
