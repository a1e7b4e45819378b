package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Binned range joins — point-in-interval and interval-overlap joins
  * planned as EQUI-joins on bin keys instead of the nested-loop join a
  * raw BETWEEN predicate gets (the reference evaluates such filters on
  * the cross-join dataflow unless a spatial/index path applies; Spark
  * plans them as BroadcastNestedLoopJoin — O(|L|·|R|), a scale killer).
  *
  * The standard binning reduction: intervals explode to the fixed-width
  * bins they cover, points key by their single bin, the join is a plain
  * hash equi-join on the bin id (shuffle-partitioned, AQE/skew-handled),
  * and the exact predicate re-checks as a residual filter. For
  * interval×interval overlap every overlapping pair shares ≥1 bin but
  * may share many: each pair is emitted exactly once by keeping it only
  * in the bin holding max(lo_a, lo_b) — no distinct pass needed.
  *
  * Cost: O(|L| + |R| · avg_bins + matches) vs the nested loop's
  * O(|L| · |R|); binWidth trades replication (wide intervals explode to
  * more bins) against selectivity (fat bins join more non-matches). */
object RangeJoin {

  private def binOf(c: Column, w: Double): Column =
    floor(c.cast("double") / w).cast("long")

  /** points ⋈ intervals ON lo <= p <= hi, as a bin equi-join. All of
    * both sides' columns survive; `binWidth` is the bin size in the
    * point column's units. */
  def pointInInterval(points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val ptBinned = points.withColumn("__bin", binOf(col(pCol), binWidth))
    val ivBinned = intervals
      .withColumn("__bin",
        explode(sequence(binOf(col(loCol), binWidth),
          binOf(col(hiCol), binWidth))))
    ptBinned.join(ivBinned, "__bin")
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__bin")
  }

  /** a ⋈ b ON a.lo <= b.hi AND b.lo <= a.hi (closed-interval overlap),
    * as a bin equi-join with the max-lo single-emission rule. */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def explodeBins(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(binOf(col(lo), binWidth),
          binOf(col(hi), binWidth))))
    explodeBins(a, aLo, aHi).join(explodeBins(b, bLo, bHi), "__bin")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bin") === binOf(greatest(col(aLo), col(bLo)), binWidth))
      .drop("__bin")
  }

  // ---------- driver gates

  /** Customers whose balance falls in each supplier's ±500 acctbal band:
    * per-supplier match counts. */
  def gatePoint(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables(s, dir, "customer").select("c_custkey", "c_acctbal")
    val ivs = Tables(s, dir, "supplier")
      .select(col("s_suppkey"),
        (col("s_acctbal") - 500).as("lo"), (col("s_acctbal") + 500).as("hi"))
    pointInInterval(pts, "c_acctbal", ivs, "lo", "hi", binWidth = 250.0)
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_custkey")).as("cust_sum"))
      .orderBy("s_suppkey")
  }

  /** Overlapping supplier balance bands (self-overlap, s1 < s2): each
    * overlapping pair exactly once. */
  def gateOverlap(s: SparkSession, dir: String): DataFrame = {
    val bands = Tables(s, dir, "supplier")
      .where(col("s_suppkey") <= 60)
      .select(col("s_suppkey"),
        (col("s_acctbal") - 200).as("lo"), (col("s_acctbal") + 200).as("hi"))
    val a = bands.select(col("s_suppkey").as("s1"),
      col("lo").as("lo1"), col("hi").as("hi1"))
    val b = bands.select(col("s_suppkey").as("s2"),
      col("lo").as("lo2"), col("hi").as("hi2"))
    intervalOverlap(a, "lo1", "hi1", b, "lo2", "hi2", binWidth = 100.0)
      .where(col("s1") < col("s2"))
      .select("s1", "s2")
      .orderBy("s1", "s2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_range_point" -> gatePoint,
    "join_range_overlap" -> gateOverlap)

  val oracle: Map[String, String] = Map(
    "join_range_point" ->
      """SELECT s_suppkey, count(*) AS n_customers,
        |  CAST(sum(c_custkey) AS BIGINT) AS cust_sum
        |FROM supplier JOIN customer
        |  ON c_acctbal BETWEEN s_acctbal - 500 AND s_acctbal + 500
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "join_range_overlap" ->
      """WITH bands AS (
        |  SELECT s_suppkey, s_acctbal - 200 AS lo, s_acctbal + 200 AS hi
        |  FROM supplier WHERE s_suppkey <= 60)
        |SELECT a.s_suppkey AS s1, b.s_suppkey AS s2
        |FROM bands a JOIN bands b
        |  ON a.lo <= b.hi AND b.lo <= a.hi AND a.s_suppkey < b.s_suppkey
        |ORDER BY s1, s2""".stripMargin)
}
