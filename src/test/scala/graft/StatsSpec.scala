package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.SqlSession

/** ANALYZE statistics + EXPLAIN surfaces — the reference's
  * StatisticsWriterNode (ANALYZE, MAIN/operator/StatisticsWriterOperator
  * .java:35) and ExplainAnalyzeNode (ExplainAnalyzeOperator.java:38) map to
  * Spark's `ANALYZE TABLE … COMPUTE STATISTICS` + catalog stats feeding the
  * CBO, and `EXPLAIN [COST]`. At 100 TB these stats drive join-side
  * selection and broadcast decisions, so the spec pins that the collected
  * row counts actually reach the optimizer. */
class StatsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val session = SqlSession.wrap(spark)

  test("ANALYZE TABLE collects row and column stats that reach the CBO") {
    // a previously-killed run can leave the managed location behind with no
    // catalog entry; clear both so overwrite can't hit LOCATION_ALREADY_EXISTS
    spark.sql("DROP TABLE IF EXISTS stats_nation")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "stats_nation")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    spark.read.parquet(s"$sf/nation.parquet")
      .write.mode("overwrite").saveAsTable("stats_nation")
    session.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
    val cat = spark.sql("DESCRIBE TABLE EXTENDED stats_nation")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(cat.contains("Statistics"), s"no stats row in:\n$cat")
    // row count feeds the optimized plan when CBO is on
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("stats_nation")
        .queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"rowCount=${stats.rowCount}")
      // column stats: distinct count for the analyzed column is recorded
      val colStats = spark.sql(
        "DESCRIBE EXTENDED stats_nation n_regionkey").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(colStats.get("distinct_count").exists(_.toLong >= 5))
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("EXPLAIN and EXPLAIN COST run through the SQL entry point") {
    spark.read.parquet(s"$sf/region.parquet").createOrReplaceTempView("exp_region")
    val plan = session.sql("EXPLAIN SELECT r_name, count(*) FROM exp_region GROUP BY r_name")
      .collect().map(_.getString(0)).mkString
    assert(plan.contains("HashAggregate") || plan.contains("Aggregate"))
    val cost = session.sql("EXPLAIN COST SELECT * FROM exp_region WHERE r_regionkey = 1")
      .collect().map(_.getString(0)).mkString
    assert(cost.contains("Statistics") || cost.contains("sizeInBytes"))
  }

  test("stats-driven planning: analyzed small table broadcasts") {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val big = spark.read.parquet(s"$sf/orders.parquet")
      val joined = big.join(spark.table("stats_nation"),
        big("o_custkey") % 25 === col("n_nationkey"))
      val phys = joined.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"), s"expected broadcast:\n$phys")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
