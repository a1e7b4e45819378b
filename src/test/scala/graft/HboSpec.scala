package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.rules.HistoryBasedStats

/** History-based optimization seed (rules/HistoryBasedStats.scala — the
  * reference's HistoryBasedPlanStatisticsCalculator contract): actual
  * output rows recorded from an executed run change the NEXT plan of an
  * equivalent fragment. With static broadcast disabled (threshold -1,
  * so neither the planner nor AQE can pick broadcast from estimates),
  * the first run shuffle-joins; after its actuals land in history the
  * same join plans as a broadcast join. */
class HboSpec extends AnyFunSuite {
  import TestSpark._

  test("recorded actuals flip a shuffle join to broadcast on re-planning") {
    HistoryBasedStats.install(spark)
    HistoryBasedStats.clear()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def q = {
        val small = Tables(spark, sf, "nation")
          .filter(col("n_nationkey") >= 0)
          .select(col("n_nationkey"), col("n_name"))
        val big = Tables(spark, sf, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
        big.join(small, col("o_orderkey") % 25 === col("n_nationkey"))
          .groupBy("n_name").agg(count(lit(1)).as("n"))
      }
      def planOf(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString
      assert(!planOf(q).contains("BroadcastHashJoin"),
        "without history the disabled threshold must force a shuffle join")
      val rows1 = q.collect()
      assert(rows1.nonEmpty)
      // the listener fires on the async listener bus — poll for the flip
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var flipped = false
      while (!flipped && System.nanoTime() < deadline) {
        flipped = planOf(q).contains("BroadcastHashJoin")
        if (!flipped) Thread.sleep(200)
      }
      assert(flipped, "history of the small side must hint broadcast")
      // and the hinted plan returns the same result
      val rows2 = q.collect()
      assert(rows2.map(_.toSeq.mkString("|")).sorted.toSeq ==
        rows1.map(_.toSeq.mkString("|")).sorted.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      HistoryBasedStats.enabled = false
      HistoryBasedStats.clear()
    }
  }

  test("SET SESSION track_history_based_plan_statistics toggles HBO") {
    val ses = graft.api.SqlSession.wrap(spark)
    assert(!HistoryBasedStats.enabled)
    ses.sql("SET SESSION track_history_based_plan_statistics = true").collect()
    assert(HistoryBasedStats.enabled)
    ses.sql("SET SESSION track_history_based_plan_statistics = false").collect()
    assert(!HistoryBasedStats.enabled)
    ses.sql("SET SESSION use_history_based_plan_statistics = true").collect()
    assert(HistoryBasedStats.enabled)
    ses.sql("RESET SESSION use_history_based_plan_statistics").collect()
    assert(!HistoryBasedStats.enabled)
  }

  test("history survives a save/clear/load round-trip") {
    HistoryBasedStats.clear()
    val f = java.io.File.createTempFile("graft_hbo", ".csv")
    try {
      HistoryBasedStats.install(spark)
      Tables(spark, sf, "region").select(col("r_regionkey")).collect()
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (HistoryBasedStats.dump.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      val before = HistoryBasedStats.dump.toMap
      assert(before.nonEmpty && before.values.exists(_ == 5L))
      HistoryBasedStats.save(f)
      HistoryBasedStats.clear()
      assert(HistoryBasedStats.dump.isEmpty)
      HistoryBasedStats.load(f)
      assert(HistoryBasedStats.dump.toMap == before)
    } finally {
      f.delete()
      HistoryBasedStats.enabled = false
      HistoryBasedStats.clear()
    }
  }

  test("big recorded sides never get hinted") {
    HistoryBasedStats.install(spark)
    HistoryBasedStats.clear()
    val prevT = HistoryBasedStats.broadcastRowThreshold
    HistoryBasedStats.broadcastRowThreshold = 1 // nothing qualifies
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def q = Tables(spark, sf, "orders").select("o_orderkey")
        .join(Tables(spark, sf, "lineitem").select("l_orderkey"),
          col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("n"))
      q.collect()
      Thread.sleep(1500) // give the listener bus time to drain
      assert(!q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "history above the row threshold must not hint broadcast")
    } finally {
      HistoryBasedStats.broadcastRowThreshold = prevT
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      HistoryBasedStats.enabled = false
      HistoryBasedStats.clear()
    }
  }
}
