package graft.rules

import org.apache.spark.sql.SparkSession

/** One-stop idempotent registration of the always-safe graft optimizer
  * rules on a session. The reference installs its optimizer list once per
  * server (presto-main-base `PlanOptimizers.java`); Spark's analogue is
  * per-session `extraOptimizations`, which only the wrapped SQL session
  * used to set — leaving DataFrame twins and the bench sessions
  * un-optimized (r12 verdict finding #2). Every session entry point
  * (`Tables.apply`/`registerAll`, `SqlSession.wrap`) now funnels through
  * here, so a fact-sized ROLLUP gets two-phased whether it arrives as SQL
  * text or a DataFrame.
  *
  * Opt-in rules with registration side-state (MaterializedViewRewrite,
  * ArrayContainsJoin, HistoryBasedStats) stay at their call sites.
  */
object GraftRules {
  private val always = Seq(
    CombineApproxPercentiles,
    MergeSumsToVectorSum,
    PreAggregateRollup)

  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    val missing = always.filterNot(cur.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ missing
  }
}
