package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.Expand
import org.apache.spark.sql.graftbridge.Bridge

/** Dev utility: for grouping-set queries, print the DETERMINISTIC scale
  * evidence behind rules/PreAggregateRollup.scala — the row count feeding
  * Expand (× its grouping-set multiplier) with the rule on vs off. Wall
  * clocks at sf1 on 8 cpus are scan-dominated noise for the mid-size DS
  * rollups; the rows entering Expand are the quantity that explodes at
  * 100 TB. Usage: runMain graft.ExpandRows <sfDir> <name>[,<name>…] */
object ExpandRows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args(1).split(',').foreach { q =>
      def expandInput(withRule: Boolean): (Long, Int) = {
        spark.experimental.extraOptimizations =
          if (withRule) Seq(graft.rules.PreAggregateRollup) else Nil
        val df = SparkEntry.queries(q)(spark, args(0))
        val exp = df.queryExecution.optimizedPlan
          .collectFirst { case e: Expand => e }
          .getOrElse(sys.error(s"$q has no Expand node"))
        // re-optimizing the child subplan alone cannot re-introduce the
        // rollup rewrite, so this count is exactly the rows feeding Expand
        (Bridge.dataFrame(spark, exp.child).count(), exp.projections.length)
      }
      val (withRows, sets) = expandInput(withRule = true)
      val (withoutRows, _) = expandInput(withRule = false)
      println(f"EXPAND $q%-8s sets=$sets expand_input with_rule=$withRows " +
        f"without=$withoutRows reduction=${withoutRows.toDouble / withRows}%.1fx")
      spark.experimental.extraOptimizations = Nil
    }
    spark.stop()
  }
}
