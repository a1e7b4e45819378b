package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: split a gate's cost into DataFrame build / Catalyst
  * planning / execution (`runMain graft.PlanTime name1,name2 [sfDir]`). */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',')
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      val c = df.count()
      val t3 = System.nanoTime()
      println(f"TIMING $n build=${(t1 - t0) / 1e9}%.1f plan=${(t2 - t1) / 1e9}%.1f exec=${(t3 - t2) / 1e9}%.1f rows=$c")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
