package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: split per-query cost into plan-build+analyze+optimize vs
  * execute. Usage: runMain graft.PlanProfile <benchDir> <q1,q2,...> */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',')
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tpcds.Tpcds.materializeFacts(spark, dir)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm
      (1 to 2).foreach(_ => fn(spark, dir).count())
      val t = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val b = t.map(_._1).min; val p = t.map(_._2).min; val e = t.map(_._3).min
      println(f"[profile] $n build=$b%.3f plan=$p%.3f exec=$e%.3f total=${b + p + e}%.3f")
    }
    spark.stop()
  }
}
