package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time selected queries under the exact Bench settings
  * (prewarm + median-of-6), optionally printing the formatted plan.
  * Usage: runMain graft.BenchOne <sfDir> <name>[,<name>…] [explain] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val doExplain = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      if (doExplain) { println(s"########## $n ##########"); fn(spark, sfDir).explain("formatted") }
      (1 to 2).foreach(_ => fn(spark, sfDir).count())
      val runs = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TIME $n%-10s median=${(runs(2) + runs(3)) / 2}%.3f min=${runs.head}%.3f max=${runs.last}%.3f")
      spark.catalog.clearCache() // queries may persist() shared frames
    }
    spark.stop()
  }
}
