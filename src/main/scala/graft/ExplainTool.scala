package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan for named queries —
  * the `.explain`-and-iterate loop the build plan mandates (pushdown,
  * broadcast choice, WholeStageCodegen spans, exchange count).
  * Usage: runMain graft.ExplainTool <sfDir> <name>[,<name>…] */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"########## $n ##########")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
