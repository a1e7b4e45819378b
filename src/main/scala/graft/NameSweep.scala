package graft
import org.apache.spark.sql.SparkSession
/** Dev-only scratch: which reference scalar names resolve? */
object NameSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    functions.GraftFunctions.register(spark)
    val reg = spark.sessionState.functionRegistry
    val tf = spark.sessionState.tableFunctionRegistry
    val renameSrc = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/api/SqlSession.scala")), "UTF-8")
    val names = scala.io.Source.fromFile(args(0)).getLines().filter(_.nonEmpty)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    names.foreach { n =>
      val covered = reg.functionExists(FunctionIdentifier(n)) ||
        tf.functionExists(FunctionIdentifier(n)) ||
        renameSrc.contains("\"" + n + "\"")
      if (!covered) println(s"[uncovered] $n")
    }
    spark.stop()
  }
}
