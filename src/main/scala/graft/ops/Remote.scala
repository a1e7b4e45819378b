package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.Tables
import graft.functions.{FunctionServer, RemoteFunctions}
import graft.functions.FunctionServer.RemoteFn

/** Driver gate for the remote-function surface (functions/
  * RemoteFunctions.scala — the reference's presto-function-server +
  * RemoteProjectOperator): an in-JVM function service executes
  * `reverse` on strings and a compound double expression, called from a
  * batched distributed projection. The oracle re-states both with
  * DuckDB built-ins, so values AND the remote round-trip are verified. */
object Remote {

  private def ensureServer(): String = {
    val port = FunctionServer.ensureStarted()
    FunctionServer.register(RemoteFn("default", "strrev",
      Seq(StringType), StringType,
      args => args.head.asInstanceOf[String].reverse))
    FunctionServer.register(RemoteFn("default", "acct_band",
      Seq(DoubleType), DoubleType,
      args => math.floor(args.head.asInstanceOf[Double] / 1000.0)))
    s"http://127.0.0.1:$port"
  }

  def gateRemote(s: SparkSession, dir: String): DataFrame = {
    val url = ensureServer()
    val base = Tables(s, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val withRev = RemoteFunctions.call(base, url, "default", "strrev",
      Seq("c_name"), StringType, "rev_name", batchSize = 64)
    RemoteFunctions.call(withRev, url, "default", "acct_band",
      Seq("c_acctbal"), DoubleType, "band", batchSize = 64)
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_remote" -> gateRemote)

  val oracle: Map[String, String] = Map(
    "fn_remote" ->
      """SELECT c_custkey, c_name, c_acctbal,
        | reverse(c_name) AS rev_name,
        | floor(c_acctbal / 1000.0) AS band
        |FROM customer WHERE c_custkey <= 300
        |ORDER BY c_custkey""".stripMargin)
}
