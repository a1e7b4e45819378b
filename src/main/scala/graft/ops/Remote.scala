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

  /** SQL texts round-tripped through the `/v1/statement` HTTP protocol
    * (api/StatementServer.scala — the reference's QueuedStatementResource +
    * ExecutingStatementResource). Both gates go over REAL localhost HTTP:
    * submit -> queued poll -> executing pages -> reassembled DataFrame. */
  private val httpQ01 = graft.tpch.Tpch.oracle("q01")
  private val httpPageSql =
    """SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp,
      | CAST(o_orderdate AS DATE) AS d
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY k""".stripMargin

  /** TPC-H q01 through the statement protocol (single result page). */
  def gateStatementHttp(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    val base = graft.api.StatementServer.ensureStarted(s)
    graft.api.StatementClient.execute(s, base, httpQ01)
  }

  /** Multi-page paging path: ~500 result rows at 200 rows/page exercises
    * nextUri chaining plus bigint/varchar/double/date value serde. */
  def gateStatementHttpPage(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    val base = graft.api.StatementServer.ensureStarted(s, pageSize = 200)
    graft.api.StatementClient.execute(s, base, httpPageSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_remote" -> gateRemote,
    "sql_statement_http" -> gateStatementHttp,
    "sql_statement_http_page" -> gateStatementHttpPage)

  val oracle: Map[String, String] = Map(
    "fn_remote" ->
      """SELECT c_custkey, c_name, c_acctbal,
        | reverse(c_name) AS rev_name,
        | floor(c_acctbal / 1000.0) AS band
        |FROM customer WHERE c_custkey <= 300
        |ORDER BY c_custkey""".stripMargin,
    // the HTTP gates execute the very same texts server-side; the oracle
    // re-runs them directly in DuckDB, so the protocol round-trip (submit,
    // queued poll, page chaining, JSON value serde) must be lossless
    "sql_statement_http" -> httpQ01,
    "sql_statement_http_page" -> httpPageSql)
}
