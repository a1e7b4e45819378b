package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{FunctionServer, RemoteFunctions}
import graft.functions.FunctionServer.RemoteFn

/** Remote-function service + batched client (functions/
  * RemoteFunctions.scala — the reference's presto-function-server
  * FunctionResource endpoints + RemoteProjectOperator page batching). */
class RemoteFunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def url = s"http://127.0.0.1:${FunctionServer.ensureStarted()}"

  private def registerAll(): Unit = {
    FunctionServer.register(RemoteFn("test", "rev", Seq(StringType),
      StringType, a => a.head.asInstanceOf[String].reverse))
    FunctionServer.register(RemoteFn("test", "addmul", Seq(LongType, DoubleType),
      DoubleType, a => (a(0).asInstanceOf[Long] + 1) * a(1).asInstanceOf[Double]))
  }

  test("GET lists registered function metadata like FunctionResource") {
    registerAll()
    val listing = scala.io.Source.fromURL(s"$url/v1/functions/test").mkString
    assert(listing.contains("\"name\":\"rev\"") &&
      listing.contains("\"paramTypes\":[\"varchar\"]") &&
      listing.contains("\"returnType\":\"double\""))
    val one = scala.io.Source.fromURL(s"$url/v1/functions/test/addmul").mkString
    assert(one.contains("\"paramTypes\":[\"bigint\",\"double\"]"))
  }

  test("batched remote projection matches local compute across pages") {
    registerAll()
    val df = Tables(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"))
    // batchSize 7 over 25 rows → 4 pages per partition at most
    val out = RemoteFunctions.call(df, url, "test", "rev",
      Seq("n_name"), StringType, "rev_name", batchSize = 7)
      .collect().map(r => (r.getString(1), r.getString(2))).toMap
    assert(out.size == 25)
    out.foreach { case (name, rev) => assert(rev == name.reverse) }
  }

  test("multi-argument function with type coercion") {
    registerAll()
    val df = spark.range(10).select(col("id"),
      (col("id") * lit(0.5)).as("x"))
    val rows = RemoteFunctions.call(df, url, "test", "addmul",
      Seq("id", "x"), DoubleType, "y", batchSize = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    rows.foreach { case (id, y) => assert(y == (id + 1) * (id * 0.5)) }
  }

  test("RETURNS NULL ON NULL INPUT short-circuits without a remote call") {
    registerAll()
    val df = spark.range(4).select(
      when(col("id") % 2 === 0, concat(lit("v"), col("id"))).as("v"))
    val rows = RemoteFunctions.call(df, url, "test", "rev",
      Seq("v"), StringType, "r").collect()
    assert(rows.count(_.isNullAt(1)) == 2)
    assert(rows.filter(!_.isNullAt(1)).forall(r =>
      r.getString(1) == r.getString(0).reverse))
  }

  test("unknown function returns a clear error") {
    val df = spark.range(1).select(col("id").cast("string").as("v"))
    val e = intercept[org.apache.spark.SparkException] {
      RemoteFunctions.call(df, url, "test", "nope",
        Seq("v"), StringType, "r").collect()
    }
    assert(e.getMessage.contains("unknown function") ||
      String.valueOf(e.getCause).contains("unknown function"))
  }
}
