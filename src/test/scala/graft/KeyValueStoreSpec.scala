package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.KeyValueStore

/** Pins the Redis-connector analogue: schema:table:* key routing
  * (RedisRecordCursor.setScanParams:263-287), zset rank-range key splits
  * (fetchKeys:312-315), and hash-value field access (fetchData:324-349). */
class KeyValueStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def kv(rows: Seq[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("key", "value", "score")
  }

  test("key pattern: default schema unprefixed, others schema:table:") {
    assert(KeyValueStore.keyPattern("tpch", "orders") === "tpch:orders:")
    assert(KeyValueStore.keyPattern("default", "orders") === "orders:")
  }

  test("table scan routes by prefix and the StartsWith filter reaches " +
    "the scan") {
    val df = kv(Seq(
      ("tpch:orders:1", "a", 1.0), ("tpch:orders:2", "b", 2.0),
      ("tpch:customer:1", "c", 3.0), ("other:orders:9", "d", 4.0)))
    val got = KeyValueStore.scanTable(df, "tpch", "orders")
      .select("key").collect().map(_.getString(0)).sorted
    assert(got.toSeq === Seq("tpch:orders:1", "tpch:orders:2"))
  }

  test("zset split takes the inclusive [start,end] rank range in score " +
    "order like zrange") {
    val df = kv(Seq(
      ("k1", "", 30.0), ("k2", "", 10.0), ("k3", "", 20.0),
      ("k4", "", 40.0), ("k5", "", 50.0)))
    val got = KeyValueStore.zrangeKeys(df, "score", 1, 3)
      .select("key").collect().map(_.getString(0))
    assert(got.toSeq === Seq("k3", "k1", "k4")) // ranks 1..3 by score
  }

  test("prefix routing over a parquet keyspace reaches the scan as a " +
    "pushed StartsWith filter") {
    val path = "/tmp/graft_kv_spec/keyspace"
    kv(Seq(("tpch:orders:1", "a", 1.0), ("x:y:2", "b", 2.0)))
      .write.mode("overwrite").parquet(path)
    val q = KeyValueStore.scanTable(spark.read.parquet(path), "tpch", "orders")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith"), s"expected pushed StartsWith in:\n$plan")
    assert(q.count() === 1)
  }

  test("gate decodes key id + json value + hash fields and matches the " +
    "relational rows") {
    val out = graft.ops.KeyValueStore.kvTableGate(spark, sf)
    val got = out.collect()
    val want = Tables(spark, sf, "customer")
      .selectExpr("c_custkey", "c_name", "c_acctbal", "c_mktsegment",
        "CAST(c_nationkey AS INT) AS c_nationkey")
      .orderBy("c_custkey").collect()
    assert(got.length === want.length)
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
    assert(SparkEntry.oracleSql.contains("src_kv_table"))
  }
}
