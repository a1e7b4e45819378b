package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.KeyedTable
import graft.ops.JdbcDialects.{JdbcDomain, JdbcRange}

/** Pins the Cassandra clustering-prefix pushdown rule
  * (CassandraClusteringPredicatesExtractor.getClusteringKeysSet:69-163),
  * the CQL render, and the partition-routed read's file-listing pruning. */
class KeyedTableSpec extends AnyFunSuite {
  import TestSpark._

  private def eq(c: String, v: Any) =
    c -> JdbcDomain(c, IntegerType, Seq(JdbcRange.equalTo(v)))
  private def rng(c: String, lo: Int, hi: Int) =
    c -> JdbcDomain(c, IntegerType, Seq(JdbcRange(Some(lo), true, Some(hi), true)))

  test("prefix rule: equalities keep the prefix open, a range closes it") {
    val cks = Seq("c1", "c2", "c3")
    val (p1, r1) = KeyedTable.clusteringPushdown(cks,
      Map(eq("c1", 1), rng("c2", 5, 9), eq("c3", 7)))
    assert(p1.map(_.column) === Seq("c1", "c2")) // range on c2 terminates
    assert(r1.map(_.column) === Seq("c3"))
  }

  test("prefix rule: a gap in the clustering order stops the prefix") {
    val (p, r) = KeyedTable.clusteringPushdown(Seq("c1", "c2", "c3"),
      Map(eq("c1", 1), eq("c3", 3))) // c2 unconstrained
    assert(p.map(_.column) === Seq("c1"))
    assert(r.map(_.column) === Seq("c3"))
  }

  test("prefix rule: nullable and mixed equality+range domains are not " +
    "pushable (extractor returns null and breaks)") {
    val nullable = JdbcDomain("c1", IntegerType,
      Seq(JdbcRange.equalTo(1)), nullAllowed = true)
    val (p1, r1) = KeyedTable.clusteringPushdown(Seq("c1"), Map("c1" -> nullable))
    assert(p1.isEmpty && r1.map(_.column) === Seq("c1"))

    val mixed = JdbcDomain("c1", IntegerType,
      Seq(JdbcRange.equalTo(1), JdbcRange(Some(5), true, Some(9), true)))
    val (p2, r2) = KeyedTable.clusteringPushdown(Seq("c1"), Map("c1" -> mixed))
    assert(p2.isEmpty && r2.map(_.column) === Seq("c1"))
  }

  test("CQL render: pk IN restriction + prefix spellings") {
    val pushed = Seq(
      JdbcDomain("ck1", IntegerType,
        Seq(JdbcRange.equalTo(4), JdbcRange.equalTo(6))),
      JdbcDomain("ck2", IntegerType,
        Seq(JdbcRange(Some(10), true, Some(20), false))))
    assert(KeyedTable.cql("ks.orders", "pk", Seq(7, 43), pushed) ===
      "SELECT * FROM ks.orders WHERE pk IN (7,43) AND ck1 IN (4,6) AND " +
        "ck2 >= 10 AND ck2 < 20")
    assert(KeyedTable.cql("t", "pk", Seq("a'b"), Nil) ===
      "SELECT * FROM t WHERE pk = 'a''b'")
  }

  test("partition-routed lookup reads only the probed keys' bucket dirs " +
    "and matches the unrouted filter") {
    val path = "/tmp/graft_keyed_spec/orders"
    val orders = Tables(spark, sf, "orders")
      .withColumn("o_date", col("o_orderdate").cast("date").cast("string"))
    KeyedTable.create(orders, "o_custkey", Seq("o_date"), 32, path)

    val keys = Seq(7L, 43L, 101L, 222L, 333L, 444L, 555L, 666L, 777L, 888L)
    val dom = JdbcDomain("o_date", StringType,
      Seq(JdbcRange(Some("1994-01-01"), true, Some("1997-01-01"), false)))
    val got = KeyedTable.lookup(spark, path, "o_custkey", keys, Seq(dom), 32)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val want = orders
      .where(col("o_custkey").isin(keys: _*) &&
        col("o_date") >= "1994-01-01" && col("o_date") < "1997-01-01")
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)

    val probed = keys.map(KeyedTable.bucketOf(_, 32)).toSet
    val files = KeyedTable.lookup(spark, path, "o_custkey", keys, Seq(dom), 32)
      .inputFiles
    assert(files.nonEmpty)
    assert(files.forall(f => probed.exists(b => f.contains(s"pk_bucket=$b"))))
    val allBuckets = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("pk_bucket="))
    assert(probed.size < allBuckets)
  }

  test("gate runs with its oracle declared") {
    val out = graft.ops.KeyedTable.keyedLookupGate(spark, sf).collect()
    assert(out.nonEmpty)
    assert(SparkEntry.oracleSql.contains("src_keyed_lookup"))
  }
}
