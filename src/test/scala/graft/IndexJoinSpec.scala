package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{IndexJoin, SnapshotTable}

/** Index join (ops/IndexJoin.scala — the reference's IndexJoinNode /
  * IndexSourceNode contract): per-key lookup into a bucket-partitioned
  * index instead of a full inner-side scan. */
class IndexJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def base(n: String) = new java.io.File(s"/tmp/graft_test/index_$n")

  test("lookup equals the plain equi-join and reads only matched buckets") {
    val b = base("cust")
    SnapshotTable.drop(b)
    val customer = Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"))
    IndexJoin.createIndex(spark, b, customer, "c_custkey", 32)
    val probe = Tables(spark, sf, "orders")
      .filter(col("o_orderkey") % 501 === 0)
      .select(col("o_orderkey"), col("o_custkey"))

    val viaIndex = IndexJoin.lookup(spark, b, probe, "o_custkey", "c_custkey", 32)
      .select("o_orderkey", "c_name").collect().map(_.toSeq.mkString("|")).sorted
    val plain = probe.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name").collect().map(_.toSeq.mkString("|")).sorted
    assert(viaIndex.nonEmpty && viaIndex.toSeq == plain.toSeq)

    // access path: the index source lists/reads ONLY the probe's buckets
    val probedBuckets = probe
      .select(IndexJoin.bucketExpr(col("o_custkey"), 32,
        probe.schema("o_custkey").dataType).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val src = IndexJoin.indexSource(spark, b, probe, "o_custkey", 32)
    val readBuckets = src.inputFiles.map { f =>
      val m = "_idx_bucket=(\\d+)".r.findFirstMatchIn(f)
      m.get.group(1).toInt
    }.toSet
    assert(readBuckets == probedBuckets.filter(bb =>
      new java.io.File(SnapshotTable.committedDir(b), s"_idx_bucket=$bb").isDirectory))
    val allBuckets = SnapshotTable.committedDir(b).listFiles()
      .count(_.getName.startsWith("_idx_bucket="))
    assert(readBuckets.size < allBuckets,
      s"probe must prune (${readBuckets.size} of $allBuckets buckets)")
  }

  test("SOURCE_OUTER preserves unmatched probe rows") {
    val b = base("nation")
    SnapshotTable.drop(b)
    IndexJoin.createIndex(spark, b,
      Tables(spark, sf, "nation").select(col("n_nationkey"), col("n_name"))
        .filter(col("n_nationkey") < 10),
      "n_nationkey", 8)
    val probe = Tables(spark, sf, "nation")
      .select(col("n_nationkey").as("probe_key"))
    val out = IndexJoin.lookup(spark, b, probe, "probe_key", "n_nationkey", 8,
      joinType = "left_outer")
    assert(out.count() == 25)
    assert(out.filter(col("n_name").isNull).count() == 15)
  }

  test("empty probe bucket set yields an empty (schema-correct) source") {
    val b = base("empty")
    SnapshotTable.drop(b)
    IndexJoin.createIndex(spark, b,
      Tables(spark, sf, "region").select(col("r_regionkey"), col("r_name")),
      "r_regionkey", 4)
    val probe = Tables(spark, sf, "region")
      .filter(lit(false)).select(col("r_regionkey").as("pk"))
    val src = IndexJoin.indexSource(spark, b, probe, "pk", 4)
    assert(src.columns.toSeq == Seq("r_regionkey", "r_name"))
    assert(src.count() == 0)
    assert(IndexJoin.lookup(spark, b, probe, "pk", "r_regionkey", 4).count() == 0)
  }
}
