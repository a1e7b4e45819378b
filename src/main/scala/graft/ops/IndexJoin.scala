package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Index join — the reference's `IndexJoinNode` + `IndexSourceNode`
  * (presto-spi/src/main/java/com/facebook/presto/spi/plan/IndexJoinNode.java,
  * presto-main-base/.../planner/plan/IndexSourceNode.java, planned by
  * IndexJoinOptimizer when the inner connector exposes a key index via
  * ConnectorIndexProvider): instead of scanning the inner side in full,
  * each probe key drives a lookup that touches only the index entries for
  * that key. The join types are INNER and SOURCE_OUTER (probe-preserving
  * left outer, IndexJoinNode.Type).
  *
  * Spark-first mapping: the "connector index" is a snapshot table laid
  * out as key-bucket partition directories (`_idx_bucket=N/`) — the same
  * role as the reference index's key→position map, durable and atomic via
  * SnapshotTable's commit pointer. A lookup computes the probe's DISTINCT
  * bucket ids (bounded by the bucket count — a few thousand ints at 100 TB,
  * never data-sized), then reads ONLY those bucket directories by path and
  * equi-joins inside them. The scan plan never lists or reads unmatched
  * buckets, so cost is O(matched buckets), not O(table): with 4096 buckets
  * a 10-key probe reads ~10/4096 of a 100 TB table. The probe side of an
  * index join is small by definition (that is when the reference's
  * IndexJoinOptimizer picks it), so the extra probe pass that derives the
  * bucket set is cheap, and Spark broadcasts the probe into the join.
  */
object IndexJoin {

  val BucketCol = "_idx_bucket"

  /** Deterministic key→bucket hash; the index's only physical contract.
    * xxhash64 is type-sensitive in Spark (an INT and a BIGINT holding the
    * same value hash differently), so the key is first canonicalized:
    * integral widths → bigint, float → double, everything else as-is.
    * Both build and probe go through this, so an INT probe against a
    * BIGINT index lands in the same bucket instead of silently missing. */
  def bucketExpr(key: Column, buckets: Int, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    val canon = dt match {
      case ByteType | ShortType | IntegerType | LongType => key.cast("bigint")
      case FloatType => key.cast("double")
      case _ => key
    }
    pmod(xxhash64(canon), lit(buckets.toLong)).cast("int")
  }

  private def keyType(df: DataFrame, keyCol: String) =
    df.schema(keyCol).dataType

  /** Build (or replace) the index: `df` bucketed on `keyCol` into
    * `buckets` partition directories, committed atomically. */
  def createIndex(s: SparkSession, base: java.io.File, df: DataFrame,
      keyCol: String, buckets: Int): Int =
    SnapshotTable.writePartitioned(s, base,
      df.withColumn(BucketCol,
        bucketExpr(col(keyCol), buckets, keyType(df, keyCol))),
      Seq(BucketCol))

  /** The index rows for the probe's key set: only matched bucket
    * directories are read. Exposed for tests that pin the access path. */
  def indexSource(s: SparkSession, base: java.io.File, probe: DataFrame,
      probeKey: String, buckets: Int): DataFrame = {
    val vdir = SnapshotTable.committedDir(base)
    val ids = probe.select(
      bucketExpr(col(probeKey), buckets, keyType(probe, probeKey)).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted // ≤ `buckets` ints
    val dirs = ids.map(b => new java.io.File(vdir, s"$BucketCol=$b"))
      .filter(_.isDirectory).map(_.getAbsolutePath)
    if (dirs.isEmpty)
      SnapshotTable.read(s, base).filter(lit(false)).drop(BucketCol)
    else
      s.read.option("basePath", vdir.getAbsolutePath)
        .parquet(dirs.toIndexedSeq: _*).drop(BucketCol)
  }

  /** INNER / SOURCE_OUTER ("left_outer") index lookup join. Probe and
    * index column names must be disjoint (the reference's IndexJoinNode
    * operates on distinct symbol sets on the two sides). */
  def lookup(s: SparkSession, base: java.io.File, probe: DataFrame,
      probeKey: String, indexKey: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val idx = indexSource(s, base, probe, probeKey, buckets)
    probe.join(idx, col(probeKey) === col(indexKey), joinType)
  }

  // ---- driver gate ----------------------------------------------------

  private def tmpBase(name: String) =
    new java.io.File(s"/tmp/graft_sources/index_$name")

  /** Sparse-probe lookup of customer rows by key: the index is customer
    * bucketed 64-way on c_custkey; the probe is the (small) set of orders
    * with o_orderkey % 997 = 0. Result equals the plain equi-join the
    * oracle states — the index only changes the access path. */
  def gateIndexJoin(s: SparkSession, dir: String): DataFrame = {
    val base = tmpBase("customer")
    SnapshotTable.drop(base)
    createIndex(s, base, Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
      "c_custkey", 64)
    val probe = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    lookup(s, base, probe, "o_custkey", "c_custkey", 64)
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "index_join" -> gateIndexJoin)

  val oracle: Map[String, String] = Map(
    "index_join" ->
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 997 = 0
        |ORDER BY o_orderkey""".stripMargin)
}
