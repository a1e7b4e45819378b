package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Source/sink format coverage (SURVEY.md §2.2: connector SPI +
  * presto-orc/OrcReader.java:64, presto-parquet/ParquetReader.java:101,
  * hive text/CSV serdes). Each query is a write→read round-trip through a
  * non-parquet format; the oracle reads the ORIGINAL parquet, so a pass
  * proves the format preserved values exactly.
  *
  * The partitioned variant writes `partitionBy(key)` and reads back with a
  * key predicate — at scale this is the partition-pruning path (only
  * matching directories are listed/scanned; `.explain` shows
  * PartitionFilters). */
object Sources {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private def tmp(name: String): String = s"/tmp/graft_sources/$name"

  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("nation_csv")
    val src = t(s, dir, "nation")
    src.write.mode("overwrite").option("header", "true").csv(out)
    s.read.option("header", "true").schema(src.schema).csv(out)
      .orderBy("n_nationkey")
  }

  def jsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("supplier_json")
    val src = t(s, dir, "supplier")
    src.write.mode("overwrite").json(out)
    s.read.schema(src.schema).json(out)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("region_orc")
    val src = t(s, dir, "region")
    src.write.mode("overwrite").orc(out)
    s.read.orc(out).orderBy("r_regionkey")
  }

  /** Hive-style partitioned parquet sink + pruned scan: only the
    * o_orderstatus=F directory is read back (PartitionFilters in the plan,
    * the DSv2 analogue of PickTableLayout.java:77's TupleDomain pushdown). */
  def partitionedPruned(s: SparkSession, dir: String): DataFrame = {
    val out = tmp("orders_part")
    t(s, dir, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    s.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        Tables.dsum(col("o_totalprice"), "total"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_roundtrip" -> csvRoundtrip,
    "src_json_roundtrip" -> jsonRoundtrip,
    "src_orc_roundtrip" -> orcRoundtrip,
    "src_partitioned_pruned" -> partitionedPruned)

  val oracle: Map[String, String] = Map(
    "src_csv_roundtrip" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "src_json_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "src_orc_roundtrip" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "src_partitioned_pruned" ->
      """SELECT o_orderpriority, count(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
