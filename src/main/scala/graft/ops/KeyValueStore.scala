package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Key-value store connector — the Spark-first analogue of the
  * reference's Redis connector (presto-redis). The reference exposes a
  * keyspace as tables by three mechanisms, all reproduced here over a
  * KV snapshot (key string, value string, value hash-map):
  *
  *  - TABLE ROUTING by key prefix: keys follow `schema:table:*` and the
  *    scan matches that pattern (RedisRecordCursor.setScanParams:263-287,
  *    key-prefix-schema-table mode) — here a StartsWith filter the
  *    planner pushes into the parquet scan;
  *  - VALUE DECODE: STRING values run through the same row-decoder
  *    surface the Kafka connector uses (RedisDecoderModule reuses the
  *    presto-record-decoder field decoders; here ops/RecordDecoders,
  *    the same module the Kafka stand-in decodes with), HASH values
  *    surface fields by map lookup (RedisRecordCursor.fetchData:324-349:
  *    STRING → decoder, HASH → hgetAll map);
  *  - ZSET KEY SOURCE: a sorted set supplies the key list and splits
  *    carve rank ranges zrange(start, end)
  *    (RedisRecordCursor.fetchKeys:312-315) — here a row_number rank
  *    over the sorted key snapshot, bounded per split.
  *
  * 100 TB shape: the prefix filter prunes at the scan (StartsWith reaches
  * PushedFilters), decode is a per-row projection at scan speed, and the
  * zset rank-split is how a real deployment shards a giant keyspace scan
  * across workers. */
object KeyValueStore {

  private def tmp(name: String): String = s"/tmp/graft_kv/$name"

  /** The `schema:table:*` scan pattern (default schema unprefixed, like
    * setScanParams). */
  def keyPattern(schema: String, table: String, delim: String = ":"): String =
    (if (schema == "default") "" else schema + delim) + table + delim

  /** Table scan = prefix match over the keyspace. */
  def scanTable(kv: DataFrame, schema: String, table: String,
      delim: String = ":"): DataFrame =
    kv.where(col("key").startsWith(keyPattern(schema, table, delim)))

  /** ZSET split: keys ranked by score, split = [start, end] ranks
    * (zrange is inclusive on both bounds). */
  def zrangeKeys(kv: DataFrame, scoreCol: String, start: Long,
      end: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol), col("key"))
    kv.withColumn("_rank", row_number().over(w) - 1)
      .where(col("_rank") >= start && col("_rank") <= end)
      .drop("_rank")
  }

  /** HASH-value field access (fetchData's hgetAll map → columns). */
  def hashField(vmap: Column, field: String, typ: String): Column =
    element_at(vmap, field).cast(typ)

  // ------------------------------------------------------------------ gates

  /** Customers as a keyspace: key `tpch:customer:<id>`, STRING value a
    * JSON document (decoded through the shared RecordDecoders surface),
    * HASH value a field map. The gate scans by table prefix, parses the
    * id from the key, JSON-decodes name/acctbal, map-reads the segment —
    * every routing/decode mechanism in one oracle-verified pass. */
  def kvTableGate(s: SparkSession, dir: String): DataFrame = {
    val path = tmp("keyspace")
    Tables(s, dir, "customer")
      .select(
        concat(lit("tpch:customer:"), col("c_custkey")).as("key"),
        concat(lit("{\"name\":\""), col("c_name"),
          lit("\",\"acctbal\":"), col("c_acctbal").cast("string"),
          lit("}")).as("value"),
        map(lit("segment"), col("c_mktsegment"),
          lit("nation"), col("c_nationkey").cast("string")).as("vmap"))
      .write.mode("overwrite").parquet(path)

    val table = scanTable(s.read.parquet(path), "tpch", "customer")
    val decoded = RecordDecoders.decode(
      table, "json",
      Seq(RecordDecoders.Field("c_name", "string", "name"),
        RecordDecoders.Field("c_acctbal", "double", "acctbal")),
      keep = Seq("key", "vmap"))
    decoded
      .select(
        element_at(split(col("key"), ":"), 3).cast("long").as("c_custkey"),
        col("c_name"), col("c_acctbal"),
        hashField(col("vmap"), "segment", "string").as("c_mktsegment"),
        hashField(col("vmap"), "nation", "int").as("c_nationkey"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_kv_table" -> kvTableGate)

  val oracle: Map[String, String] = Map(
    "src_kv_table" ->
      """SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
        |  CAST(c_nationkey AS INTEGER) AS c_nationkey
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
