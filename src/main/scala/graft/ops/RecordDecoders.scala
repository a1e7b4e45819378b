package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Message-field decoders — the reference's presto-record-decoder module
  * (RowDecoder SPI; json/JsonRowDecoder.java + field decoders, csv/
  * CsvRowDecoder.java, raw/RawRowDecoder.java), the layer Kafka/Redis
  * topic descriptions use to map an opaque message payload onto typed
  * columns. A field is (name, type, mapping[, dataFormat]):
  *
  *  - json: mapping is a slash-separated path into the document
  *    (JsonRowDecoder walks nested nodes); dataFormat selects a temporal
  *    field decoder (iso8601 / seconds- / milliseconds-since-epoch,
  *    reference json/ISO8601JsonFieldDecoder.java etc.)
  *  - csv: mapping is the zero-based column index (CsvRowDecoder)
  *  - raw: mapping is a byte range `start:end` and dataFormat a type hint
  *    (BYTE/SHORT/INT/LONG/FLOAT/DOUBLE) decoded BIG-endian, exactly
  *    RawRowDecoder's ByteBuffer reads — mapped onto the codegen'd
  *    from_big_endian / from_ieee754 kernels
  *
  * All three decoders are per-row projections over builtins/codegen'd
  * expressions: at 100 TB a topic scan decodes at full scan speed with
  * no shuffle. */
object RecordDecoders {

  final case class Field(name: String, typ: String, mapping: String,
      dataFormat: String = "")

  def jsonField(value: Column, f: Field): Column = {
    val path = "$." + f.mapping.split('/').mkString(".")
    val raw = get_json_object(value, path)
    (f.dataFormat match {
      case "iso8601" => to_timestamp(raw)
      case "seconds-since-epoch" => timestamp_seconds(raw.cast("long"))
      case "milliseconds-since-epoch" => timestamp_millis(raw.cast("long"))
      case _ => raw.cast(f.typ)
    }).as(f.name)
  }

  def csvField(value: Column, f: Field): Column =
    element_at(split(value, ","), f.mapping.toInt + 1).cast(f.typ).as(f.name)

  def rawField(value: Column, f: Field): Column = {
    val Array(st, en) = f.mapping.split(':').map(_.toInt)
    val bytes = substring(value, st + 1, en - st)
    val g = graft.functions.GraftFunctions
    (f.dataFormat match {
      case "LONG" => g.binConv(bytes, "from_big_endian_64")
      case "INT" => g.binConv(bytes, "from_big_endian_32")
      case "DOUBLE" => g.binConv(bytes, "from_ieee754_64")
      case "FLOAT" => g.binConv(bytes, "from_ieee754_32")
      case "BYTE" => conv(hex(bytes), 16, 10).cast("tinyint")
      case "SHORT" => conv(hex(bytes), 16, 10).cast("smallint")
      case other => throw new IllegalArgumentException(
        s"unsupported raw format hint: $other")
    }).cast(f.typ).as(f.name)
  }

  /** Decode a message frame's `value` column per a topic description's
    * field list (the reference's KafkaTopicDescription.message shape). */
  def decode(df: DataFrame, dataFormat: String, fields: Seq[Field],
      keep: Seq[String] = Seq.empty): DataFrame = {
    val v = col("value")
    val decoded = fields.map { f =>
      dataFormat match {
        case "json" => jsonField(v.cast("string"), f)
        case "csv" => csvField(v.cast("string"), f)
        case "raw" => rawField(v, f)
        case other => throw new IllegalArgumentException(
          s"unsupported dataFormat: $other")
      }
    }
    df.select(keep.map(col) ++ decoded: _*)
  }

  /** Gate: the SAME events slice encoded as a json document (nested ids
    * node) and as a csv line — both payloads built by deterministic
    * string concat so the oracle constructs byte-identical messages —
    * decoded through the topic-description surface and joined; any
    * mapping slip (wrong path, wrong index, wrong cast) breaks the
    * equality columns or the hash. */
  def decoderGate(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").filter(col("event_id") <= 1000)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val jsonMsgs = ev.select(concat(
      lit("""{"ids":{"event":"""), col("event_id"),
      lit(""","user":"""), col("user_id"),
      lit("""},"type":""""), col("event_type"), lit("\"}"))
      .cast("binary").as("value"))
    val csvMsgs = ev.select(concat_ws(",",
      col("event_id"), col("user_id"), col("event_type"))
      .cast("binary").as("value"))
    val fromJson = decode(jsonMsgs, "json", Seq(
      Field("event_id", "long", "ids/event"),
      Field("user_id", "long", "ids/user"),
      Field("event_type", "string", "type")))
    val fromCsv = decode(csvMsgs, "csv", Seq(
      Field("event_id", "long", "0"),
      Field("user_id", "long", "1"),
      Field("event_type", "string", "2")))
    fromJson.join(fromCsv, Seq("event_id", "user_id", "event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_record_decoders" -> decoderGate)

  val oracle: Map[String, String] = Map(
    "src_record_decoders" ->
      """WITH ev AS (SELECT event_id, user_id, event_type FROM events
        |            WHERE event_id <= 1000),
        |jm AS (SELECT '{"ids":{"event":' || event_id || ',"user":'
        |         || user_id || '},"type":"' || event_type || '"}' AS value
        |       FROM ev),
        |cm AS (SELECT event_id || ',' || user_id || ',' || event_type AS value
        |       FROM ev),
        |fj AS (SELECT CAST(json_extract_string(value, '$.ids.event') AS BIGINT)
        |         AS event_id,
        |        CAST(json_extract_string(value, '$.ids.user') AS BIGINT)
        |         AS user_id,
        |        json_extract_string(value, '$.type') AS event_type
        |       FROM jm),
        |fc AS (SELECT CAST(string_split(value, ',')[1] AS BIGINT) AS event_id,
        |        CAST(string_split(value, ',')[2] AS BIGINT) AS user_id,
        |        string_split(value, ',')[3] AS event_type
        |       FROM cm)
        |SELECT fj.event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(fj.event_id) AS BIGINT) AS id_sum,
        |  CAST(count(DISTINCT fj.user_id) AS BIGINT) AS n_users
        |FROM fj JOIN fc USING (event_id, user_id, event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
