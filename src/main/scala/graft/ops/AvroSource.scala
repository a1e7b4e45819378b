package graft.ops

import java.io.File
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink — the reference reads Avro Hive
  * tables through its hive connector page sources (presto-hive
  * GenericHiveRecordCursor over avro SerDe; the format itself is the
  * public Avro 1.x container spec). Spark ships avro-core but not the
  * spark-avro DataSource in this build, so the codec is hand-rolled the
  * way the Iceberg reader's manifest decoding already is:
  *
  *  - WRITE: fully distributed — every partition serializes its rows to
  *    one container file (deflate-less, schema in the header) named by
  *    its partition id; the driver only creates the directory.
  *  - READ: the driver lists *.avro (names only), takes the writer
  *    schema from ONE file header (KBs), and the file list parallelizes
  *    across the cluster — each task streams its files through
  *    GenericDatumReader. Column pruning happens post-decode (Avro is
  *    row-major; the reference's cursor pays the same decode cost).
  *
  * Types: the ANSI core both engines share — boolean/int/bigint/real/
  * double/varchar/varbinary plus date and timestamp-micros logical
  * types, each nullable via the standard ["null", T] union. Anything
  * else refuses loudly rather than miswriting. */
object AvroSource {

  // ---------- schema mapping

  private def avroBase(dt: DataType): String = dt match {
    case BooleanType => "\"boolean\""
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case StringType => "\"string\""
    case BinaryType => "\"bytes\""
    case DateType => """{"type":"int","logicalType":"date"}"""
    case TimestampType =>
      """{"type":"long","logicalType":"timestamp-micros"}"""
    case TimestampNTZType =>
      """{"type":"long","logicalType":"local-timestamp-micros"}"""
    case other => throw new IllegalArgumentException(
      s"avro sink: unsupported type ${other.simpleString} " +
        "(supported: boolean/int/bigint/real/double/varchar/varbinary/" +
        "date/timestamp)")
  }

  private[ops] def avroSchemaJson(schema: StructType,
      name: String = "graft_record"): String = {
    val fields = schema.fields.map { f =>
      val base = avroBase(f.dataType)
      val t = if (f.nullable) s"""["null",$base]""" else base
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  private def unwrapUnion(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.toArray.map(_.asInstanceOf[Schema])
        .filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1,
        s"avro source: only ['null', T] unions are supported, got $s")
      (nonNull.head, true)
    } else (s, false)

  private[ops] def toSparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"avro source: top-level schema must be a record, got ${avro.getType}")
    StructType(avro.getFields.toArray.map(_.asInstanceOf[Schema.Field]).map {
      f =>
        val (base, nullable) = unwrapUnion(f.schema())
        val logical = Option(base.getLogicalType).map(_.getName).getOrElse("")
        val dt = (base.getType, logical) match {
          case (Schema.Type.BOOLEAN, _) => BooleanType
          case (Schema.Type.INT, "date") => DateType
          case (Schema.Type.INT, _) => IntegerType
          case (Schema.Type.LONG, "timestamp-micros") => TimestampType
          case (Schema.Type.LONG, "local-timestamp-micros") =>
            TimestampNTZType
          case (Schema.Type.LONG, _) => LongType
          case (Schema.Type.FLOAT, _) => FloatType
          case (Schema.Type.DOUBLE, _) => DoubleType
          case (Schema.Type.STRING, _) => StringType
          case (Schema.Type.BYTES, _) => BinaryType
          case (t, _) => throw new IllegalArgumentException(
            s"avro source: unsupported field type $t for ${f.name}")
        }
        StructField(f.name, dt, nullable)
    })
  }

  // ---------- value conversion

  private def toAvro(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case DateType => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case TimestampType =>
        val t = v.asInstanceOf[java.sql.Timestamp]
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case _ => v
    }

  private def fromAvro(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // avro Utf8
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        t
      case TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case BinaryType =>
        val b = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](b.remaining())
        b.duplicate().get(out)
        out
      case _ => v
    }

  // ---------- sink

  /** Write `df` as a directory of Avro container files, one per
    * partition (distributed; the driver never sees rows). Returns the
    * row count. */
  def write(df: DataFrame, path: String): Long = {
    val schema = df.schema
    val json = avroSchemaJson(schema)
    val dir = new File(path)
    dir.mkdirs()
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).foreach(_.delete())
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator(0L)
      else {
        val asch = new Schema.Parser().parse(json)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](asch))
        w.create(asch, new File(dir, f"part-$pid%05d.avro"))
        var n = 0L
        try rows.foreach { r =>
          val rec = new GenericData.Record(asch)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name, toAvro(r.get(i), f.dataType))
          }
          w.append(rec)
          n += 1
        } finally w.close()
        Iterator(n)
      }
    }.sum().toLong
  }

  // ---------- source

  /** Read a directory of Avro container files. Schema comes from one
    * file header; the file list fans out across tasks. */
  def read(s: SparkSession, path: String): DataFrame = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".avro"))
      .map(_.getPath).sorted.toSeq
    require(files.nonEmpty, s"no .avro files under $path")
    val (schemaJson, sparkSchema) = {
      val r = new DataFileReader(new File(files.head),
        new GenericDatumReader[GenericRecord]())
      try (r.getSchema.toString, toSparkSchema(r.getSchema))
      finally r.close()
    }
    val rdd = s.sparkContext
      .parallelize(files, math.min(files.length, 32))
      .flatMap { f =>
        val asch = new Schema.Parser().parse(schemaJson)
        val rd = new DataFileReader(new File(f),
          new GenericDatumReader[GenericRecord](asch))
        val fields = toSparkSchema(asch).fields
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = rd.hasNext
            if (!h) rd.close()
            h
          }
          def next(): Row = {
            val rec = rd.next()
            Row.fromSeq(fields.toSeq.map(fd =>
              fromAvro(rec.get(fd.name), fd.dataType)))
          }
        }
      }
    s.createDataFrame(rdd, sparkSchema)
  }

  // ---------- driver gates

  private def tmpDir(name: String): String = {
    val d = new File(System.getProperty("java.io.tmpdir"),
      s"graft_$name")
    d.getPath
  }

  /** Roundtrip the events slice (covers bigint/timestamp/varchar/double)
    * through the avro sink + source. */
  def gateRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val src = graft.Tables(s, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .where(org.apache.spark.sql.functions.col("event_id") % 7 === 0)
    val out = tmpDir("events_avro")
    write(src, out)
    read(s, out).orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_avro_roundtrip" -> gateRoundtrip)

  val oracle: Map[String, String] = Map(
    "src_avro_roundtrip" ->
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events WHERE event_id % 7 = 0
        |ORDER BY event_id""".stripMargin)
}
