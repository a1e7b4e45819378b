package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, File}
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hudi MERGE_ON_READ snapshot reads — the reference models log files per
  * split (presto-hudi/src/main/java/com/facebook/presto/hudi/HudiSplit
  * .java:39 `logFiles`; split generation in split/
  * HudiPartitionSplitGenerator.java) and merges them through Hudi's own
  * reader stack. This module hand-rolls the public log-file layout the
  * way ops/DeltaLake.scala and ops/IcebergTable.scala hand-roll theirs:
  *
  *  - a log file is named `.<fileId>_<baseInstant>.log.<version>_<token>`
  *    and belongs to the FILE SLICE whose base file committed at
  *    `baseInstant` — compaction writes a new base and starts a new slice,
  *    superseding older logs;
  *  - the file is a sequence of BLOCKS, each framed
  *    `#HUDI#` magic | format version | block type | header map |
  *    content length | content — the header carries the block's
  *    INSTANT_TIME (visibility: blocks of instants not completed on the
  *    timeline are skipped, exactly Hudi's log scanner rule) and the Avro
  *    writer SCHEMA;
  *  - a DATA block's content is a count + Avro-binary records (upserts);
  *    a DELETE block's content is a count + record keys (tombstones);
  *  - snapshot semantics per record key: latest-instant wins — a newer
  *    upsert replaces the base row, a newer delete removes it, a newer
  *    re-insert resurrects it.
  *
  * Spark-first merge shape: base files scan as ONE parquet read per base
  * instant (pushdown intact), log files scan DISTRIBUTED via the
  * binaryFile source with block parsing in executors (log bytes never
  * pass through the driver), and the per-key latest-wins fold is a
  * window over (key, partitionPath) — a hash shuffle on the merge key,
  * the same shape Hudi's realtime reader produces per split. Record keys
  * come from `hoodie.table.recordkey.fields` (single field supported;
  * composite keys are out of scope and error clearly).
  */
object HudiMor {

  private val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")
  private val FormatVersion = 1
  private val TypeData = 1
  private val TypeDelete = 2
  private val HdrInstant = 0
  private val HdrSchema = 2

  /** `.gN_001.log.1_0-0-0` → (fileId, baseInstant, logVersion). */
  private val LogName = """\.(.+)_(\d+)\.log\.(\d+)_(.+)""".r

  // ---------- avro <-> spark row (flat schemas; the types Hudi fixtures
  // and TPC-H columns use)

  private[ops] def avroSchemaFor(st: StructType): Schema = {
    def leaf(dt: DataType): String = dt match {
      case LongType => "long"
      case IntegerType => "int"
      case DoubleType => "double"
      case FloatType => "float"
      case BooleanType => "boolean"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"MoR log codec supports flat long/int/double/float/boolean/" +
          s"string columns; got $other")
    }
    val fields = st.fields.map(f =>
      s"""{"name":"${f.name}","type":["null","${leaf(f.dataType)}"],"default":null}""")
      .mkString("[", ",", "]")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"hudi_log","fields":$fields}""")
  }

  private def fromAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case other => dt match {
      case LongType => other.asInstanceOf[Number].longValue
      case IntegerType => other.asInstanceOf[Number].intValue
      case DoubleType => other.asInstanceOf[Number].doubleValue
      case FloatType => other.asInstanceOf[Number].floatValue
      case StringType => other.toString
      case _ => other
    }
  }

  private def castKey(key: String, dt: DataType): Any = dt match {
    case LongType => key.toLong
    case IntegerType => key.toInt
    case StringType => key
    case DoubleType => key.toDouble
    case other => throw new IllegalArgumentException(
      s"record key type $other unsupported")
  }

  // ---------- block framing

  private def writeHeader(out: DataOutputStream,
      headers: Seq[(Int, String)]): Unit = {
    out.writeInt(headers.size)
    headers.foreach { case (k, v) => out.writeInt(k); out.writeUTF(v) }
  }

  private def readHeader(in: DataInputStream): Map[Int, String] = {
    val n = in.readInt()
    (0 until n).map(_ => in.readInt() -> in.readUTF()).toMap
  }

  /** One parsed block: (instant, isDelete, rows) where a delete row is
    * (key string); a data row is the decoded record values. */
  private[ops] def parseBlocks(bytes: Array[Byte], schema: StructType)
      : Seq[(String, Boolean, Seq[Any])] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, Boolean, Seq[Any])]
    val magicBuf = new Array[Byte](Magic.length)
    while (in.available() > 0) {
      in.readFully(magicBuf)
      require(java.util.Arrays.equals(magicBuf, Magic),
        "corrupt Hudi log block: bad magic")
      val ver = in.readInt()
      require(ver == FormatVersion, s"unsupported log format version $ver")
      val blockType = in.readInt()
      val headers = readHeader(in)
      val instant = headers.getOrElse(HdrInstant,
        throw new IllegalArgumentException("log block missing INSTANT_TIME"))
      val len = in.readLong()
      val content = new Array[Byte](len.toInt)
      in.readFully(content)
      val cin = new DataInputStream(new ByteArrayInputStream(content))
      blockType match {
        case TypeData =>
          val writerSchema = new Schema.Parser().parse(headers.getOrElse(
            HdrSchema, throw new IllegalArgumentException(
              "data block missing SCHEMA header")))
          val count = cin.readInt()
          val reader = new GenericDatumReader[GenericRecord](writerSchema)
          val dec = DecoderFactory.get()
            .binaryDecoder(content, 4, content.length - 4, null)
          var i = 0
          var rec: GenericRecord = null
          while (i < count) {
            rec = reader.read(rec, dec)
            val vals = schema.fields.map { f =>
              val av = if (writerSchema.getField(f.name) == null) null
              else rec.get(f.name)
              fromAvro(av, f.dataType)
            }.toSeq
            out += ((instant, false, vals))
            // rec is reused as a decode buffer; copy happened via vals
            rec = null
            i += 1
          }
        case TypeDelete =>
          val count = cin.readInt()
          (0 until count).foreach { _ =>
            out += ((instant, true, Seq(cin.readUTF())))
          }
        case other =>
          throw new IllegalArgumentException(s"unknown log block type $other")
      }
    }
    out.result()
  }

  // ---------- snapshot read

  /** Merge base files + visible log blocks into the snapshot. Called by
    * HudiCow.readAt once hoodie.properties says MERGE_ON_READ.
    * `groups`: the chosen file slices — (partitionPath, fileId,
    * baseInstant, baseFile). `completed`: instants visible on the
    * timeline (commit + deltacommit, asOf-filtered). */
  private[ops] def read(s: SparkSession, tableDir: File,
      groups: Seq[(String, String, String, File)],
      completed: Set[String], keyField: String): DataFrame = {
    require(groups.nonEmpty, s"no committed base files under $tableDir")
    // log files attach to the slice whose baseInstant matches the chosen
    // base file — logs of compacted-away slices are superseded
    val sliceKeys = groups.map { case (p, id, bi, _) => (p, id, bi) }.toSet
    val logFiles = listLogFiles(tableDir, "").filter { case (p, id, bi, _) =>
      sliceKeys((p, id, bi))
    }
    // base scan: one multi-path read per base instant, ordinal = instant;
    // the partition path derives from _metadata.file_path (ONE scan per
    // instant even across thousands of partitions) — merge keys are
    // per-partition, matching Hudi's default non-global index where the
    // same record key may legitimately live in two partitions
    val dirPrefix = java.util.regex.Pattern.quote(
      tableDir.getCanonicalPath + "/")
    val partFromPath =
      regexp_replace(regexp_replace(regexp_replace(
        col("_metadata.file_path"), "^file:/*", "/"),
        "^" + dirPrefix, ""), "/?[^/]+$", "")
    val baseDf = groups.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (instant, fs) =>
        s.read.parquet(fs.map(_._4.getPath): _*)
          .withColumn("__hoodie_part", partFromPath)
          .withColumn("__hoodie_ord", lit(instant))
          .withColumn("__hoodie_log", lit(false))
          .withColumn("__hoodie_del", lit(false))
    }.reduce(_ union _)
    val schema = StructType(baseDf.schema.fields
      .filterNot(_.name.startsWith("__hoodie_")))
    require(schema.fieldNames.contains(keyField),
      s"record key field $keyField not in table schema " +
        schema.fieldNames.mkString("(", ",", ")"))
    val keyType = schema(keyField).dataType
    if (logFiles.isEmpty) return baseDf.select(
      schema.fieldNames.map(col).toIndexedSeq: _*)
    // log scan: distributed block parse — executors read and decode the
    // log bytes; the driver only listed names
    val outSchema = schema
      .add("__hoodie_part", StringType)
      .add("__hoodie_ord", StringType).add("__hoodie_log", BooleanType)
      .add("__hoodie_del", BooleanType)
    val keyIdx = schema.fieldIndex(keyField)
    val nData = schema.size
    // one task per log file, bytes read AND decoded in the executor (the
    // driver only listed names). NOT the binaryFile source: Hadoop's
    // hidden-file filter would silently skip the dot-prefixed log names.
    val logPaths = logFiles.map(lf => (lf._4.getPath, lf._1))
    val logRdd = s.sparkContext
      .parallelize(logPaths, logPaths.size)
      .flatMap { case (p, part) =>
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p))
        parseBlocks(bytes, schema).collect {
          // blocks of uncommitted / post-asOf instants are invisible
          case (instant, isDel, vals) if completed(instant) =>
            if (isDel) {
              val arr = new Array[Any](nData + 4)
              arr(keyIdx) = castKey(vals.head.asInstanceOf[String], keyType)
              arr(nData) = part; arr(nData + 1) = instant
              arr(nData + 2) = true; arr(nData + 3) = true
              Row.fromSeq(arr.toIndexedSeq)
            } else Row.fromSeq(vals ++ Seq(part, instant, true, false))
        }
      }
    val logDf = s.createDataFrame(logRdd, outSchema)
    // latest-ordinal wins per (partitionPath, recordKey) — Hudi's default
    // index is partition-scoped, so the same key in two partitions is two
    // records; a log row at the same instant as the base beats it (the
    // base was written by that commit, the log amends it)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__hoodie_part"), col(keyField))
      .orderBy(col("__hoodie_ord").desc, col("__hoodie_log").desc)
    baseDf.union(logDf)
      .withColumn("__hoodie_rn", row_number().over(w))
      .filter(col("__hoodie_rn") === 1 && !col("__hoodie_del"))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** (partitionPath, fileId, baseInstant, file) for every log file. */
  private def listLogFiles(dir: File, rel: String)
      : Seq[(String, String, String, File)] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
      case d if d.isDirectory && d.getName != ".hoodie" &&
          !d.getName.startsWith(".") =>
        listLogFiles(d, if (rel.isEmpty) d.getName else s"$rel/${d.getName}")
      case f if f.isFile => f.getName match {
        case LogName(fileId, baseInstant, _, _) =>
          Seq((rel, fileId, baseInstant, f))
        case _ => Seq.empty
      }
      case _ => Seq.empty
    }

  // ---------- fixture writer (tests + the driver gate; production log
  // files come from real Hudi writers)

  sealed trait LogBlock { def instant: String }
  /** Upserts: full records at `instant`. */
  final case class DataBlock(instant: String, rows: Seq[Row],
      schema: StructType) extends LogBlock
  /** Tombstones: record keys deleted at `instant`. */
  final case class DeleteBlock(instant: String, keys: Seq[String])
      extends LogBlock

  /** Append blocks as one log file of the (fileId, baseInstant) slice. */
  def writeLogFile(tableDir: File, partition: String, fileId: String,
      baseInstant: String, version: Int, blocks: Seq[LogBlock]): Unit = {
    val dest = if (partition.isEmpty) tableDir
    else new File(tableDir, partition)
    dest.mkdirs()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    blocks.foreach {
      case DataBlock(instant, rows, schema) =>
        val avroSchema = avroSchemaFor(schema)
        val cbos = new ByteArrayOutputStream()
        val cout = new DataOutputStream(cbos)
        cout.writeInt(rows.size)
        val enc = EncoderFactory.get().binaryEncoder(cbos, null)
        val writer = new GenericDatumWriter[GenericRecord](avroSchema)
        rows.foreach { r =>
          val rec = new GenericData.Record(avroSchema)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name, r.get(i))
          }
          writer.write(rec, enc)
        }
        enc.flush()
        out.write(Magic); out.writeInt(FormatVersion); out.writeInt(TypeData)
        writeHeader(out, Seq(HdrInstant -> instant,
          HdrSchema -> avroSchema.toString))
        val content = cbos.toByteArray
        out.writeLong(content.length.toLong); out.write(content)
      case DeleteBlock(instant, keys) =>
        val cbos = new ByteArrayOutputStream()
        val cout = new DataOutputStream(cbos)
        cout.writeInt(keys.size)
        keys.foreach(cout.writeUTF)
        out.write(Magic); out.writeInt(FormatVersion)
        out.writeInt(TypeDelete)
        writeHeader(out, Seq(HdrInstant -> instant))
        val content = cbos.toByteArray
        out.writeLong(content.length.toLong); out.write(content)
    }
    out.flush()
    java.nio.file.Files.write(
      new File(dest, s".${fileId}_$baseInstant.log.${version}_0-0-0").toPath,
      bos.toByteArray)
  }
}
