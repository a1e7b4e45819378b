package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal Iceberg v1 TABLE READER — the reference ships a full connector
  * (presto-iceberg/); the table format itself is a public spec:
  *
  *  - `metadata/version-hint.text` names the current metadata version;
  *    `metadata/vN.metadata.json` carries `current-snapshot-id` and the
  *    snapshot list, each snapshot pointing at a MANIFEST LIST;
  *  - the manifest list is an Avro file of `manifest_path` entries; each
  *    manifest is an Avro file of entries with a `status` (1=ADDED,
  *    0=EXISTING, 2=DELETED) and a `data_file` record whose `file_path`
  *    names a parquet data file;
  *  - a snapshot scan = every non-DELETED data file reachable from the
  *    current snapshot's manifest list.
  *
  * Avro files embed their schemas, so the reader needs no hand-declared
  * schemas (avro-core's GenericDatumReader resolves by field name — real
  * Iceberg manifests with their many extra stats fields read the same
  * way). Identity-partitioned Iceberg data files physically CONTAIN
  * their partition columns, so no value injection is needed. Metadata
  * I/O is driver-side and KB-sized; the data scan is one multi-path
  * parquet read with pushdown intact — the same split the reference's
  * connector makes.
  *
  * v2 deletes are supported the Spark-native way — both kinds apply as
  * distributed LEFT ANTI joins, never per-file driver loops, which is
  * exactly how engines apply merge-on-read deletes at scale:
  *  - POSITIONAL (`data_file.content` = 1): parquet of (file_path, pos)
  *    rows, anti-joined against the scan's `_metadata.file_path` /
  *    `_metadata.row_index`;
  *  - EQUALITY (`content` = 2): parquet whose columns name the equality
  *    fields, anti-joined on those columns (null-safe equality, the
  *    spec's semantics for null equality fields).
  * Non-identity partition transforms are out of scope.
  */
object IcebergTable {

  private val mapper = new ObjectMapper()

  /** Resolve a spec path (absolute, file:-URI, or table-relative). */
  private def resolve(tableDir: File, p: String): File = {
    val clean = p.stripPrefix("file:")
    val f = new File(clean)
    if (f.isAbsolute) f else new File(tableDir, clean)
  }

  private def avroRecords(f: File): Seq[GenericRecord] = {
    val reader = DataFileReader.openReader(f,
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (reader.hasNext) out += reader.next()
      out.result()
    } finally reader.close()
  }

  private def loadMeta(dir: File): com.fasterxml.jackson.databind.JsonNode = {
    val metaDir = new File(dir, "metadata")
    require(metaDir.isDirectory, s"not an Iceberg table: $dir")
    val hint = new File(metaDir, "version-hint.text")
    val version =
      if (hint.isFile) new String(java.nio.file.Files.readAllBytes(
        hint.toPath), UTF_8).trim.toInt
      else Option(metaDir.listFiles()).getOrElse(Array.empty)
        .map(_.getName).collect {
          case n if n.matches("v\\d+\\.metadata\\.json") =>
            n.stripPrefix("v").stripSuffix(".metadata.json").toInt
        }.foldLeft(-1)(math.max)
    val metaFile = new File(metaDir, s"v$version.metadata.json")
    require(metaFile.isFile, s"missing $metaFile")
    mapper.readTree(new String(
      java.nio.file.Files.readAllBytes(metaFile.toPath), UTF_8))
  }

  /** The (content, file_path) entries live in snapshot `snapId`. */
  private def liveFiles(dir: File,
      meta: com.fasterxml.jackson.databind.JsonNode,
      snapId: Long): Seq[(Int, String)] = {
    val snaps = meta.get("snapshots")
    val manifestList = (0 until snaps.size()).map(snaps.get)
      .find(_.get("snapshot-id").asLong == snapId)
      .map(_.get("manifest-list").asText)
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot $snapId not in the table metadata"))
    val manifests = avroRecords(resolve(dir, manifestList))
      .map(_.get("manifest_path").toString)
    manifests.flatMap { m =>
      avroRecords(resolve(dir, m)).collect {
        case e if e.get("status").asInstanceOf[Int] != 2 =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          // v1 manifests have no content field (GenericRecord.get throws
          // on unknown names, so probe the schema) — v1 entries are data
          val content =
            if (df.getSchema.getField("content") == null) 0
            else df.get("content").asInstanceOf[Int]
          (content, df.get("file_path").toString)
      }
    }
  }

  /** Read the current snapshot of an Iceberg table directory. */
  def read(s: SparkSession, tableDir: String): DataFrame = {
    val meta = loadMeta(new File(tableDir))
    val snapId = meta.get("current-snapshot-id").asLong
    require(snapId >= 0, s"table has no current snapshot: $tableDir")
    readAt(s, tableDir, snapId)
  }

  /** Time travel: read snapshot `snapshotId` (the reference's
    * FOR VERSION AS OF surface over presto-iceberg). */
  def readAt(s: SparkSession, tableDir: String, snapshotId: Long): DataFrame = {
    val dir = new File(tableDir)
    val snapId = snapshotId
    val live = liveFiles(dir, loadMeta(dir), snapId)
    val dataFiles = live.collect { case (0, p) => p }
    val posDeletes = live.collect { case (1, p) => p }
    val eqDeletes = live.collect { case (2, p) => p }
    require(dataFiles.nonEmpty, s"snapshot $snapId has no data files")
    val data = s.read.parquet(dataFiles.map(resolve(dir, _).getPath): _*)
    import org.apache.spark.sql.functions._
    val afterPos = if (posDeletes.isEmpty) data
    else {
      // canonical absolute path: strip a file: scheme, collapse leading
      // slashes (the _metadata column renders file:///p, File.toURI file:/p)
      def canon(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(c, "^file:", ""), "^/+", "/")
      // stored paths may be full URIs (the spec's file_path IS a URI):
      // drop the scheme BEFORE deciding whether the path is absolute
      val fp = regexp_replace(col("file_path"), "^file:", "")
      val del = s.read
        .parquet(posDeletes.map(resolve(dir, _).getPath): _*)
        .select(canon(when(fp.startsWith("/"), fp)
          .otherwise(concat(lit(dir.getPath + "/"), fp)))
          .as("__del_fp"), col("pos").as("__del_pos"))
      val tagged = data
        .withColumn("__fp", canon(col("_metadata.file_path")))
        .withColumn("__pos", col("_metadata.row_index"))
      tagged.join(broadcast(del),
          tagged("__fp") === del("__del_fp") &&
            tagged("__pos") === del("__del_pos"), "left_anti")
        .drop("__fp", "__pos")
    }
    // each equality-delete file anti-joins on ITS OWN columns — merging
    // files with different column sets into one scan would null-pad the
    // missing fields and turn them into IS-NULL constraints that silently
    // disable the delete
    eqDeletes.foldLeft(afterPos) { (acc, f) =>
      val del = s.read.parquet(resolve(dir, f).getPath)
      val cond = del.columns.map(c => acc(c) <=> del(c)).reduce(_ && _)
      acc.join(broadcast(del), cond, "left_anti")
    }
  }

  /** The `"t$snapshots"` metadata table (reference presto-iceberg
    * SnapshotsTable): one row per known snapshot. */
  def snapshots(s: SparkSession, tableDir: String): DataFrame = {
    val meta = loadMeta(new File(tableDir))
    val current = meta.get("current-snapshot-id").asLong
    val snaps = meta.get("snapshots")
    import s.implicits._
    (0 until snaps.size()).map(snaps.get)
      .map(n => (n.get("snapshot-id").asLong,
        n.get("manifest-list").asText,
        n.get("snapshot-id").asLong == current))
      .toDF("snapshot_id", "manifest_list", "is_current")
  }

  /** The `"t$files"` metadata table: live files of the current snapshot
    * (content 0 = data, 1 = position deletes). */
  def files(s: SparkSession, tableDir: String): DataFrame = {
    val dir = new File(tableDir)
    val meta = loadMeta(dir)
    val snapId = meta.get("current-snapshot-id").asLong
    import s.implicits._
    liveFiles(dir, meta, snapId).toDF("content", "file_path")
  }

  // ---------- fixture writer (tests + the driver gate): minimal but
  // spec-shaped avro/json, so the reader exercised here reads the same
  // field names a real Iceberg writer produces

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  private val manifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":"long"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private def writeAvro(f: File, schema: Schema,
      records: Seq[GenericRecord]): Unit = {
    f.getParentFile.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    try records.foreach(w.append) finally w.close()
  }

  /** One manifest entry. status: 1=ADDED, 0=EXISTING, 2=DELETED;
    * content: 0=data, 1=position deletes. */
  final case class Entry(status: Int, dataFile: String, content: Int = 0)

  /** Write a manifest (entries) + manifest list + vN.metadata.json +
    * version-hint for snapshot `snapshotId`; data file paths are
    * table-relative. */
  def commitSnapshot(tableDir: File, version: Int, snapshotId: Long,
      entries: Seq[Entry]): Unit = {
    val metaDir = new File(tableDir, "metadata")
    metaDir.mkdirs()
    val manifest = new File(metaDir, s"manifest-$snapshotId.avro")
    writeAvro(manifest, manifestEntrySchema, entries.map { e =>
      val df = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      df.put("content", e.content)
      df.put("file_path", e.dataFile)
      df.put("file_format", "PARQUET")
      df.put("record_count", 0L)
      df.put("file_size_in_bytes", 0L)
      val r = new GenericData.Record(manifestEntrySchema)
      r.put("status", e.status)
      r.put("snapshot_id", snapshotId)
      r.put("data_file", df)
      r
    })
    val mlist = new File(metaDir, s"snap-$snapshotId.avro")
    writeAvro(mlist, manifestListSchema, Seq {
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", s"metadata/manifest-$snapshotId.avro")
      r.put("manifest_length", manifest.length())
      r.put("partition_spec_id", 0)
      r.put("added_snapshot_id", snapshotId)
      r
    })
    // carry prior snapshots forward (real metadata.json keeps the full
    // history — that is what time travel and $snapshots read)
    val prior = new File(metaDir, s"v${version - 1}.metadata.json")
    val priorSnaps: Seq[String] =
      if (!prior.isFile) Seq.empty
      else {
        val pm = mapper.readTree(new String(
          java.nio.file.Files.readAllBytes(prior.toPath), UTF_8))
        val arr = pm.get("snapshots")
        (0 until arr.size()).map(i => arr.get(i).toString)
          .filterNot(_.contains(s""""snapshot-id":$snapshotId"""))
      }
    val snapJson = (priorSnaps :+
      s"""{"snapshot-id":$snapshotId,"manifest-list":"metadata/snap-$snapshotId.avro"}""")
      .mkString("[", ",", "]")
    val metaJson =
      s"""{"format-version":1,"table-uuid":"graft-fixture","location":
         |"${tableDir.getPath}","current-snapshot-id":$snapshotId,
         |"snapshots":$snapJson}"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(
      new File(metaDir, s"v$version.metadata.json").toPath,
      metaJson.getBytes(UTF_8))
    java.nio.file.Files.write(
      new File(metaDir, "version-hint.text").toPath,
      version.toString.getBytes(UTF_8))
  }

  /** Write a v2 positional-delete file: (file_path, pos) rows naming
    * table-relative data files; returns the table-relative name. */
  def writeDeleteFile(s: SparkSession, tableDir: File, name: String,
      deletes: Seq[(String, Long)]): String = {
    import s.implicits._
    writeDataFile(deletes.toDF("file_path", "pos"), tableDir, name)
  }

  /** Write `df` as one parquet data file under data/ (table-relative
    * name returned). */
  def writeDataFile(df: DataFrame, tableDir: File, name: String): String = {
    val dataDir = new File(tableDir, "data")
    dataDir.mkdirs()
    val staging = new File(dataDir, s".staging_$name")
    df.coalesce(1).write.mode("overwrite").parquet(staging.getPath)
    val part = staging.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      new File(dataDir, name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    staging.listFiles().foreach(_.delete())
    staging.delete()
    s"data/$name"
  }
}
