package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MERGE outcome counts, shared by the Delta (copy-on-write) and Iceberg
  * (merge-on-read) writers. */
final case class MergeStats(updated: Long, deleted: Long, inserted: Long)

/** Minimal Delta Lake TABLE READER — the reference ships a full connector
  * (presto-delta/); the protocol itself is public: a table is a directory
  * of parquet data files plus `_delta_log/<version 20-digit>.json` commit
  * files whose newline-delimited JSON actions (`metaData`, `add`,
  * `remove`, `protocol`) replay to the current snapshot. This reader
  * hand-rolls that replay (the offline build reaches no Delta library):
  *
  *  - commits apply in version order; within the log, the LAST `metaData`
  *    wins (schema evolution), an `add` activates a data file, a `remove`
  *    deactivates it (path-keyed, the protocol's tombstone rule);
  *  - `schemaString` is Spark's own DataType JSON — `DataType.fromJson`
  *    parses it directly (Delta serializes Spark schemas);
  *  - partitioned tables store partition values in `add.partitionValues`
  *    (data files do NOT carry those columns): files group by their
  *    partition tuple and each group's columns are injected as typed
  *    literals, so partition pruning happens before any parquet I/O when
  *    a filter lands on them (Catalyst folds the literal comparison).
  *
  * Scale note: replay reads ONLY the JSON log (KBs per commit), never
  * data; the data scan is a plain multi-file parquet read with pushdown
  * and pruning intact — exactly how the reference connector maps Delta
  * metadata onto its Hive-style parquet scan. Checkpoint compaction is
  * supported: `_last_checkpoint` + `<v>.checkpoint.parquet` (or the
  * multi-part `<v>.checkpoint.<i>.<N>.parquet` family when `parts` is
  * recorded) seed the snapshot and only later JSON commits replay, so
  * the reader survives log retention and replay stays O(commits since
  * checkpoint).
  */
object DeltaLake {

  private val mapper = new ObjectMapper()

  private final case class AddFile(path: String,
      partitionValues: Map[String, String],
      dv: Option[DeletionVectors.Descriptor] = None)

  /** Reader feature set (Delta spec "Protocol Evolution"): versions 1-2
    * outright (plain replay + column mapping `name`), version 3 when
    * every advertised readerFeature is one this reader implements —
    * deletion vectors and column mapping. Anything else (v2 checkpoints,
    * type widening, …) refuses rather than silently misreads. */
  private val SupportedReaderFeatures =
    Set("deletionVectors", "columnMapping", "timestampNtz")

  private def checkProtocol(minReader: Int, features: Seq[String]): Unit =
    require(minReader <= 2 ||
      (minReader == 3 && features.forall(SupportedReaderFeatures)),
      s"unsupported Delta reader protocol: minReaderVersion=$minReader" +
        (if (features.nonEmpty) s" readerFeatures=${features.mkString(",")}"
         else "") +
        s" (supported: reader versions 1-2, and 3 with features " +
        s"${SupportedReaderFeatures.mkString("/")})")

  /** Table features riding on metaData.configuration: column mapping
    * `name` mode is implemented (physical names come from the schema's
    * per-field `delta.columnMapping.physicalName` metadata); `id` mode
    * needs parquet field-id resolution and is refused, not misread. */
  private def checkTableConfig(cfg: Map[String, String]): Unit = {
    val mode = cfg.getOrElse("delta.columnMapping.mode", "none")
    require(mode == "none" || mode == "name",
      s"unsupported Delta table feature: delta.columnMapping.mode=$mode")
  }

  /** The parquet-side name of a logical column under column mapping
    * `name` mode (identity without mapping). add.partitionValues keys
    * are ALSO physical names. */
  private def physName(f: StructField): String =
    if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  private def hasMapping(schema: StructType): Boolean =
    schema.fields.exists(f =>
      f.metadata.contains("delta.columnMapping.physicalName"))

  private def parseDv(a: com.fasterxml.jackson.databind.JsonNode)
      : Option[DeletionVectors.Descriptor] =
    Option(a.get("deletionVector")).filterNot(_.isNull).map { d =>
      DeletionVectors.Descriptor(
        d.get("storageType").asText,
        d.get("pathOrInlineDv").asText,
        Option(d.get("offset")).map(_.asInt).getOrElse(1),
        d.get("sizeInBytes").asInt,
        Option(d.get("cardinality")).map(_.asLong).getOrElse(-1L))
    }

  /** Writers refuse tables whose snapshot carries deletion vectors:
    * rewriting or checkpointing a DV'd file without honoring its vector
    * would resurrect deleted rows. Read support only. */
  private def requireNoDv(files: Seq[AddFile], op: String): Unit =
    require(files.forall(_.dv.isEmpty),
      s"$op on a Delta table with deletion vectors is unsupported " +
        "(read support only)")


  /** Resolve an add.path against the table root. The spec allows ABSOLUTE
    * paths/URIs (shallow clones reference another table's files in
    * place); relative paths are table-rooted. */
  private def resolvePath(dir: File, path: String): File = {
    val p = path.stripPrefix("file:")
    if (p.startsWith("/")) new File(p) else new File(dir, p)
  }

  /** Replay `_delta_log` and return (schema, partitionColumns, activeFiles).
    * When `_last_checkpoint` exists, the snapshot seeds from the
    * checkpoint parquet (one row per action, nullable `add` / `remove` /
    * `metaData` / `protocol` struct columns — the protocol's compaction
    * format) and only the JSON commits AFTER the checkpoint version
    * replay on top: the reader stays correct after log retention deletes
    * old commits, and replay cost is O(commits since checkpoint). */
  private def replay(s: SparkSession, tableDir: File,
      maxVersion: Long = Long.MaxValue)
      : (StructType, Seq[String], Seq[AddFile], Map[String, Long]) = {
    val logDir = new File(tableDir, "_delta_log")
    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    val active = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    val txns = scala.collection.mutable.HashMap.empty[String, Long]
    // checkpoint seed
    val lastCkpt = new File(logDir, "_last_checkpoint")
    val ckptVersion: Long = if (!lastCkpt.isFile) -1L else {
      val n = mapper.readTree(new String(
        java.nio.file.Files.readAllBytes(lastCkpt.toPath), UTF_8))
      val v = n.get("version").asLong
      if (v > maxVersion) {
        // time travel to before the checkpoint: the seed cannot be
        // unwound, but a from-scratch JSON replay still works as long as
        // every commit 0..maxVersion survives retention
        require((0L to maxVersion).forall(i =>
          new File(logDir, f"$i%020d.json").isFile),
          s"time travel to $maxVersion predates checkpoint $v and the " +
            s"JSON commits 0..$maxVersion are no longer all present")
        -1L
      } else replayCheckpoint(s, logDir, n, v, schema = st => schema = st,
        parts0 = pc => partCols = pc, active, txns)
    }
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("\\d{20}\\.json"))
      .filter { f =>
        val fv = f.getName.stripSuffix(".json").toLong
        fv > ckptVersion && fv <= maxVersion
      }
      .sortBy(_.getName)
    require(ckptVersion >= 0 || commits.nonEmpty,
      s"no _delta_log commits under $tableDir")
    for (commit <- commits;
         line <- new String(java.nio.file.Files.readAllBytes(
           commit.toPath), UTF_8).split('\n') if line.trim.nonEmpty) {
      val n = mapper.readTree(line)
      if (n.has("protocol")) {
        val p = n.get("protocol")
        val feats = Option(p.get("readerFeatures")).toSeq
          .flatMap(a => (0 until a.size()).map(a.get(_).asText))
        checkProtocol(p.get("minReaderVersion").asInt, feats)
      } else if (n.has("metaData")) {
        val m = n.get("metaData")
        Option(m.get("configuration")).foreach { c =>
          val it = c.fields()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) {
            val e = it.next()
            b += (e.getKey -> e.getValue.asText)
          }
          checkTableConfig(b.result())
        }
        schema = DataType.fromJson(m.get("schemaString").asText)
          .asInstanceOf[StructType]
        partCols = (0 until m.get("partitionColumns").size())
          .map(i => m.get("partitionColumns").get(i).asText)
      } else if (n.has("add")) {
        val a = n.get("add")
        val pv = Option(a.get("partitionValues")).map { o =>
          val it = o.fields()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) {
            val e = it.next()
            b += (e.getKey -> (if (e.getValue.isNull) null
            else e.getValue.asText))
          }
          b.result()
        }.getOrElse(Map.empty)
        active.put(a.get("path").asText,
          AddFile(a.get("path").asText, pv, parseDv(a)))
      } else if (n.has("remove")) {
        active.remove(n.get("remove").get("path").asText)
      } else if (n.has("txn")) {
        // application transaction watermark (the protocol's idempotent-
        // writer contract): latest version per appId
        val t = n.get("txn")
        val app = t.get("appId").asText
        val ver = t.get("version").asLong
        if (txns.getOrElse(app, Long.MinValue) < ver) txns(app) = ver
      } // commitInfo: no table-state effect
    }
    require(schema != null, s"no metaData action in $tableDir/_delta_log")
    (schema, partCols, active.values.toSeq, txns.toMap)
  }

  /** Seed the snapshot from `<v>.checkpoint[.i.N].parquet`; returns v. */
  private def replayCheckpoint(s: SparkSession, logDir: File,
      n: com.fasterxml.jackson.databind.JsonNode, v: Long,
      schema: StructType => Unit, parts0: Seq[String] => Unit,
      active: scala.collection.mutable.LinkedHashMap[String, AddFile],
      txns: scala.collection.mutable.HashMap[String, Long])
      : Long = {
    {
      // multi-part checkpoints name N files <v>.checkpoint.<i>.<N>.parquet
      // and record "parts"; a single-part one is <v>.checkpoint.parquet
      val parts = Option(n.get("parts")).map(_.asInt).getOrElse(0)
      val ckptFiles =
        if (parts <= 0) Seq(new File(logDir, f"$v%020d.checkpoint.parquet"))
        else (1 to parts).map(i =>
          new File(logDir, f"$v%020d.checkpoint.$i%010d.$parts%010d.parquet"))
      ckptFiles.foreach(f =>
        require(f.exists(), s"_last_checkpoint names missing $f"))
      val rows = s.read.parquet(ckptFiles.map(_.getPath): _*).collect()
      val cols = rows.headOption.map(_.schema.fieldNames.toSet)
        .getOrElse(Set.empty)
      rows.foreach { r =>
        if (cols("protocol") && !r.isNullAt(r.fieldIndex("protocol"))) {
          val p = r.getStruct(r.fieldIndex("protocol"))
          val feats =
            if (!p.schema.fieldNames.contains("readerFeatures")) Seq.empty
            else Option(p.getAs[scala.collection.Seq[String]](
              "readerFeatures")).map(_.toSeq).getOrElse(Seq.empty)
          checkProtocol(p.getAs[Int]("minReaderVersion"), feats)
        }
        if (cols("metaData") && !r.isNullAt(r.fieldIndex("metaData"))) {
          val m = r.getStruct(r.fieldIndex("metaData"))
          if (m.schema.fieldNames.contains("configuration"))
            checkTableConfig(Option(m.getAs[
              scala.collection.Map[String, String]]("configuration"))
              .map(_.toMap).getOrElse(Map.empty))
          schema(DataType.fromJson(
            m.getAs[String]("schemaString")).asInstanceOf[StructType])
          parts0(m.getAs[scala.collection.Seq[String]](
            "partitionColumns").toSeq)
        }
        if (cols("add") && !r.isNullAt(r.fieldIndex("add"))) {
          val a = r.getStruct(r.fieldIndex("add"))
          val pv = Option(a.getAs[scala.collection.Map[String, String]](
            "partitionValues")).map(_.toMap).getOrElse(Map.empty)
          // real checkpoints of DV tables carry the descriptor struct
          val dv = if (!a.schema.fieldNames.contains("deletionVector") ||
              a.isNullAt(a.fieldIndex("deletionVector"))) None
          else {
            val d = a.getStruct(a.fieldIndex("deletionVector"))
            Some(DeletionVectors.Descriptor(
              d.getAs[String]("storageType"),
              d.getAs[String]("pathOrInlineDv"),
              Option(d.getAs[Any]("offset")).map(
                _.asInstanceOf[Number].intValue).getOrElse(1),
              d.getAs[Number]("sizeInBytes").intValue,
              Option(d.getAs[Any]("cardinality")).map(
                _.asInstanceOf[Number].longValue).getOrElse(-1L)))
          }
          active.put(a.getAs[String]("path"),
            AddFile(a.getAs[String]("path"), pv, dv))
        }
        if (cols("remove") && !r.isNullAt(r.fieldIndex("remove")))
          active.remove(r.getStruct(r.fieldIndex("remove"))
            .getAs[String]("path"))
        if (cols("txn") && !r.isNullAt(r.fieldIndex("txn"))) {
          val t = r.getStruct(r.fieldIndex("txn"))
          val app = t.getAs[String]("appId")
          val ver = t.getAs[Long]("version")
          if (txns.getOrElse(app, Long.MinValue) < ver) txns(app) = ver
        }
      }
      v
    }
  }

  /** Read the current snapshot of a Delta table directory. */
  def read(s: SparkSession, tableDir: String): DataFrame =
    readVersion(s, tableDir, Long.MaxValue)

  /** Time travel: read the snapshot as of commit `version` (Delta's
    * VERSION AS OF) — replay stops after that commit. A checkpoint newer
    * than `version` cannot be unwound, but the reader falls back to a
    * from-scratch JSON replay whenever commits 0..version all survive
    * retention, and errors only when they are actually gone. */
  def readVersion(s: SparkSession, tableDir: String, version: Long)
      : DataFrame = {
    val dir = new File(tableDir)
    val (schema, partCols, files, _) = replay(s, dir, version)
    scanFiles(s, dir, schema, partCols, files)
  }

  /** Change-data-feed-style extraction (Delta's table_changes): every
    * row change committed in versions (fromExclusive, to], as the table
    * columns plus `_change_type` ('insert' / 'delete' — an UPDATE
    * surfaces as delete+insert of the row versions) and
    * `_commit_version`. Append commits emit their files' rows as
    * inserts; copy-on-write rewrite commits emit the MULTISET DIFF of
    * removed-file rows vs added-file rows (unchanged rewritten rows
    * cancel out — an exceptAll per side), so the result is exactly the
    * rows that changed, not the files. dataChange=false commits
    * (OPTIMIZE) emit nothing. Needs the range's JSON commits AND the
    * removed data files to survive retention/VACUUM. */
  def tableChanges(s: SparkSession, tableDir: String, fromExclusive: Long,
      to0: Long): DataFrame = {
    val dir = new File(tableDir)
    val logDir = new File(dir, "_delta_log")
    val to = math.min(to0, currentVersion(tableDir))
    val (schema, partCols, _, _) = replay(s, dir, to)
    require(!hasMapping(schema),
      "table_changes on column-mapped Delta tables unsupported")
    val frames = ((fromExclusive + 1) to to).flatMap { v =>
      val f = new File(logDir, f"$v%020d.json")
      require(f.isFile, s"Delta commit $v is gone (log retention?) — " +
        "cannot compute the change range")
      val adds = Seq.newBuilder[AddFile]
      val removes = Seq.newBuilder[String]
      new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8)
        .linesIterator.filter(_.nonEmpty).foreach { line =>
          val n = mapper.readTree(line)
          if (n.has("add")) {
            val a = n.get("add")
            if (!a.has("dataChange") || a.get("dataChange").asBoolean) {
              val pv = Option(a.get("partitionValues")).map { o =>
                val it = o.fields()
                val b = Map.newBuilder[String, String]
                while (it.hasNext) {
                  val e = it.next()
                  b += (e.getKey -> (if (e.getValue.isNull) null
                  else e.getValue.asText))
                }
                b.result()
              }.getOrElse(Map.empty[String, String])
              adds += AddFile(a.get("path").asText, pv, parseDv(a))
            }
          } else if (n.has("remove")) {
            val r = n.get("remove")
            if (!r.has("dataChange") || r.get("dataChange").asBoolean)
              removes += r.get("path").asText
          }
        }
      val (as, rs) = (adds.result(), removes.result())
      if (as.isEmpty && rs.isEmpty) None
      else {
        val newRows = scanFiles(s, dir, schema, partCols, as)
        val tagged =
          if (rs.isEmpty) newRows.withColumn("_change_type", lit("insert"))
          else {
            // resolve the removed files' partition tuples from the
            // pre-commit snapshot
            val prev = replay(s, dir, v - 1)._3.map(a => a.path -> a).toMap
            val oldRows = scanFiles(s, dir, schema, partCols,
              rs.flatMap(prev.get))
            newRows.exceptAll(oldRows)
              .withColumn("_change_type", lit("insert"))
              .unionAll(oldRows.exceptAll(newRows)
                .withColumn("_change_type", lit("delete")))
          }
        Some(tagged.withColumn("_commit_version", lit(v)))
      }
    }
    frames.reduceOption(_ unionAll _).getOrElse {
      s.createDataFrame(java.util.Collections.emptyList[Row](),
        StructType(schema.fields :+
          StructField("_change_type", StringType) :+
          StructField("_commit_version", LongType)))
    }
  }

  /** Scan a specific file set with partition-literal injection: one
    * parquet read per distinct partition tuple (each group's files go to
    * a single multi-path scan; the injected literals keep the declared
    * column order). */
  private def scanFiles(s: SparkSession, dir: File, schema: StructType,
      partCols: Seq[String], files: Seq[AddFile]): DataFrame = {
    // under column mapping `name` mode, data files store PHYSICAL column
    // names and partitionValues key on them too — read physical, expose
    // logical
    val dataSchema = StructType(schema.fields.filterNot(f =>
      partCols.contains(f.name))
      .map(f => StructField(physName(f), f.dataType, f.nullable)))
    if (files.isEmpty)
      return s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(schema.fields.map(f =>
          StructField(f.name, f.dataType, f.nullable))))
    def partLit(f: StructField, v: String) =
      (if (v == null) lit(null) else lit(v)).cast(f.dataType).as(f.name)
    def group(pv: Map[String, String], paths: Seq[String],
        dv: Option[DataFrame]): DataFrame = {
      val df0 = s.read.schema(dataSchema).parquet(paths: _*)
      // deletion vectors: anti-join the file's deleted row indexes
      // (broadcast — a DV is bounded by its file's row count)
      val df = dv match {
        case None => df0
        case Some(posDf) =>
          df0.withColumn("__ri", col("_metadata.row_index"))
            .join(broadcast(posDf), col("__ri") === posDf("__dv_pos"),
              "left_anti")
      }
      val cols = schema.fields.map { f =>
        if (partCols.contains(f.name))
          partLit(f, pv.getOrElse(physName(f), pv.getOrElse(f.name, null)))
        else col(physName(f)).as(f.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }
    val (dvFiles, plain) = files.partition(_.dv.isDefined)
    val plainDf = plain.groupBy(_.partitionValues).map { case (pv, g) =>
      group(pv, g.map(a => resolvePath(dir, a.path).getPath), None)
    }
    // DV'd files scan one-by-one: positions are per file
    val dvDfs = dvFiles.map { a =>
      import s.implicits._
      val pos = DeletionVectors.positions(dir, a.dv.get)
      group(a.partitionValues, Seq(resolvePath(dir, a.path).getPath),
        Some(pos.toDF("__dv_pos")))
    }
    (plainDf ++ dvDfs).reduce(_ unionAll _)
  }

  /** Latest committed version of the table's log, -1 if none. */
  def currentVersion(tableDir: String): Long =
    nextVersion(new File(tableDir, "_delta_log")) - 1

  /** Time travel by timestamp (Delta's TIMESTAMP AS OF): the snapshot at
    * the GREATEST commit whose timestamp is <= `tsMillis`. Commit
    * timestamps are the log files' modification times — the protocol's
    * rule before in-commit timestamps; same caveat as real Delta: they
    * must survive file copies. Errors when the timestamp predates the
    * first surviving commit. */
  def readTimestamp(s: SparkSession, tableDir: String, tsMillis: Long)
      : DataFrame = {
    val logDir = new File(tableDir, "_delta_log")
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .map(f => (f.getName.stripSuffix(".json").toLong, f.lastModified()))
      .sortBy(_._1)
    require(commits.nonEmpty,
      s"no JSON commits in $tableDir/_delta_log to time-travel by timestamp")
    val v = commits.takeWhile(_._2 <= tsMillis).lastOption.map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"timestamp $tsMillis is before the table's first commit"))
    readVersion(s, tableDir, v)
  }

  /** The rows ADDED in commits (fromExclusive, to] — the streaming
    * source's incremental batch. Only `dataChange=true` adds count
    * (OPTIMIZE rewrites are invisible, as the protocol intends). A
    * `dataChange` remove in the range means the range is not pure
    * appends (DELETE/UPDATE/MERGE rewrote rows): raise unless
    * `ignoreChanges` (the standard Delta source contract — with it,
    * rewritten files re-emit their rows and downstream must dedup).
    * Requires the JSON commits in range to survive retention. */
  def readChanges(s: SparkSession, tableDir: String, fromExclusive: Long,
      to: Long, ignoreChanges: Boolean = false): DataFrame = {
    val dir = new File(tableDir)
    val logDir = new File(dir, "_delta_log")
    val (schema, partCols, _, _) = replay(s, dir, to)
    val adds = Seq.newBuilder[AddFile]
    ((fromExclusive + 1) to to).foreach { v =>
      val f = new File(logDir, f"$v%020d.json")
      require(f.isFile, s"Delta commit $v is gone (log retention?) — " +
        "cannot read the change range")
      new String(java.nio.file.Files.readAllBytes(f.toPath), UTF_8)
        .linesIterator.filter(_.nonEmpty).foreach { line =>
          val n = mapper.readTree(line)
          if (n.has("add")) {
            val a = n.get("add")
            val dc = !a.has("dataChange") || a.get("dataChange").asBoolean
            if (dc) {
              val pv = Option(a.get("partitionValues")).map { o =>
                val it = o.fields()
                val b = Map.newBuilder[String, String]
                while (it.hasNext) {
                  val e = it.next()
                  b += (e.getKey -> (if (e.getValue.isNull) null
                  else e.getValue.asText))
                }
                b.result()
              }.getOrElse(Map.empty[String, String])
              adds += AddFile(a.get("path").asText, pv, parseDv(a))
            }
          } else if (n.has("remove")) {
            val r = n.get("remove")
            val dc = !r.has("dataChange") || r.get("dataChange").asBoolean
            require(!dc || ignoreChanges,
              s"Delta commit $v rewrites rows (remove with dataChange) — " +
                "not an append; set ignoreChanges=true to re-emit " +
                "rewritten files")
          }
        }
    }
    scanFiles(s, dir, schema, partCols, adds.result())
  }

  // ---------- writer: INSERT INTO (append) with an atomic log commit

  private def nextVersion(logDir: File): Long =
    Option(logDir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).collect {
        case n if n.matches("\\d{20}\\.json") =>
          n.stripSuffix(".json").toLong
        case n if n.matches("\\d{20}\\.checkpoint\\.parquet") =>
          n.stripSuffix(".checkpoint.parquet").toLong
      }.foldLeft(-1L)(math.max) + 1

  /** INSERT INTO (append) a Delta table — the same commit contract as the
    * reference's TableFinishOperator over presto-delta: write the parquet
    * data files first (fully DISTRIBUTED — the rows never pass through
    * the driver), then make them visible with ONE atomic `add`-actions
    * JSON commit; a reader replaying the log sees all of the insert or
    * none of it. Partitioned tables write through Spark's partitionBy
    * (Hive-style dirs, partition columns dropped from the data files —
    * exactly Delta's physical layout) and record each leaf's
    * partitionValues in its add action. Returns the committed version. */
  def insert(s: SparkSession, tableDir: String, df: DataFrame): Long =
    insertTxn(s, tableDir, df, txn = None).get

  /** Idempotent append: `txn = Some((appId, version))` commits a `txn`
    * watermark action in the SAME atomic commit as the adds (the Delta
    * protocol's transaction-identifier contract — how real streaming
    * writers get exactly-once). If the table's watermark for `appId` is
    * already >= `version` the batch was applied by an earlier attempt:
    * nothing is written and None is returned. */
  def insertTxn(s: SparkSession, tableDir: String, df: DataFrame,
      txn: Option[(String, Long)]): Option[Long] = {
    val dir = new File(tableDir)
    val logDir = new File(dir, "_delta_log")
    val (schema, partCols, _, txns) = replay(s, dir) // validates protocol too
    require(!hasMapping(schema),
      "DML on column-mapped Delta tables unsupported (read-only support)")
    txn.foreach { case (app, ver) =>
      if (txns.getOrElse(app, Long.MinValue) >= ver) return None
    }
    require(df.schema.fields.map(f => (f.name, f.dataType)).sortBy(_._1)
      .sameElements(schema.fields.map(f => (f.name, f.dataType))
        .sortBy(_._1)),
      s"INSERT schema ${df.schema.simpleString} does not match table " +
        s"schema ${schema.simpleString}")
    val version = nextVersion(logDir)
    val staging = new File(dir, f".staging_insert_$version%020d")
    val ordered = df.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    if (partCols.isEmpty) ordered.write.parquet(staging.getPath)
    else ordered.write.partitionBy(partCols: _*).parquet(staging.getPath)
    val (dataActions, _) = stageIntoTable(dir, staging, version, 0)
    require(dataActions.nonEmpty, "INSERT produced no data files")
    val actions =
      commitInfoAction(if (txn.isDefined) "STREAMING UPDATE" else "WRITE") +:
        (dataActions ++ txn.map { case (app, ver) => txnAction(app, ver) })
    commit(dir, version, actions)
    // the standard writer cadence: a checkpoint every 10 commits keeps
    // replay O(10) regardless of table age and lets log retention reclaim
    // old JSON commits
    if ((version + 1) % 10 == 0)
      try writeCheckpoint(s, dir) catch { case _: Throwable => () }
    Some(version)
  }

  /** OPTIMIZE (bin-packing compaction; Delta's OPTIMIZE command, the
    * reference's equivalent being connector-side compaction): within each
    * partition group, groups holding more than one file are rewritten into
    * `ceil(bytes / targetBytes)` coalesced files — one distributed
    * read+write per group, ONE atomic remove+add commit for the whole
    * table, and the adds carry `dataChange=false` (the snapshot's ROWS are
    * unchanged; streaming readers must not re-emit them). Optional
    * `zorderBy` sorts rows by the interleaved z-key before packing so
    * multi-column range predicates touch fewer files (ops/Layout z-order).
    * Returns the number of files removed. */
  def optimize(s: SparkSession, tableDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      zorderBy: Seq[String] = Seq.empty): Long = {
    val dir = new File(tableDir).getCanonicalFile
    val (schema, partCols, files, _) = replay(s, dir)
    require(!hasMapping(schema),
      "DML on column-mapped Delta tables unsupported (read-only support)")
    requireNoDv(files, "OPTIMIZE")
    require(zorderBy.forall(c => schema.fieldNames.contains(c) &&
      !partCols.contains(c)), s"ZORDER BY columns $zorderBy must be " +
      "non-partition table columns")
    val dataSchema = StructType(schema.fields.filterNot(f =>
      partCols.contains(f.name)))
    val version = nextVersion(new File(dir, "_delta_log"))
    val actions = Seq.newBuilder[String]
    var removed = 0L
    var i = 0
    files.groupBy(_.partitionValues).foreach { case (pv, group) =>
      if (group.size > 1 || (zorderBy.nonEmpty && group.nonEmpty)) {
        val paths = group.map(a => resolvePath(dir, a.path))
        val bytes = paths.map(_.length()).sum
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val df0 = s.read.schema(dataSchema)
          .parquet(paths.map(_.getPath): _*)
        val df =
          if (zorderBy.isEmpty) df0.coalesce(nOut)
          else df0.repartitionByRange(nOut,
            graft.ops.Layout.zorderKey(zorderBy.map(col): _*))
            .sortWithinPartitions(
              graft.ops.Layout.zorderKey(zorderBy.map(col): _*))
        val staging = new File(dir, f".staging_opt_$version%020d_$i")
        df.write.parquet(staging.getPath)
        group.foreach { a =>
          actions += removeAction(a.path, dataChange = false)
          removed += 1
        }
        staging.listFiles().filter(_.getName.endsWith(".parquet"))
          .sortBy(_.getName).foreach { p =>
            val name = f"part-$version%020d-$i%05d.parquet"
            i += 1
            java.nio.file.Files.move(p.toPath, new File(dir, name).toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            actions += addAction(name, pv, dataChange = false)
          }
        staging.listFiles().foreach(_.delete())
        staging.delete()
      }
    }
    val acts = actions.result()
    if (acts.nonEmpty)
      commit(dir, version, commitInfoAction("OPTIMIZE") +: acts)
    removed
  }

  /** VACUUM: physically delete data files that are NOT in the current
    * snapshot and were last touched more than `retentionMs` ago (Delta's
    * retention contract — tombstoned rewrites and orphaned staging
    * leftovers). Time travel to versions needing those files stops
    * working, exactly as on real Delta tables. Returns files deleted. */
  def vacuum(s: SparkSession, tableDir: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): Long = {
    val dir = new File(tableDir).getCanonicalFile
    val (_, _, files, _) = replay(s, dir)
    val active = files.map(a =>
      resolvePath(dir, a.path).getCanonicalPath).toSet
    val cutoff = System.currentTimeMillis() - retentionMs
    var n = 0L
    def walk(d: File): Unit =
      Option(d.listFiles()).getOrElse(Array.empty).foreach {
        case sub if sub.isDirectory && sub.getName != "_delta_log" &&
            !sub.getName.startsWith(".staging_") => walk(sub)
        case f if f.isFile && f.getName.endsWith(".parquet") &&
            !active(f.getCanonicalPath) && f.lastModified() < cutoff =>
          if (f.delete()) n += 1
        case _ =>
      }
    walk(dir)
    n
  }

  /** Move every leaf parquet under `staging` (possibly Hive-partitioned by
    * the writer) into the table, deleting the staging tree; returns one add
    * action per file plus the advanced name counter. Files become visible
    * ONLY via the caller's subsequent commit. */
  private def stageIntoTable(dir: File, staging: File, version: Long,
      i0: Int): (Seq[String], Int) = {
    def decode(v: String): String =
      java.net.URLDecoder.decode(v, "UTF-8") match {
        case "__HIVE_DEFAULT_PARTITION__" => null
        case other => other
      }
    val adds = Seq.newBuilder[String]
    var i = i0
    def walk(d: File, partVals: Map[String, String]): Unit =
      Option(d.listFiles()).getOrElse(Array.empty).foreach {
        case sub if sub.isDirectory && sub.getName.contains("=") =>
          val Array(k, v) = sub.getName.split("=", 2)
          walk(sub, partVals + (k -> decode(v)))
        case f if f.isFile && f.getName.endsWith(".parquet") =>
          val relDir = partVals.map { case (k, v) =>
            k + "=" + (if (v == null) "__HIVE_DEFAULT_PARTITION__"
            else java.net.URLEncoder.encode(v, "UTF-8"))
          }.mkString("/")
          if (relDir.nonEmpty) new File(dir, relDir).mkdirs()
          val name = f"part-$version%020d-$i%05d.parquet"
          i += 1
          val rel = if (relDir.isEmpty) name else s"$relDir/$name"
          java.nio.file.Files.move(f.toPath, new File(dir, rel).toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          adds += addAction(rel, partVals)
        case _ =>
      }
    walk(staging, Map.empty)
    def rmRec(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRec)
      f.delete()
    }
    rmRec(staging)
    (adds.result(), i)
  }

  /** CONVERT TO DELTA (Delta's in-place import of a plain parquet
    * directory — no data is copied or moved): discover the leaf parquet
    * files (Hive-style `k=v` partition dirs included), infer the schema
    * from one file plus typed partition columns, and write commit 0
    * (protocol + metaData + one add per file). The directory becomes a
    * readable, appendable Delta table; re-converting an existing table
    * raises. Returns the number of files imported. */
  def convertToDelta(s: SparkSession, dir0: String,
      partitionSchema: Map[String, DataType] = Map.empty): Long = {
    val dir = new File(dir0).getCanonicalFile
    require(!new File(dir, "_delta_log").exists(),
      s"$dir0 already has a _delta_log")
    val files = Seq.newBuilder[(String, Map[String, String])]
    def walk(d: File, pv: Map[String, String]): Unit =
      Option(d.listFiles()).getOrElse(Array.empty)
        .sortBy(_.getName).foreach {
          case sub if sub.isDirectory && sub.getName.contains("=") =>
            val Array(k, v) = sub.getName.split("=", 2)
            val dv = java.net.URLDecoder.decode(v, "UTF-8")
            walk(sub, pv + (k ->
              (if (dv == "__HIVE_DEFAULT_PARTITION__") null else dv)))
          case sub if sub.isDirectory && !sub.getName.startsWith(".") &&
              !sub.getName.startsWith("_") => walk(sub, pv)
          case f if f.isFile && f.getName.endsWith(".parquet") =>
            files += ((dir.toPath.relativize(f.toPath).toString, pv))
          case _ =>
        }
    walk(dir, Map.empty)
    val fs = files.result()
    require(fs.nonEmpty, s"no parquet files under $dir0")
    val partCols = fs.head._2.keys.toSeq.sorted
    require(fs.forall(_._2.keys.toSeq.sorted == partCols),
      "inconsistent partition directory depths")
    val dataSchema =
      s.read.parquet(new File(dir, fs.head._1).getPath).schema
    val schema = StructType(dataSchema.fields ++ partCols.map(c =>
      StructField(c, partitionSchema.getOrElse(c, StringType))))
    commit(dir, 0,
      commitInfoAction("CONVERT") +: protocolAction +:
        metaDataAction(schema, partCols) +:
        fs.map { case (p, pv) => addAction(p, pv) })
    fs.size.toLong
  }

  /** SHALLOW CLONE: create a NEW Delta table at `targetDir` whose commit
    * 0 references the SOURCE table's current data files by ABSOLUTE path
    * (the spec explicitly allows absolute add paths) — zero data copied.
    * The clone then evolves independently: inserts/deletes/merges commit
    * to ITS log (copy-on-write rewrites land as clone-local files; the
    * source's files are never touched). VACUUM on the clone only sweeps
    * files under the clone's root, so shared source files survive.
    * Returns the number of referenced files. */
  def shallowClone(s: SparkSession, sourceDir: String, targetDir: String)
      : Long = {
    val src = new File(sourceDir).getCanonicalFile
    val tgt = new File(targetDir).getCanonicalFile
    require(!new File(tgt, "_delta_log").exists(),
      s"$targetDir already has a _delta_log")
    val (schema, partCols, files, _) = replay(s, src)
    requireNoDv(files, "SHALLOW CLONE")
    tgt.mkdirs()
    commit(tgt, 0,
      commitInfoAction("CLONE") +: protocolAction +:
        metaDataAction(schema, partCols) +:
        files.map(a => addAction(
          resolvePath(src, a.path).getCanonicalPath, a.partitionValues)))
    files.size.toLong
  }

  /** RESTORE the table to the snapshot at `version` as a NEW commit
    * (Delta's RESTORE statement): files not active then are removed,
    * files active then but since dropped are re-added, and the target
    * version's schema is re-declared — history is preserved (the restore
    * itself is one more commit, so it can be restored away again).
    * Errors if a needed historical file was vacuumed. Returns the number
    * of add/remove actions committed (0 = already identical). */
  def restore(s: SparkSession, tableDir: String, version: Long): Long = {
    val dir = new File(tableDir).getCanonicalFile
    val (schema, _, curFiles, _) = replay(s, dir)
    require(!hasMapping(schema),
      "RESTORE on column-mapped Delta tables unsupported")
    requireNoDv(curFiles, "RESTORE")
    val (tSchema, tPartCols, tFiles, _) = replay(s, dir, version)
    requireNoDv(tFiles, "RESTORE")
    val curPaths = curFiles.map(_.path).toSet
    val tgtPaths = tFiles.map(_.path).toSet
    val removes = curFiles.filterNot(f => tgtPaths(f.path))
    val adds = tFiles.filterNot(f => curPaths(f.path))
    adds.foreach(a => require(resolvePath(dir, a.path).isFile,
      s"cannot RESTORE: historical file ${a.path} was vacuumed"))
    val n = removes.size + adds.size
    if (n == 0) return 0L
    val next = nextVersion(new File(dir, "_delta_log"))
    commit(dir, next,
      commitInfoAction("RESTORE") +:
        (metaDataAction(tSchema, tPartCols) +:
          (removes.map(r => removeAction(r.path)) ++
            adds.map(a => addAction(a.path, a.partitionValues)))))
    n.toLong
  }

  /** Latest committed `txn` watermark for `appId` (None if the app has
    * never committed to this table). */
  def txnVersion(s: SparkSession, tableDir: String, appId: String)
      : Option[Long] =
    replay(s, new File(tableDir))._4.get(appId)

  // ---------- writer: DELETE / UPDATE (copy-on-write rewrites)

  /** DELETE FROM the table: rows where `condition` is TRUE disappear
    * (NULL keeps the row, ANSI semantics). Copy-on-write, the same
    * algorithm real Delta writers use without deletion vectors: ONLY the
    * files that contain matching rows are rewritten without those rows,
    * all in one atomic remove+add commit. Returns the deleted count. */
  def delete(s: SparkSession, tableDir: String,
      condition: org.apache.spark.sql.Column): Long =
    rewrite(s, tableDir, condition, sets = Map.empty)

  /** UPDATE: rows matching `condition` get `sets` (evaluated against the
    * PRE-update row, ANSI); others are untouched. Updating a partition
    * column is rejected (the row would have to move partitions). Returns
    * the matched count. */
  def update(s: SparkSession, tableDir: String,
      condition: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column]): Long = {
    require(sets.nonEmpty, "UPDATE needs SET columns")
    rewrite(s, tableDir, condition, sets)
  }

  private def rewrite(s: SparkSession, tableDir: String,
      condition: org.apache.spark.sql.Column,
      sets: Map[String, org.apache.spark.sql.Column]): Long = {
    val dir = new File(tableDir).getCanonicalFile
    val (schema, partCols, files, _) = replay(s, dir)
    require(!hasMapping(schema),
      "DML on column-mapped Delta tables unsupported (read-only support)")
    requireNoDv(files, "DELETE/UPDATE")
    require(sets.keySet.intersect(partCols.toSet).isEmpty,
      s"UPDATE of partition columns ${partCols.mkString(",")} unsupported")
    sets.keys.foreach(k => require(schema.fieldNames.contains(k),
      s"SET column $k not in table schema"))
    val dataSchema = StructType(schema.fields.filterNot(f =>
      partCols.contains(f.name)))
    val version = nextVersion(new File(dir, "_delta_log"))
    def partLit(f: StructField, v: String) =
      (if (v == null) lit(null) else lit(v)).cast(f.dataType).as(f.name)
    val actions = Seq.newBuilder[String]
    var matched = 0L
    var i = 0
    // per partition-tuple group: find the files holding matching rows,
    // rewrite ONLY those (the others stay untouched in the log)
    files.groupBy(_.partitionValues).foreach { case (pv, group) =>
      val byCanon = group.map(a =>
        resolvePath(dir, a.path).getCanonicalPath -> a).toMap
      def tagged(paths: Seq[String]) = {
        val df = s.read.schema(dataSchema).parquet(paths: _*)
        val cols = schema.fields.map { f =>
          if (partCols.contains(f.name))
            partLit(f, pv.getOrElse(f.name, null))
          else col(f.name)
        }
        df.select(cols.toIndexedSeq :+
          regexp_replace(regexp_replace(col("_metadata.file_path"),
            "^file:", ""), "^/+", "/").as("__fp"): _*)
      }
      val all = tagged(group.map(a => resolvePath(dir, a.path).getPath))
      val hits = all.filter(coalesce(condition, lit(false)))
      val affectedFps = hits.select("__fp").distinct()
        .collect().map(_.getString(0))
      if (affectedFps.nonEmpty) {
        matched += hits.count()
        val affected = affectedFps.map(fp => byCanon(
          new File(fp).getCanonicalPath))
        val rows = tagged(affected.map(a =>
          resolvePath(dir, a.path).getPath).toIndexedSeq)
        val out =
          if (sets.isEmpty) rows.filter(!coalesce(condition, lit(false)))
          else {
            val cond = coalesce(condition, lit(false))
            rows.select(schema.fields.map { f =>
              sets.get(f.name) match {
                case Some(v) =>
                  when(cond, v.cast(f.dataType)).otherwise(col(f.name))
                    .as(f.name)
                case None => col(f.name)
              }
            }.toIndexedSeq :+ col("__fp"): _*)
          }
        // the rewrite drops partition columns again (they live in the log)
        val staging = new File(dir, f".staging_rw_$version%020d_$i")
        out.select(dataSchema.fieldNames.map(col).toIndexedSeq: _*)
          .write.parquet(staging.getPath)
        affected.foreach(a => actions += removeAction(a.path))
        staging.listFiles().filter(_.getName.endsWith(".parquet"))
          .sortBy(_.getName).foreach { p =>
            val name = f"part-$version%020d-$i%05d.parquet"
            i += 1
            java.nio.file.Files.move(p.toPath,
              new File(dir, name).toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            actions += addAction(name, pv)
          }
        staging.listFiles().foreach(_.delete())
        staging.delete()
      }
    }
    val acts = actions.result()
    if (acts.nonEmpty) commit(dir, version,
      commitInfoAction(if (sets.isEmpty) "DELETE" else "UPDATE") +: acts)
    matched
  }

  /** MERGE INTO (the reference's MergeProcessor / standard Delta upsert),
    * copy-on-write: target rows are matched to `source` via `on` (an SQL
    * condition over aliases `t` = table, `s` = source).
    *
    *   WHEN MATCHED [AND matchedDelete] THEN DELETE        (checked first)
    *   WHEN MATCHED THEN UPDATE SET matchedUpdate          (exprs over t/s)
    *   WHEN NOT MATCHED THEN INSERT notMatchedInsert       (exprs over s)
    *
    * Only files holding matched rows are rewritten; inserts append new
    * files (Hive-partitioned when the table is); everything lands in ONE
    * atomic remove+add commit. A target row matched by more than one
    * source row raises (the result would be nondeterministic — the same
    * contract real Delta writers enforce). Update/insert expressions read
    * the PRE-merge target row. Partition-column updates are rejected;
    * inserts may set partition columns (rows route to their directories).
    * At scale the matched-file discovery and the anti-join are plain
    * shuffle/broadcast joins — the rewrite cost is proportional to the
    * files actually hit, not the table. */
  def merge(s: SparkSession, tableDir: String, source: DataFrame,
      on: String,
      matchedUpdate: Map[String, String] = Map.empty,
      matchedDelete: Option[String] = None,
      notMatchedInsert: Option[Map[String, String]] = None): MergeStats = {
    require(matchedUpdate.nonEmpty || matchedDelete.nonEmpty ||
      notMatchedInsert.nonEmpty, "MERGE needs at least one WHEN clause")
    Seq("__fp", "__ri", "__sm").foreach(c =>
      require(!source.columns.contains(c),
        s"MERGE source may not have a column named $c"))
    val dir = new File(tableDir).getCanonicalFile
    val (schema, partCols, files, _) = replay(s, dir)
    require(!hasMapping(schema),
      "DML on column-mapped Delta tables unsupported (read-only support)")
    requireNoDv(files, "MERGE")
    require(matchedUpdate.keySet.intersect(partCols.toSet).isEmpty,
      s"UPDATE of partition columns ${partCols.mkString(",")} unsupported")
    (matchedUpdate.keySet ++ notMatchedInsert.toSeq.flatMap(_.keySet))
      .foreach(k => require(schema.fieldNames.contains(k),
        s"MERGE column $k not in table schema"))
    val dataSchema = StructType(schema.fields.filterNot(f =>
      partCols.contains(f.name)))
    val version = nextVersion(new File(dir, "_delta_log"))
    def partLit(f: StructField, v: String) =
      (if (v == null) lit(null) else lit(v)).cast(f.dataType).as(f.name)
    // full table with file-path + row-index identity tags (parquet
    // _metadata columns — free, no shuffle)
    def taggedGroup(pv: Map[String, String], paths: Seq[String]) = {
      val df = s.read.schema(dataSchema).parquet(paths: _*)
      df.select(schema.fields.map { f =>
        if (partCols.contains(f.name)) partLit(f, pv.getOrElse(f.name, null))
        else col(f.name)
      }.toIndexedSeq :+
        regexp_replace(regexp_replace(col("_metadata.file_path"),
          "^file:", ""), "^/+", "/").as("__fp") :+
        col("_metadata.row_index").as("__ri"): _*)
    }
    val groups = files.groupBy(_.partitionValues)
    val emptyTagged = s.createDataFrame(
      new java.util.ArrayList[Row](),
      StructType(schema.fields :+ StructField("__fp", StringType) :+
        StructField("__ri", LongType)))
    val target = groups.map { case (pv, g) =>
      taggedGroup(pv, g.map(a => resolvePath(dir, a.path).getPath))
    }.reduceOption(_.unionAll(_)).getOrElse(emptyTagged)
    val src = source.withColumn("__sm", lit(true)).as("s")
    val onE = expr(on)
    val matches = target.as("t").join(src, onE, "inner")
    require(matches.groupBy(col("__fp"), col("__ri")).count()
      .filter(col("count") > 1).limit(1).count() == 0,
      "MERGE: a target row matched more than one source row")
    val delE = coalesce(matchedDelete.map(expr).getOrElse(lit(false)),
      lit(false))
    val rewriteNeeded = matchedUpdate.nonEmpty || matchedDelete.nonEmpty
    val deleted =
      if (matchedDelete.isEmpty) 0L else matches.filter(delE).count()
    val updated =
      if (matchedUpdate.isEmpty) 0L else matches.filter(!delE).count()
    val actions = Seq.newBuilder[String]
    var i = 0
    if (rewriteNeeded) {
      val affected = matches.select("__fp").distinct()
        .collect().map(r => new File(r.getString(0)).getCanonicalPath).toSet
      groups.foreach { case (pv, g) =>
        val hit = g.filter(a =>
          affected(resolvePath(dir, a.path).getCanonicalPath))
        if (hit.nonEmpty) {
          val rows = taggedGroup(pv,
            hit.map(a => resolvePath(dir, a.path).getPath)).as("t")
          val j = rows.join(src, onE, "left_outer")
          val m = coalesce(col("__sm"), lit(false))
          val out = j.filter(!(m && delE)).select(schema.fields.map { f =>
            matchedUpdate.get(f.name) match {
              case Some(e) =>
                when(m, expr(e).cast(f.dataType))
                  .otherwise(col("t." + f.name)).as(f.name)
              case None => col("t." + f.name).as(f.name)
            }
          }.toIndexedSeq: _*)
          val staging = new File(dir, f".staging_mrg_$version%020d_$i")
          out.select(dataSchema.fieldNames.map(col).toIndexedSeq: _*)
            .write.parquet(staging.getPath)
          hit.foreach(a => actions += removeAction(a.path))
          staging.listFiles().filter(_.getName.endsWith(".parquet"))
            .sortBy(_.getName).foreach { p =>
              val name = f"part-$version%020d-$i%05d.parquet"
              i += 1
              java.nio.file.Files.move(p.toPath,
                new File(dir, name).toPath,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              actions += addAction(name, pv)
            }
          staging.listFiles().foreach(_.delete())
          staging.delete()
        }
      }
    }
    val inserted = notMatchedInsert match {
      case None => 0L
      case Some(mapping) =>
        val anti = src.join(target.as("t"), onE, "left_anti")
        val insDf = anti.select(schema.fields.map { f =>
          mapping.get(f.name)
            .map(e => expr(e).cast(f.dataType))
            .getOrElse(lit(null).cast(f.dataType)).as(f.name)
        }.toIndexedSeq: _*)
        val n = insDf.count()
        if (n > 0) {
          val staging = new File(dir, f".staging_mrg_ins_$version%020d")
          if (partCols.isEmpty) insDf.write.parquet(staging.getPath)
          else insDf.write.partitionBy(partCols: _*).parquet(staging.getPath)
          val (acts, i2) = stageIntoTable(dir, staging, version, i)
          i = i2
          actions ++= acts
        }
        n
    }
    val acts = actions.result()
    if (acts.nonEmpty)
      commit(dir, version, commitInfoAction("MERGE") +: acts)
    MergeStats(updated, deleted, inserted)
  }

  // ---------- fixture writer (tests + the driver gate build their own
  // protocol-conformant logs with it; production tables come from real
  // Delta writers)

  private def schemaJson(st: StructType): String = st.json

  /** Append one commit of actions to `tableDir/_delta_log`. */
  def commit(tableDir: File, version: Long, actions: Seq[String]): Unit = {
    val logDir = new File(tableDir, "_delta_log")
    logDir.mkdirs()
    val name = f"$version%020d.json"
    java.nio.file.Files.write(new File(logDir, name).toPath,
      actions.mkString("", "\n", "\n").getBytes(UTF_8))
  }

  def protocolAction: String =
    """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}"""

  def metaDataAction(schema: StructType,
      partCols: Seq[String] = Seq.empty): String = {
    val pc = partCols.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sj = mapper.writeValueAsString(schemaJson(schema))
    s"""{"metaData":{"id":"graft-fixture","format":{"provider":"parquet","options":{}},"schemaString":$sj,"partitionColumns":$pc,"configuration":{},"createdTime":0}}"""
  }

  def addAction(path: String,
      partitionValues: Map[String, String] = Map.empty,
      dataChange: Boolean = true): String = {
    val pv = partitionValues
      .map { case (k, v) =>
        "\"" + k + "\":" + (if (v == null) "null" else "\"" + v + "\"")
      }
      .mkString("{", ",", "}")
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":0,"modificationTime":0,"dataChange":$dataChange}}"""
  }

  /** An `add` carrying a deletion-vector descriptor (fixture writer for
    * the DV read path; real tables come from Delta writers). */
  def addActionWithDv(path: String, d: DeletionVectors.Descriptor,
      partitionValues: Map[String, String] = Map.empty): String = {
    val base = addAction(path, partitionValues)
    val dvJson =
      s""""deletionVector":{"storageType":${mapper.writeValueAsString(
        d.storageType)},"pathOrInlineDv":${mapper.writeValueAsString(
        d.pathOrInlineDv)},"offset":${d.offset},"sizeInBytes":${
        d.sizeInBytes},"cardinality":${d.cardinality}}"""
    base.replace(""","dataChange":true}""",
      s""","dataChange":true,$dvJson}""")
  }

  def txnAction(appId: String, version: Long): String =
    s"""{"txn":{"appId":${mapper.writeValueAsString(appId)},"version":$version,"lastUpdated":0}}"""

  def commitInfoAction(operation: String): String =
    s"""{"commitInfo":{"timestamp":${System.currentTimeMillis()},"operation":${mapper.writeValueAsString(operation)},"engineInfo":"graft"}}"""

  /** DESCRIBE HISTORY: one row per surviving JSON commit, newest first —
    * version, timestamp, operation (from `commitInfo` when the writer
    * recorded one; this engine's writers do). */
  def describeHistory(s: SparkSession, tableDir: String): DataFrame = {
    val logDir = new File(tableDir, "_delta_log")
    import s.implicits._
    Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.json")).sortBy(_.getName)
      .map { f =>
        val v = f.getName.stripSuffix(".json").toLong
        val ci = new String(java.nio.file.Files.readAllBytes(f.toPath),
          UTF_8).linesIterator.filter(_.nonEmpty).map(mapper.readTree)
          .find(_.has("commitInfo")).map(_.get("commitInfo"))
        (v,
          ci.flatMap(c => Option(c.get("timestamp")).map(t =>
            new java.sql.Timestamp(t.asLong))).orNull,
          ci.flatMap(c => Option(c.get("operation")).map(_.asText)).orNull)
      }.toSeq.sortBy(-_._1)
      .toDF("version", "timestamp", "operation")
  }

  def removeAction(path: String, dataChange: Boolean = true): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":$dataChange}}"""

  /** Compact the current snapshot into a protocol checkpoint: one parquet
    * row per action (nullable add/metaData/protocol struct columns) at the
    * latest commit version, plus the `_last_checkpoint` pointer. JSON
    * commits at or below the returned version may then be deleted
    * (retention) — the reader seeds from the checkpoint. */
  def writeCheckpoint(s: SparkSession, tableDir: File): Long =
    writeCheckpoint(s, tableDir, parts = 1)

  def writeCheckpoint(s: SparkSession, tableDir: File, parts: Int): Long = {
    val logDir = new File(tableDir, "_delta_log")
    val (schema, partCols, files, txns) = replay(s, tableDir)
    require(!hasMapping(schema),
      "checkpointing column-mapped Delta tables unsupported (read-only)")
    requireNoDv(files, "checkpointing")
    val version = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("\\d{20}\\.json"))
      .map(_.getName.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
    require(version >= 0, s"nothing to checkpoint under $tableDir")
    import org.apache.spark.sql.Row
    val ckptSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("createdTime", LongType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("txn", StructType(Seq(
        StructField("appId", StringType),
        StructField("version", LongType),
        StructField("lastUpdated", LongType))))))
    val rows: Seq[Row] =
      Seq(Row(null, Row("graft-fixture", schema.json, partCols, 0L),
          null, null),
        Row(null, null, Row(1, 2), null)) ++
        // txn watermarks survive compaction — without them a checkpoint
        // would reset idempotent-writer dedup and replay old batches
        txns.toSeq.sortBy(_._1).map { case (app, ver) =>
          Row(null, null, null, Row(app, ver, 0L))
        } ++
        files.map(f =>
          Row(Row(f.path, f.partitionValues, 0L, 0L, true), null, null,
            null))
    import scala.jdk.CollectionConverters._
    require(parts >= 1 && parts <= rows.size,
      s"parts must be in [1, ${rows.size}], got $parts")
    // round-robin by index: EXACTLY `parts` non-empty groups for any
    // parts <= rows.size (grouped()'s ceil split can under-produce, e.g.
    // 4 rows into 3 parts)
    val groups =
      if (parts == 1) Seq(rows)
      else rows.zipWithIndex.groupBy(_._2 % parts).toSeq
        .sortBy(_._1).map(_._2.map(_._1))
    require(groups.size == parts, s"grouping produced ${groups.size} parts")
    val staging = new File(logDir, ".staging_ckpt")
    groups.zipWithIndex.foreach { case (group, i) =>
      val df = s.createDataFrame(group.asJava, ckptSchema)
      df.coalesce(1).write.mode("overwrite").parquet(staging.getPath)
      val part = staging.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest =
        if (parts == 1) f"$version%020d.checkpoint.parquet"
        else f"$version%020d.checkpoint.${i + 1}%010d.$parts%010d.parquet"
      java.nio.file.Files.move(part.toPath,
        new File(logDir, dest).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    staging.listFiles().foreach(_.delete())
    staging.delete()
    val partsField = if (parts == 1) "" else s""","parts":$parts"""
    java.nio.file.Files.write(new File(logDir, "_last_checkpoint").toPath,
      s"""{"version":$version,"size":${rows.size}$partsField}"""
        .getBytes(UTF_8))
    version
  }

  /** Write `df` as one parquet data file `name` inside `tableDir` (no log
    * entry — pair with addAction in a commit). */
  def writeDataFile(df: DataFrame, tableDir: File, name: String): Unit = {
    val staging = new File(tableDir, s".staging_$name")
    df.coalesce(1).write.mode("overwrite").parquet(staging.getPath)
    val part = staging.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, new File(tableDir, name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    staging.listFiles().foreach(_.delete())
    staging.delete()
  }
}
