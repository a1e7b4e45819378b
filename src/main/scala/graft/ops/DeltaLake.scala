package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * metadata onto its Hive-style parquet scan. Checkpoint-parquet compaction
  * (`_last_checkpoint`) is documented out of scope: fixtures replay pure
  * JSON logs; a production log would need the checkpoint branch added.
  */
object DeltaLake {

  private val mapper = new ObjectMapper()

  private final case class AddFile(path: String,
      partitionValues: Map[String, String])

  /** Replay `_delta_log` and return (schema, partitionColumns, activeFiles). */
  private def replay(tableDir: File)
      : (StructType, Seq[String], Seq[AddFile]) = {
    val logDir = new File(tableDir, "_delta_log")
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("\\d{20}\\.json"))
      .sortBy(_.getName)
    require(commits.nonEmpty, s"no _delta_log commits under $tableDir")
    var schema: StructType = null
    var partCols: Seq[String] = Seq.empty
    val active = scala.collection.mutable.LinkedHashMap.empty[String, AddFile]
    for (commit <- commits;
         line <- new String(java.nio.file.Files.readAllBytes(
           commit.toPath), UTF_8).split('\n') if line.trim.nonEmpty) {
      val n = mapper.readTree(line)
      if (n.has("metaData")) {
        val m = n.get("metaData")
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
          AddFile(a.get("path").asText, pv))
      } else if (n.has("remove")) {
        active.remove(n.get("remove").get("path").asText)
      } // protocol / commitInfo / txn: no table-state effect here
    }
    require(schema != null, s"no metaData action in $tableDir/_delta_log")
    (schema, partCols, active.values.toSeq)
  }

  /** Read the current snapshot of a Delta table directory. */
  def read(s: SparkSession, tableDir: String): DataFrame = {
    val dir = new File(tableDir)
    val (schema, partCols, files) = replay(dir)
    val dataSchema = StructType(schema.fields.filterNot(f =>
      partCols.contains(f.name)))
    if (files.isEmpty)
      return s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    def partLit(f: StructField, v: String) =
      (if (v == null) lit(null) else lit(v)).cast(f.dataType).as(f.name)
    // one parquet read per distinct partition tuple (each group's files go
    // to a single multi-path scan; the injected literals keep the declared
    // column order)
    files.groupBy(_.partitionValues).map { case (pv, group) =>
      val paths = group.map(a => new File(dir, a.path).getPath)
      val df = s.read.schema(dataSchema).parquet(paths: _*)
      val cols = schema.fields.map { f =>
        if (partCols.contains(f.name)) partLit(f, pv.getOrElse(f.name, null))
        else col(f.name)
      }
      df.select(cols.toIndexedSeq: _*)
    }.reduce(_ unionAll _)
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
      partitionValues: Map[String, String] = Map.empty): String = {
    val pv = partitionValues
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    s"""{"add":{"path":"$path","partitionValues":$pv,"size":0,"modificationTime":0,"dataChange":true}}"""
  }

  def removeAction(path: String): String =
    s"""{"remove":{"path":"$path","deletionTimestamp":0,"dataChange":true}}"""

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
