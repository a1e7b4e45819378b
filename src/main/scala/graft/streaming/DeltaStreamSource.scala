package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.ops.DeltaLake

/** Structured Streaming SOURCE over a Delta table — the read half of the
  * incremental story ([[DeltaSink]] is the write half): commit VERSIONS
  * are the offsets, so a micro-batch is exactly the rows some log-commit
  * range added.
  *
  *   spark.readStream
  *     .format("graft.streaming.DeltaSourceProvider")
  *     .option("path", dir).load()
  *
  * Semantics (the standard Delta source contract):
  *  - the first batch is the table's full snapshot at the stream's start
  *    version; every later batch is the `dataChange=true` add files of
  *    the commits in `(lastOffset, currentVersion]` — OPTIMIZE rewrites
  *    (`dataChange=false`) are invisible;
  *  - a commit that REMOVES rows (DELETE/UPDATE/MERGE copy-on-write) is
  *    not an append: the source raises unless `ignoreChanges=true`, in
  *    which case rewritten files re-emit their rows and downstream must
  *    dedup (exactly-once resumes from the checkpointed offset either
  *    way);
  *  - offsets are plain versions, so restart recovery is a log replay —
  *    no source-side state beyond the checkpoint.
  *
  * Scale: getOffset is a directory listing of `_delta_log`, getBatch
  * reads ONLY the batch's files (a distributed multi-file parquet scan
  * with partition-literal injection — pushdown and pruning intact).
  */
class DeltaSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "delta-stream"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(),
      schema.getOrElse(
        DeltaLake.read(ctx.sparkSession, path(parameters)).schema))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaStreamSource(ctx.sparkSession, path(parameters),
      ignoreChanges = parameters.get("ignoreChanges")
        .orElse(parameters.get("ignorechanges")).exists(_.toBoolean),
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger")
        .orElse(parameters.get("maxversionspertrigger")).map(_.toLong))
}

class DeltaStreamSource(spark: SparkSession, tableDir: String,
    ignoreChanges: Boolean,
    maxVersionsPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    Offset => OffsetV2, ReadLimit}

  override val schema: StructType = DeltaLake.read(spark, tableDir).schema

  /** Version captured at AvailableNow start: the run drains up to here
    * and stops, in `maxVersionsPerTrigger`-bounded steps. */
  @volatile private var availableAtStart: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableAtStart = DeltaLake.currentVersion(tableDir)

  /** Admission control (the FileStreamSource pattern — how a DSv1 source
    * rate-limits): the engine hands us the START offset, so a bounded
    * catch-up needs no source-side state and survives restarts. */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit)
      : OffsetV2 = {
    val cur0 = DeltaLake.currentVersion(tableDir)
    val cur =
      if (availableAtStart >= 0) math.min(cur0, availableAtStart) else cur0
    if (cur < 0) return null
    val from = Option(startOffset).map(_.json.trim.toLong)
    val capped = (maxVersionsPerTrigger, from) match {
      case (Some(n), Some(f)) => math.min(cur, f + n)
      case _ => cur
    }
    if (from.exists(_ >= capped)) null else LongOffset(capped)
  }

  override def reportLatestOffset(): OffsetV2 = {
    val v = DeltaLake.currentVersion(tableDir)
    if (v < 0) null else LongOffset(v)
  }

  override def getOffset: Option[Offset] = {
    val v = DeltaLake.currentVersion(tableDir)
    if (v < 0) None else Some(LongOffset(v))
  }

  /** Both LongOffset and the checkpoint-restored SerializedOffset
    * serialize as the bare version number. */
  private def version(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = version(end)
    val batch = start.map(version) match {
      case None => DeltaLake.readVersion(spark, tableDir, to)
      case Some(from) =>
        DeltaLake.readChanges(spark, tableDir, from, to, ignoreChanges)
    }
    StreamingBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()
}
