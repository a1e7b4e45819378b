package graft.streaming

import java.io.File
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.ops.IcebergTable

/** Structured Streaming SOURCE over an Iceberg table — snapshot ORDINALS
  * (the position in the metadata's append-ordered snapshot list; ids
  * themselves are random) are the offsets:
  *
  *   spark.readStream
  *     .format("graft.streaming.IcebergSourceProvider")
  *     .option("path", dir).load()
  *
  *  - the first batch is the full snapshot current at stream start;
  *  - each later batch is the data files the offset-range snapshots
  *    APPENDED (fast-append manifests carry priors forward untouched, so
  *    a snapshot's own additions are exactly its new manifests' entries);
  *  - a snapshot that adds DELETE files or drops data files is not an
  *    append (DELETE/UPDATE/MERGE/rewrite): raise unless
  *    `ignoreChanges=true`, which skips the non-append metadata and
  *    emits only genuinely new data files (downstream dedups).
  *
  * getOffset reads one JSON metadata file; getBatch scans only the
  * batch's parquet files. */
class IcebergSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "iceberg-stream"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("'path' option is required"))

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String])
      : (String, StructType) =
    (shortName(), schema.getOrElse(
      IcebergTable.read(ctx.sparkSession, path(parameters)).schema))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(ctx.sparkSession, path(parameters),
      ignoreChanges = parameters.get("ignoreChanges")
        .orElse(parameters.get("ignorechanges")).exists(_.toBoolean))
}

class IcebergStreamSource(spark: SparkSession, tableDir: String,
    ignoreChanges: Boolean) extends Source {

  override val schema: StructType =
    IcebergTable.read(spark, tableDir).schema

  override def getOffset: Option[Offset] = {
    val n = IcebergTable.snapshots(spark, tableDir).count()
    if (n == 0) None else Some(LongOffset(n))
  }

  private def ordinal(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = ordinal(end)
    val batch = start.map(ordinal) match {
      case None =>
        // initial snapshot: the table as of the end-ordinal snapshot
        IcebergTable.readAt(spark, tableDir,
          IcebergTable.snapshotIdAtOrdinal(tableDir, to))
      case Some(from) =>
        IcebergTable.readAppended(spark, tableDir, from, to, ignoreChanges)
    }
    StreamingBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()
}
