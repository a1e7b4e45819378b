package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.IcebergTable

/** Exactly-once streaming append into an Iceberg table — the snapshot
  * SUMMARY-property watermark convention real Iceberg sinks use (the
  * counterpart of [[DeltaSink]]'s `txn` actions): each micro-batch's
  * fast-append snapshot carries `graft.txn.<appId> -> batchId`, committed
  * atomically with the data, and a replayed batchId at-or-below the
  * watermark is skipped. Watermarks live in the metadata JSON, so
  * rewrites/compactions can't lose them while the snapshot is retained. */
object IcebergSink {

  /** A foreachBatch function: `df.writeStream.foreachBatch(
    * exactlyOnce(dir, appId))`; `appId` must be stable across restarts. */
  def exactlyOnce(tableDir: String, appId: String)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      IcebergTable.insertAppendTxn(batch.sparkSession, tableDir, batch,
        Some((appId, batchId)))
      ()
    }
}
