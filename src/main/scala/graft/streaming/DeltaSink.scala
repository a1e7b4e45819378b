package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.DeltaLake

/** Exactly-once streaming append into a Delta table.
  *
  * Structured Streaming's foreachBatch gives at-least-once batch delivery:
  * after a crash the engine replays the last unacknowledged micro-batch with
  * the SAME batchId. The Delta protocol's transaction identifiers (`txn`
  * actions — the same mechanism the reference's presto-delta tables carry in
  * their logs, and how every real streaming Delta writer achieves
  * exactly-once) turn that into exactly-once: each micro-batch commits a
  * `txn {appId, version=batchId}` watermark atomically WITH its add actions,
  * and a replayed batchId at-or-below the table's watermark is skipped
  * without writing anything.
  *
  * The dedup check is a driver-side log replay (O(commits since checkpoint));
  * the data write itself stays fully distributed through
  * [[DeltaLake.insertTxn]]. Watermarks survive log compaction —
  * [[DeltaLake.writeCheckpoint]] persists the per-app `txn` rows into the
  * checkpoint parquet, so retention deleting old JSON commits cannot
  * resurrect an already-applied batch.
  */
object DeltaSink {

  /** A foreachBatch function: `df.writeStream.foreachBatch(exactlyOnce(dir,
    * appId))`. `appId` must be stable across restarts (the reference
    * convention: one id per sink query, e.g. the checkpoint location). */
  def exactlyOnce(tableDir: String, appId: String)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      DeltaLake.insertTxn(batch.sparkSession, tableDir, batch,
        Some((appId, batchId)))
      ()
    }
}
