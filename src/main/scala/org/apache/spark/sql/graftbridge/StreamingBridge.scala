package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, DataFrame, Row}

/** Access to `SparkSession.internalCreateDataFrame` (private[sql]): a
  * DSv1 streaming `Source.getBatch` must return a DataFrame whose plan is
  * tagged `isStreaming = true` (MicroBatchExecution asserts it). This is
  * the same re-tagging FileStreamSource does with its per-batch file
  * scan; the batch plan's computed rows are exposed as an InternalRow
  * RDD and re-wrapped under a streaming LogicalRDD. Additive shim —
  * nothing in Spark is modified. */
object StreamingBridge {
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
