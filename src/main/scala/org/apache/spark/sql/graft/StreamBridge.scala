package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** In-package shim for the one streaming-internal call a V1 source needs:
  * `getBatch` must return a DataFrame tagged `isStreaming = true` or
  * `MicroBatchExecution` rejects it at plan-splice time, and the only way
  * to produce one from an ordinary (lazy) batch plan is the
  * `private[sql]` `internalCreateDataFrame`. Same bridge pattern as
  * [[ColumnBridge]]; every other line of the source stays on public API.
  */
object StreamBridge {

  /** Re-tag a lazy batch DataFrame as a streaming micro-batch. The plan is
    * not executed here — `toRdd` is the deferred physical RDD, so the
    * parquet scan (with its pushed filters and explicit file list) runs
    * only when the micro-batch does. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
