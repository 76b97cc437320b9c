package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.SparkSession

/** The one `private[sql]` door a V1 streaming source needs: a
  * micro-batch `getBatch` must return a DataFrame whose logical plan
  * is flagged `isStreaming`, or `MicroBatchExecution` rejects it —
  * and the only constructor for such a frame
  * (`SparkSession.internalCreateDataFrame(…, isStreaming = true)`) is
  * package-private. Every third-party V1 connector ships exactly this
  * shim (the alternative, a full DataSource V2 `MicroBatchStream`,
  * would mean re-implementing the parquet `PartitionReader` stack the
  * batch reader already provides). Kept to the single call — no other
  * internals are touched. */
object StreamingShim {

  /** Re-root `df`'s physical RDD under a streaming-flagged LogicalRDD
    * so MicroBatchExecution accepts it as a source batch. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
