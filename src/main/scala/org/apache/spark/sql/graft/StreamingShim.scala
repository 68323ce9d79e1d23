package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one Spark-internal call the V1 streaming `Source` contract
  * forces on an external source: `getBatch` must return a DataFrame
  * whose logical plan is flagged `isStreaming = true`
  * (`MicroBatchExecution` asserts it), and the only constructor for
  * such a frame — `SparkSession.internalCreateDataFrame` — is
  * `private[sql]`. This object lives under `org.apache.spark.sql`
  * purely to re-expose that constructor to graft's change-feed source;
  * it contains no other Spark internals. (Spark's own V1 sources, e.g.
  * `FileStreamSource`, build their batches the same way.)
  */
object StreamingShim {

  /** Re-plan `df` as a streaming batch DataFrame (same rows, same
    * schema, `isStreaming = true`). The underlying RDD is built lazily
    * from `df`'s physical plan, so no computation happens here.
    */
  def asStreamingBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
