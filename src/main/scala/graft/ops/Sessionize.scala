package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over the canonical event frame: a new
  * session starts when a grouping (user) is idle longer than `gapUs`.
  *
  * Two window passes over the same `(grouping)` partitioning — Spark
  * plans ONE shuffle + sort and reuses it for both `lag` and the running
  * sum, then the groupBy re-aggregates within the same key space.
  * Partitioned by user, so it scales horizontally with user count; no
  * global sort anywhere.
  */
object Sessionize {

  val DefaultGapUs: Long = 30L * 60 * 1000 * 1000 // 30 min

  /** Per (grouping, session): event count and [start_us, end_us]. */
  def sessions(ev: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val byUser = Window.partitionBy(col("grouping")).orderBy(col("ts_us").asc, col("event_id").asc)
    ev.select(col("grouping"), col("ts_us"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("grouping"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min("ts_us").as("start_us"), max("ts_us").as("end_us"))
      .orderBy("grouping", "session_seq")
  }
}
