package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the canonical event frame — the two
  * workhorse questions an event store like the reference exists to
  * answer at scale (its callers fold them by hand over `Scan`
  * callbacks, space.go:62-77; here they are declarative plans).
  *
  * Both operators reduce events to per-grouping scalars before any
  * join, so at 100 TB the shuffled data is one row per grouping per
  * stage — never event bodies. Stage joins are equi-joins on
  * `grouping` that AQE broadcasts as the funnel narrows (each stage's
  * survivor set only shrinks).
  */
object Funnel {

  /** Staged conversion funnel: stage 0 admits every grouping with a
    * `stages(0)` event; stage i admits a grouping when it has a
    * `stages(i)` event at-or-after its stage-(i-1) entry time and
    * within `windowUs` of it. Entry time = earliest qualifying event,
    * so the funnel is deterministic regardless of event order.
    *
    * Output: (stage_idx, stage, n_groupings), one row per stage.
    */
  def funnel(ev: DataFrame, stages: Seq[String],
             windowUs: Long = 6L * 3600L * 1000000L): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val entered = stages.tail.zipWithIndex.scanLeft(
      ev.where(col("space") === stages.head)
        .groupBy("grouping").agg(min(col("ts_us")).as("entry_us"))) {
      case (prev, (stage, _)) =>
        ev.where(col("space") === stage)
          .select(col("grouping"), col("ts_us"))
          .join(prev.select(col("grouping"), col("entry_us").as("prev_us")), "grouping")
          .where(col("ts_us") >= col("prev_us") && col("ts_us") < col("prev_us") + windowUs)
          .groupBy("grouping").agg(min(col("ts_us")).as("entry_us"))
    }
    entered.zip(stages).zipWithIndex.map { case ((df, stage), i) =>
      df.agg(count(lit(1)).as("n_groupings"))
        .select(lit(i.toLong).as("stage_idx"), lit(stage).as("stage"), col("n_groupings"))
    }.reduce(_ unionAll _).orderBy("stage_idx")
  }

  /** Cohort retention: groupings cohorted by the time bucket of their
    * first `cohortSpace` event; a cohort member counts in `offset_wk`
    * when it has an `activitySpace` event in that bucket at-or-after
    * the cohort bucket. Buckets are fixed-width epoch buckets (default
    * one week) so the bucketing is engine-neutral — no calendar.
    *
    * Output: (cohort_wk, offset_wk, n_groupings).
    */
  def retention(ev: DataFrame, cohortSpace: String, activitySpace: String,
                bucketUs: Long = 7L * 86400L * 1000000L): DataFrame = {
    val cohort = ev.where(col("space") === cohortSpace)
      .groupBy("grouping")
      .agg(min(expr(s"ts_us div $bucketUs")).as("cohort_wk"))
    val active = ev.where(col("space") === activitySpace)
      .select(col("grouping"), expr(s"ts_us div $bucketUs").as("wk"))
      .distinct()
    active.join(cohort, "grouping")
      .where(col("wk") >= col("cohort_wk"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(count(lit(1)).as("n_groupings"))
      .orderBy("cohort_wk", "offset_wk")
  }
}
