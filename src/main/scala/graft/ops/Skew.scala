package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join splitting covers joins;
  * this covers aggregations whose key distribution is pathological
  * (one space/index value holding a large fraction of all events — the
  * realistic shape of event streams, where one event type dominates).
  *
  * [[saltedAgg]] is classic two-phase aggregation: phase 1 aggregates
  * on (key, salt) — the hot key's rows spread over `salts` reducers —
  * phase 2 re-aggregates the per-salt partials on the key alone. Works
  * for any algebraic aggregate (max, min, sum, count); the second
  * shuffle moves `distinct keys × salts` rows, which is noise.
  */
object Skew {

  /** Deterministic salt derived from a spread column (not rand() — the
    * result must be reproducible run-to-run).
    */
  private def salt(spreadBy: Column, salts: Int): Column =
    pmod(xxhash64(spreadBy), lit(salts.toLong))

  /** Two-phase aggregate of `agg(valueCol)` grouped by `key`, spreading
    * each key's rows across `salts` partial groups. `combine` merges
    * partials (same function for algebraic aggs: max/max, sum/sum...).
    */
  def saltedAgg(df: DataFrame, key: Column, valueCol: Column, spreadBy: Column,
                agg: Column => Column, combine: Column => Column,
                salts: Int = 16): DataFrame =
    df.select(key.as("k"), valueCol.as("v"), salt(spreadBy, salts).as("s"))
      .groupBy(col("k"), col("s"))
      .agg(agg(col("v")).as("partial"))
      .groupBy(col("k"))
      .agg(combine(col("partial")).as("value"))

  /** Skew-safe [[graft.engine.EventLog.tails]]: per-index-value head
    * offsets via salted two-phase max. Identical results; the hot index
    * value no longer lands on one reducer.
    */
  def saltedTails(ev: DataFrame, name: String, salts: Int = 16): DataFrame = {
    import graft.engine.EventFrame
    saltedAgg(
      ev.where(EventFrame.attr(name).isNotNull && EventFrame.attr(name) =!= ""),
      EventFrame.attr(name), col("event_id"), col("event_id"),
      max, max, salts)
      .select(col("k").as("attr"), col("value").as("tail_event_id"))
      .orderBy("attr")
  }
}
