package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-side esdb query surface (SURVEY.md §2.1 S2-S6) over a
  * canonical [[EventFrame]].
  *
  * Every operator is a pure `DataFrame => DataFrame` transform; Catalyst
  * plans the physical access:
  *  - `space == x` → partition pruning when stored `partitionBy("space")`
  *    (replaces the reference's file-level SSTable, esdb.go:41-60);
  *  - attr predicates → parquet filter pushdown + row-group skipping
  *    (replaces the secondary-index location lists, space.go:79-108);
  *  - `orderBy.limit` → TakeOrderedAndProject, a true distributed top-k
  *    (replaces the Scanner early-exit callback, space.go:14,103-105).
  *
  * Ordering contract: ts-descending with insertion-order ties — the
  * reference's stable reverse sort (event_block_writer.go:15,
  * event.go:13) — reproduced exactly by the `event_id` tiebreak, since
  * distributed sorts are not stable.
  */
object EventStore {

  /** Reference `Db.Iterate` (esdb.go:63-76): all spaces in sorted order. */
  def iterateSpaces(ev: DataFrame): DataFrame =
    ev.select("space").distinct().orderBy("space")

  /** Reference `Space.Iterate` (space.go:45-60): groupings of one space, sorted. */
  def iterateGroupings(ev: DataFrame, space: String): DataFrame =
    ev.where(col("space") === space).select("grouping").distinct().orderBy("grouping")

  /** Reference `Space.Scan` (space.go:62-77): one grouping's events,
    * ts-desc, insertion-order ties; optional early-exit limit.
    */
  def scan(ev: DataFrame, space: String, grouping: String, limit: Option[Int] = None): DataFrame = {
    val base = ev
      .where(col("space") === space && col("grouping") === grouping)
      .orderBy(col("ts_us").desc, col("event_id").asc)
    limit.fold(base)(base.limit)
  }

  /** Reference `Space.ScanIndex` (space.go:79-108): events of a space
    * matching secondary index name:value, ts-desc, insertion ties.
    */
  def scanIndex(ev: DataFrame, space: String, name: String, value: String,
                limit: Option[Int] = None): DataFrame = {
    // prefer a write-time materialized index column (EsdbWriter
    // indexAttrs): the predicate then reaches parquet column stats
    // instead of re-parsing JSON per row — the reference's index-vs-scan
    // distinction (space.go:79-108 vs 62-77) at plan level
    val pred = if (ev.columns.contains(s"idx_$name")) col(s"idx_$name") === value
               else EventFrame.attr(name) === value
    val base = ev
      .where(col("space") === space && pred)
      .orderBy(col("ts_us").desc, col("event_id").asc)
    limit.fold(base)(base.limit)
  }
}
