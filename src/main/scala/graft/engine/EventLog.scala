package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stream-side esdb query surface (SURVEY.md §2.9, §3.3) — the
  * reference `stream` package's append-log reads, re-expressed over a
  * canonical [[EventFrame]] whose `event_id` is the logical offset
  * (reference offsets are byte positions, stream/stream.go:92-124; the
  * contract kept is monotone + resumable, not the byte values).
  */
object EventLog {

  /** True when the frame IS the order-reporting DSv2 log source
    * ([[graft.sources.EsdbLogSource]], opened by `EsdbWriter.readLog`),
    * under row-preserving nodes only (project/filter/alias): one input
    * partition, already merged in event_id order. A derived frame —
    * union, repartition, join — loses the single-partition premise, so
    * it must take the global sort path even though a log relation
    * appears somewhere inside it.
    */
  private def isLogStore(ev: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical
    def ok(p: logical.LogicalPlan): Boolean = p match {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.isInstanceOf[graft.sources.EsdbLogTable]
      case n: logical.Project => ok(n.child)
      case n: logical.Filter => ok(n.child)
      case n: logical.SubqueryAlias => ok(n.child)
      case _ => false
    }
    ok(ev.queryExecution.analyzed)
  }

  /** Reference `Stream.Iterate(offset, fn)` (stream/stream.go:92-124):
    * insertion-order scan from a resumption offset. Over a stored log
    * frame the order is the layout order: a per-partition sort (equal
    * to the global order on the log's single merged partition) that
    * `RemoveRedundantSorts` elides against the scan's reported
    * ordering, with the offset pushed down to file pruning + record
    * filters — a global `orderBy` would instead force a range exchange
    * that destroys the order the layout already has.
    */
  def iterate(ev: DataFrame, fromOffset: Long = 0L): DataFrame = {
    val filtered = ev.where(col("event_id") >= fromOffset)
    if (isLogStore(ev)) filtered.sortWithinPartitions("event_id")
    else filtered.orderBy("event_id")
  }

  /** Index attribute access: a write-time materialized `idx_<name>`
    * column when present (required for BINARY payloads, which are
    * opaque exactly as in the reference, event.go:16-21), JSON payload
    * extraction otherwise.
    */
  private def attrCol(ev: DataFrame, name: String): org.apache.spark.sql.Column =
    if (ev.columns.contains(s"idx_$name")) col(s"idx_$name") else EventFrame.attr(name)

  /** Reference `Stream.ScanIndex` (stream/stream.go:74-90): follow an
    * index's backward linked list — newest → oldest over matching events.
    */
  def scanIndex(ev: DataFrame, name: String, value: String): DataFrame =
    ev.where(attrCol(ev, name) === value).orderBy(col("event_id").desc)

  /** Reference `First(name, value)` (stream/open_stream.go:107-115):
    * head of one index list = max event_id among matches.
    */
  def first(ev: DataFrame, name: String, value: String): DataFrame =
    ev.where(attrCol(ev, name) === value)
      .agg(max("event_id").as("head_event_id"))

  /** Reference `populate` tails rebuild (stream/open_stream.go:219-241):
    * per index value, the newest event's offset. A map-side-combinable
    * argmax — one partial-agg shuffle, no sort of the raw events.
    */
  def tails(ev: DataFrame, name: String): DataFrame =
    ev.select(attrCol(ev, name).as("attr"), col("event_id"))
      .where(col("attr").isNotNull && col("attr") =!= "")
      .groupBy("attr")
      .agg(max("event_id").as("tail_event_id"))
      .orderBy("attr")

  /** Reference `stream.Merge` (stream/merge.go:7-34): concatenate
    * streams in argument order, preserving each stream's insertion
    * order, assigning fresh contiguous offsets.
    *
    * Scale note: a naive `row_number() OVER (ORDER BY ...)` forces the
    * whole dataset through one partition. Instead we range-partition on
    * (src, src_event_id) — partitions are then globally ordered — sort
    * within partitions, and assign ids with `zipWithIndex` (one extra
    * count job, no single-partition bottleneck). Deterministic: range
    * boundaries are sampled with fixed seeds and the total order has no
    * ties.
    */
  def merge(spark: SparkSession, srcs: Seq[DataFrame]): DataFrame = {
    require(srcs.nonEmpty, "merge of zero streams")
    val tagged = srcs.zipWithIndex.map { case (df, i) =>
      df.withColumnRenamed("event_id", "src_event_id").withColumn("src", lit(i.toLong))
    }
    val u = tagged.reduce(_ unionByName _)
    val ordered = u
      .repartitionByRange(col("src"), col("src_event_id"))
      .sortWithinPartitions(col("src"), col("src_event_id"))
    val schema = StructType(ordered.schema.fields :+ StructField("new_event_id", LongType, nullable = false))
    val rows = ordered.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rows, schema)
  }
}
