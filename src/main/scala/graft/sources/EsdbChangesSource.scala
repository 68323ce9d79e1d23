package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.types.StructType

import graft.engine.{EsdbWriter, Publish}

/** Streaming change-feed over an ordered store's VERSION HISTORY —
  * `spark.readStream.format("esdbchanges").load(path)`.
  *
  * Offsets are the store's committed version numbers: each micro-batch
  * drains `EsdbWriter.changesFeedBetween(from, to)` — row-level
  * insert/delete CDC that survives rewrites (carried files cancel by
  * name; only the rewrite footprint pays the hash-projected multiset
  * diff; pure-append windows stream their added files directly). This
  * lifts the batch feed (X22) to a checkpointed stream the way the log
  * layout's micro-batch source lifted its batch reads: the version
  * sequence IS the offset sequence, so a restart resumes exactly at
  * the last committed version. Reference analog: the resumable
  * `Iterate(offset)` contract (stream/stream.go:92-124) applied to
  * publishes instead of rows.
  *
  * Options:
  *  - `sinceVersion` (default: the version committed when the query
  *    starts): the feed's exclusive lower bound — the stream emits
  *    changes committed AFTER it.
  *  - `maxVersionsPerTrigger` (default unbounded): admission control —
  *    cap how many committed versions one micro-batch may span, so a
  *    long-offline consumer catches up in bounded, checkpointed steps
  *    instead of one giant diff.
  *  - `exactDiff` (default false): route every window through the
  *    bit-exact EXCEPT ALL diff instead of the 96-bit hash projection
  *    — the audit mode (full payloads shuffle; see
  *    [[EsdbWriter.changesFeed]]'s probabilistic-bound note).
  *
  * Post-commit in-place appends (plain `append()`, no publish) are
  * not yet snapshot-captured; they surface when the next version
  * commits. The feed window is the retention window (`keepVersions`):
  * a consumer further behind than retention fails loudly on the swept
  * snapshot rather than silently skipping changes.
  *
  * V1 `Source` deliberately (not DSv2): `getBatch` returns a
  * DataFrame, which lets the batch BE the distributed diff plan —
  * hash-aggregations and joins — instead of forcing the diff through
  * per-partition readers that cannot express a join.
  */
class EsdbChangesStream(spark: SparkSession, path: String,
                        sinceVersion: Option[Long],
                        maxVersionsPerTrigger: Option[Long],
                        exactDiff: Boolean = false) extends Source {

  private def conf = spark.sparkContext.hadoopConfiguration

  /** Exclusive lower bound of the whole stream. */
  private val startVersion: Long = sinceVersion.getOrElse {
    Publish.currentVersionNumber(conf, path).getOrElse(
      throw new IllegalArgumentException(
        s"store at $path has no committed version yet — publish (compact/appendVersioned) " +
          "once, or pass option(\"sinceVersion\", v)"))
  }

  /** Highest version handed out or recovered so far — the base the
    * per-trigger admission cap advances from.
    */
  @volatile private var known: Long = startVersion

  override val schema: StructType = EsdbWriter.changesFeedSchema(spark, path)

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after a restart
  }

  override def getOffset: Option[Offset] = {
    val latest = Publish.currentVersionNumber(conf, path).getOrElse(startVersion)
    val capped = maxVersionsPerTrigger match {
      case Some(m) => math.min(latest, known + math.max(1L, m))
      case None => latest
    }
    if (capped <= startVersion) None else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startVersion)
    val to = versionOf(end)
    known = math.max(known, to)
    val batch = EsdbWriter.changesFeedBetween(spark, path, from, Some(to), exactDiff)
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
    // the streaming contract: the returned frame must carry
    // isStreaming=true (MicroBatchExecution asserts it)
    org.apache.spark.sql.graft.StreamingShim.asStreamingBatch(spark, batch)
  }

  override def commit(end: Offset): Unit = { known = math.max(known, versionOf(end)) }

  override def stop(): Unit = ()
}

class EsdbChangesSource extends StreamSourceProvider with RelationProvider
  with DataSourceRegister {

  override def shortName(): String = "esdbchanges"

  private def pathOf(parameters: Map[String, String]): String = {
    val lower = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    lower.getOrElse("path", throw new IllegalArgumentException(
      "esdbchanges requires a store path: spark.read/readStream" +
        ".format(\"esdbchanges\").load(path)"))
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      EsdbWriter.changesFeedSchema(sqlContext.sparkSession, pathOf(parameters))))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val lower = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    new EsdbChangesStream(sqlContext.sparkSession, pathOf(parameters),
      lower.get("sinceversion").map(_.toLong),
      lower.get("maxversionspertrigger").map(_.toLong),
      lower.get("exactdiff").exists(_.toBoolean))
  }

  /** BATCH read of one feed window (r12) — the SQL-surface form of
    * [[EsdbWriter.changesFeedBetween]]:
    * {{{
    *   spark.read.format("esdbchanges")
    *     .option("sinceVersion", 3).load(path)          // (3 → head]
    *   CREATE TEMPORARY VIEW f USING esdbchanges
    *     OPTIONS (path '…', sinceVersion '3', toVersion '5')
    * }}}
    * `sinceVersion` is required (a batch window needs its exclusive
    * lower bound; the stream form defaults it to the at-start head —
    * meaningless for a one-shot read). `toVersion` pins the upper
    * bound (default: live head); `exactDiff` routes through the
    * EXCEPT ALL audit path. The relation's scan IS the distributed
    * diff plan — nothing materializes on the driver — and the window
    * resolves at SCAN time, not view-creation time: a temporary view
    * over a live head sees versions committed after the view was
    * defined, and a retired base version fails with the feed's loud
    * retention error on the query that hits it (same load-time
    * resolution contract as the catalog tables). `needConversion =
    * false` serves the plan's InternalRows directly — no Row
    * round-trip per feed row.
    */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val lower = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val since = lower.getOrElse("sinceversion", throw new IllegalArgumentException(
      "esdbchanges batch read requires option(\"sinceVersion\", v) — the window's " +
        "exclusive lower bound")).toLong
    val feedPath = pathOf(parameters)
    val toVersion = lower.get("toversion").map(_.toLong)
    val exact = lower.get("exactdiff").exists(_.toBoolean)
    val sqlc = sqlContext
    val spark = sqlContext.sparkSession
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = sqlc
      // the declared schema is the view's contract; each scan's fresh
      // feed aligns to it by name (a post-creation widened store's new
      // column is simply not part of this view)
      override val schema: StructType = EsdbWriter.changesFeedSchema(spark, feedPath)
      override def needConversion: Boolean = false
      override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
        val feed = EsdbWriter.changesFeedBetween(spark, feedPath, since, toVersion, exact)
        // added store columns simply aren't part of this view; a
        // MISSING or RETYPED column (e.g. a post-creation widening)
        // refuses loudly — silently down-casting a widened column
        // would wrap values (or die mid-scan under ANSI)
        val drift = schema.flatMap { f =>
          feed.schema.fields.find(_.name == f.name) match {
            case None => Some(s"${f.name} (gone)")
            case Some(g) if g.dataType != f.dataType =>
              Some(s"${f.name}: view ${f.dataType.simpleString} vs " +
                s"store ${g.dataType.simpleString}")
            case _ => None
          }
        }
        if (drift.nonEmpty) throw new IllegalStateException(
          s"the store's schema evolved since this esdbchanges view was defined " +
            s"(${drift.mkString("; ")}) — recreate the view to pick up the new schema")
        feed.select(schema.map(f =>
          org.apache.spark.sql.functions.col(f.name)).toSeq: _*)
          .queryExecution.toRdd
          .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
      }
    }
  }
}
