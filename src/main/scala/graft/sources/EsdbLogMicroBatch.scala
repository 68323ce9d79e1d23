package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming consumption of a LOG store — the reference's
  * open-stream read loop made a Structured Streaming source: a consumer
  * holds a resumable offset into the append log and each wakeup reads
  * exactly the events appended since (stream/stream.go:92-124's
  * `Iterate(offset, fn)` called repeatedly; `populate`'s recovery
  * replay is the same loop from zero, open_stream.go:219-241).
  *
  * Offsets are the log's own `event_id`s (monotone by the append
  * contract), so the checkpoint IS the reference's persisted offset:
  * batch N covers `(lastSeen, latest]`, enforced exactly by the same
  * bounded merge reader the batch path uses — id range claimed,
  * re-checked row-wise, ascending early exit. The write-time id-range
  * manifest prunes files wholly at-or-below the consumed offset, so a
  * tail read costs the appended suffix, not the log's history.
  *
  * Appends land as new files and are picked up at the next trigger
  * (`latestOffset` re-reads the manifest); `Trigger.AvailableNow`
  * drains to the current head and terminates — the batch-equivalent
  * form the correctness gate oracles.
  */
final class EsdbLogMicroBatch(path: String, required: StructType,
                              parallel: Boolean = false)
  extends MicroBatchStream {

  import EsdbLogMicroBatch._

  private def spark = SparkSession.active

  private def manifestRanges(): Map[String, (Long, Long)] =
    graft.engine.EsdbWriter.logManifestRanges(
      spark.sparkContext.hadoopConfiguration, path).getOrElse(Map.empty)

  /** Newest event_id currently in the log: manifest max for covered
    * files, footer stats for any the manifest misses (a store written
    * before manifests existed, or a crash between append and manifest
    * refresh), so appends are never silently invisible to the stream.
    * -1 on an empty log; rows with NULL event_id have no offset and
    * are invisible to the streaming surface by construction (bounds
    * exclude nulls).
    */
  private def headId(): Long = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(hconf)
    if (!fs.exists(root)) return -1L
    val ranges = manifestRanges()
    // LogCommits visibility: a half-written streaming batch must not
    // advance the head (its rows would be consumed then rewritten)
    val files = graft.engine.LogCommits.visibleDataFiles(fs, root)
    if (files.isEmpty) return -1L
    files.map { f =>
      ranges.get(f.getPath.getName) match {
        case Some((_, mx)) => mx
        case None => footerMaxId(hconf, f.getPath)
      }
    }.max
  }

  /** Max event_id from one file's column-chunk statistics; -1 when the
    * column or its stats are absent (all-null ids contribute nothing).
    */
  private def footerMaxId(hconf: org.apache.hadoop.conf.Configuration, p: Path): Long = {
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
    try {
      var mx = -1L
      r.getFooter.getBlocks.forEach { b =>
        b.getColumns.forEach { c =>
          if (c.getPath.toDotString == "event_id") {
            val st = c.getStatistics
            if (st != null && st.hasNonNullValue)
              mx = math.max(mx, st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
        }
      }
      mx
    } finally r.close()
  }

  override def initialOffset(): Offset = LogOffset(-1L)

  override def latestOffset(): Offset = LogOffset(math.max(headId(), -1L))

  override def deserializeOffset(json: String): Offset = LogOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[LogOffset].lastSeen
    val to = end.asInstanceOf[LogOffset].lastSeen
    rememberBounds(from, to)
    if (to <= from) return Array.empty
    // manifest file pruning, as in the batch scan: files wholly at or
    // below the consumed offset never open; unmanifested files are
    // conservatively read (the bounded reader re-checks row-wise)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    if (!fs.exists(root)) return Array.empty
    val ranges = manifestRanges()
    val kept = graft.engine.LogCommits.visibleDataFiles(fs, root)
      .filter { f =>
        ranges.get(f.getPath.getName) match {
          case Some((_, mx)) => mx > from
          case None => true
        }
      }
      .sortBy(_.getPath.getName)
    if (kept.isEmpty) Array.empty
    else {
      // The batch bounds (from, to] ride the exact bounded merge
      // reader — or, when the footer proof holds (disjoint null-free
      // ranges wholly inside (from, to], the steady state for both a
      // full drain and a file-aligned suffix read), the vectorized
      // concatenation path, carried on each partition.
      //
      // Under option("parallel") the batch itself splits into one
      // partition per manifest-proven disjoint id-range file group: a
      // backlog replay (the reference's `populate`,
      // open_stream.go:219-241) runs as wide as the log's file groups
      // instead of serializing one reader per micro-batch. Exact
      // (from, to] coverage is enforced per reader either way; what
      // the option trades away is the single-cursor per-batch global
      // order, so it is OPT-IN — default consumers keep the
      // one-partition merge order they were built against.
      val groups =
        if (!parallel) Seq(kept)
        else EsdbLogScan.disjointGroups(kept, ranges).getOrElse(Seq(kept))
      EsdbLogScan.groupPartitions(groups, required, batchBounds,
        spark.sparkContext.hadoopConfiguration).asInstanceOf[Array[InputPartition]]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new EsdbLogReaderFactory(required, batchBounds, limit = None,
      conf = new org.apache.spark.util.SerializableConfiguration(
        EsdbVectorReader.sessionConf()))

  // planInputPartitions and createReaderFactory are called once per
  // batch, in that order, with the same offsets — capture the bounds
  // for the factory
  @volatile private var batchBounds: TsBounds = TsBounds.unbounded

  override def commit(end: Offset): Unit = () // checkpoint-managed

  override def stop(): Unit = ()

  override def toString: String = s"EsdbLogMicroBatch($path)"

  /** Spark calls planInputPartitions(start, end) then
    * createReaderFactory(); remember the range for the factory.
    */
  private[sources] def rememberBounds(from: Long, to: Long): Unit =
    batchBounds = TsBounds.unbounded.withLower(from, inclusive = false)
      .withUpper(to, inclusive = true)
}

object EsdbLogMicroBatch {
  /** The consumer's resumable position: the newest event_id it has
    * fully processed (the reference's persisted stream offset).
    */
  final case class LogOffset(lastSeen: Long) extends Offset {
    override def json(): String = lastSeen.toString
  }
}
