package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, V1Write, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, UnsafeProjection}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DSv2 write path for engine stores: `INSERT INTO esdb.ns.table ...`
  * and `df.write.format("esdb"|"esdblog").mode("append").save(path)`
  * become reference appends (`Stream.Write`, open_stream.go:77-105).
  *
  * Implemented as Spark's [[V1Write]] bridge rather than a bespoke
  * `BatchWrite`, deliberately: the layout invariants that make a store
  * a store — partition-leading sort (space[, bucket], grouping,
  * ts desc, id), creation-time subpartitioning, grouping/ts manifests
  * maintained as batch-sized deltas, bloom-filtered idx columns — live
  * in ONE place ([[graft.engine.EsdbWriter.append]]/`appendLog`), and
  * the bridge hands the whole incoming DataFrame to that code path.
  * A parallel `DataWriter` implementation would be a second copy of
  * the layout contract that could drift from the one the compactor
  * and the readers trust.
  *
  * Append-only, like the reference: overwrite/truncate is refused
  * (rewrites go through compaction's versioned publish, which keeps
  * snapshot isolation for concurrent readers), writes to a sealed
  * stream fail (closed_stream.go:48-50), and version-pinned snapshots
  * (`VERSION AS OF` / `option("version", n)`) never accept writes —
  * the table is then bound to a retired data root, not the live store.
  *
  * `idx_*` index columns are recomputed from the payload on the way in
  * (the write-time index contract, space_writer.go:47-49), so an
  * INSERT cannot desynchronize an index from its payload even if it
  * supplies idx values explicitly.
  */
final class EsdbWriteBuilder(logicalPath: String, tableSchema: StructType,
                             logLayout: Boolean,
                             info: Option[LogicalWriteInfo] = None) extends WriteBuilder {

  private def relation: InsertableRelation = new InsertableRelation {
    override def insert(data: DataFrame, overwrite: Boolean): Unit = {
      if (overwrite) throw new UnsupportedOperationException(
        s"esdb store at $logicalPath is append-only: rewrites go through " +
          "EsdbWriter.write/compact under Publish.publish (snapshot-isolated " +
          "versioned replace), not INSERT OVERWRITE")
      if (logLayout) graft.engine.EsdbWriter.appendLog(data, logicalPath)
      else {
        val indexAttrs = tableSchema.fieldNames.toSeq
          .filter(_.startsWith("idx_")).map(_.stripPrefix("idx_"))
        val conf = data.sparkSession.sparkContext.hadoopConfiguration
        // a CDC-followed table (`_CDC` marker / TBLPROPERTIES cdc=true)
        // appends as its OWN versioned commit so the rows surface in
        // esdbchanges immediately, not at the next unrelated publish;
        // the default stays the cheap in-place append. Retention: the
        // widest declared window wins (the marker's recorded CTAS
        // keepVersions vs any _POLICY keep_versions), so an INSERT's
        // version sweep never collapses history a consumer relies on.
        graft.engine.EsdbWriter.cdcKeepVersions(conf, logicalPath) match {
          case Some(markerKeep) =>
            val keep = math.max(markerKeep,
              graft.engine.Maintenance.policyOf(conf, logicalPath)
                .map(_.keepVersions).getOrElse(2))
            graft.engine.EsdbWriter.appendVersioned(data, logicalPath,
              keepVersions = keep, indexAttrs = indexAttrs)
          case None =>
            graft.engine.EsdbWriter.append(data, logicalPath, indexAttrs)
        }
      }
    }
  }

  override def build(): Write =
    if (!logLayout) {
      // the store-layout Write is ALSO the native streaming sink
      // (`df.writeStream.format("esdb")`): micro-batches arrive
      // clustered by space and sorted (space, grouping, ts desc, id),
      // so each file an executor writes is one space's correctly-
      // ordered epoch slice — the invariant the ordered merge reader
      // rests on. The batch V1 path re-sorts inside append() either way.
      val writeSchema = info.map(_.schema()).getOrElse(tableSchema)
      new V1Write with RequiresDistributionAndOrdering {
        override def toInsertableRelation: InsertableRelation = relation
        override def requiredDistribution(): Distribution =
          Distributions.clustered(Array(Expressions.column("space")))
        override def requiredOrdering(): Array[SortOrder] = EsdbStoreSink.order
        override def toStreaming: StreamingWrite = {
          // validate at query START, not first batch
          val spark = SparkSession.active
          val conf = spark.sparkContext.hadoopConfiguration
          Seq("space" -> StringType, "grouping" -> StringType,
            "ts_us" -> LongType, "event_id" -> LongType).foreach { case (n, dt) =>
            require(writeSchema.fields.exists(f => f.name == n && f.dataType == dt),
              s"store streaming sink requires a $n ${dt.simpleString} column")
          }
          val root = graft.engine.Publish.resolve(conf, logicalPath)
          val base = graft.engine.EsdbWriter.schemaManifest(conf, root)
          // the write-time index contract (space_writer.go:47-49) holds
          // for streamed batches too: every idx_* column the store (or
          // the incoming schema) declares is RECOMPUTED from the payload
          // on the executors, so a stream can no more desynchronize an
          // index than an INSERT can
          val indexAttrs = (base.toSeq.flatMap(_.fieldNames) ++ writeSchema.fieldNames)
            .filter(_.startsWith("idx_")).map(_.stripPrefix("idx_")).distinct
          if (indexAttrs.nonEmpty)
            require(writeSchema.fields.exists(f =>
              f.name == "payload" && f.dataType == StringType),
              "an indexed store's streaming sink needs a payload STRING column " +
                s"to recompute idx_{${indexAttrs.mkString(",")}} at write time")
          val full0 = StructType(writeSchema.fields ++ indexAttrs
            .filterNot(a => writeSchema.fieldNames.contains(s"idx_$a"))
            .map(a => StructField(s"idx_$a", StringType, nullable = true)))
          // an ID-ed store must stamp streamed files too: align the
          // batch schema to the sidecar's field IDs (fresh IDs for
          // never-seen columns) before any file opens
          val full = base match {
            case Some(b) if graft.engine.FieldIds.hasIds(b) =>
              graft.engine.FieldIds.align(full0, b)
            case _ => full0
          }
          // `space` rides in the hive partition dir, exactly like the
          // batch writer's partitionBy("space") — files never carry it
          val fileSchema = StructType(full.filterNot(_.name == "space"))
          EsdbRowParquetWriter.messageType(fileSchema): Unit
          new EsdbStoreStreamingWrite(logicalPath, writeSchema, fileSchema,
            StructType(full), indexAttrs)
        }
      }
    }
    else {
      // the log-layout Write is also the NATIVE streaming sink
      // (`df.writeStream.format("esdblog")`). RequiresDistributionAndOrdering
      // makes every micro-batch arrive range-partitioned and sorted by
      // event_id, so each file an executor writes is internally sorted —
      // the invariant the log reader's k-way merge rests on (the batch
      // V1 path re-sorts inside appendLog either way).
      val writeSchema = info.map(_.schema()).getOrElse(tableSchema)
      val filesPerBatch = info.map(_.options)
        .flatMap(o => Option(o.get("filesPerBatch"))).map(_.toInt).getOrElse(1)
      new V1Write with RequiresDistributionAndOrdering {
        override def toInsertableRelation: InsertableRelation = relation
        override def requiredDistribution(): Distribution =
          Distributions.ordered(EsdbLogSink.order)
        override def requiredOrdering(): Array[SortOrder] = EsdbLogSink.order
        override def requiredNumPartitions(): Int = filesPerBatch
        override def toStreaming: StreamingWrite = {
          // validate at query START, not first batch: unsupported nested
          // columns and a missing id must fail before any state exists
          require(writeSchema.fields.exists(f =>
            f.name == "event_id" && f.dataType == LongType),
            "log stores require an event_id BIGINT column (the merge/order key)")
          EsdbRowParquetWriter.messageType(writeSchema): Unit
          new EsdbLogStreamingWrite(logicalPath, writeSchema)
        }
      }
    }
}

private[sources] object EsdbLogSink {
  /** The one ordering of a log store: insertion order (event_id ASC). */
  val order: Array[SortOrder] =
    Array(Expressions.sort(Expressions.column("event_id"), SortDirection.ASCENDING))
}

private[sources] object EsdbStoreSink {
  /** The store layout's within-file order: space leads (the writer
    * splits files on space boundaries), then the scan contract
    * (grouping ASC, ts_us DESC, event_id ASC) — identical to
    * `partitionForWrite`'s sortWithinPartitions.
    */
  val order: Array[SortOrder] = Array(
    Expressions.sort(Expressions.column("space"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column("grouping"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.column("ts_us"), SortDirection.DESCENDING),
    Expressions.sort(Expressions.column("event_id"), SortDirection.ASCENDING))
}

/** One streaming task's output file for one epoch (empty name = the
  * task had no rows, or a replayed epoch was already committed).
  */
final case class EsdbStreamFileMessage(name: String, rows: Long) extends WriterCommitMessage

/** The native exactly-once streaming sink for log stores — the
  * reference's `Stream.Write` loop (open_stream.go:77-105) as a first-
  * class `writeStream` target, built on the [[graft.engine.LogCommits]]
  * marker protocol:
  *
  *  - executors write each micro-batch partition STRAIGHT to its final
  *    `stream-<epoch>-p<partition>-<uuid>.parquet` name — files are
  *    invisible to every reader until the epoch's marker exists, so
  *    there is no staging dir and no rename anywhere (object-store
  *    safe);
  *  - the driver's `commit(epoch)` writes the one marker object and
  *    extends the id-range manifest (footer reads for the new files
  *    only);
  *  - a replayed epoch whose marker already exists writes nothing
  *    (writers check the marker once per task) and `commit` deletes
  *    any stragglers — exactly-once, not at-least-once;
  *  - `abort` deletes the attempt's (invisible) files; a crash without
  *    abort leaves only invisible garbage that the epoch's replay
  *    re-resolves.
  */
final class EsdbLogStreamingWrite(logicalPath: String, schema: StructType)
  extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new EsdbLogWriterFactory(logicalPath, schema,
      new SerializableConfiguration(EsdbVectorReader.sessionConf()))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val names = messages.toSeq.collect {
      case EsdbStreamFileMessage(n, _) if n != null && n.nonEmpty => n
    }
    graft.engine.EsdbWriter.commitStreamEpoch(
      SparkSession.active, logicalPath, epochId, names)
    // keep the schema sidecar in step with evolving streamed batches
    // (additive columns; type changes refuse at unionSchemas)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    graft.engine.EsdbWriter.mergeSchemaManifest(
      conf, graft.engine.Publish.resolve(conf, logicalPath), schema)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val root = new Path(graft.engine.Publish.resolve(conf, logicalPath))
    val fs = root.getFileSystem(conf)
    messages.foreach {
      case EsdbStreamFileMessage(n, _) if n != null && n.nonEmpty =>
        fs.delete(new Path(root, n), false): Unit
      case _ => ()
    }
  }
}

final class EsdbLogWriterFactory(logicalPath: String, schema: StructType,
                                 conf: SerializableConfiguration)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val hconf = conf.value
    val logical = new Path(logicalPath)
    val fs = logical.getFileSystem(hconf)
    // seal + replay checks are per-task but O(1) metadata reads; the
    // data root is re-resolved per task so a concurrent compact's
    // publish redirects the NEXT batch, never tears this one
    if (fs.exists(new Path(logical, graft.engine.EsdbWriter.SealMarker)))
      throw new IllegalStateException(
        s"stream at $logicalPath is closed (reference: closed_stream.go:48-50)")
    val root = new Path(graft.engine.Publish.resolve(hconf, logicalPath))
    fs.mkdirs(root)
    val marker = new Path(new Path(root, graft.engine.LogCommits.Dir), s"$epochId.commit")
    if (fs.exists(marker)) new EsdbNoopStreamWriter
    else new EsdbLogDataWriter(root, schema, epochId, partitionId, hconf)
  }
}

/** Replay of an already-committed epoch: write nothing, so the
  * committed original is never shadowed even transiently.
  */
private final class EsdbNoopStreamWriter extends DataWriter[InternalRow] {
  override def write(row: InternalRow): Unit = ()
  override def commit(): WriterCommitMessage = EsdbStreamFileMessage("", 0L)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

final class EsdbLogDataWriter(root: Path, schema: StructType, epochId: Long,
                              partitionId: Int,
                              conf: org.apache.hadoop.conf.Configuration)
  extends DataWriter[InternalRow] {
  private var writer: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var file: Path = _
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (writer == null) { // lazily: an empty partition leaves no file
      file = new Path(root, f"stream-$epochId-p$partitionId%05d-" +
        java.util.UUID.randomUUID().toString.take(8) + ".parquet")
      writer = EsdbRowParquetWriter.open(file, schema, conf)
    }
    writer.write(row)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    EsdbStreamFileMessage(if (file == null) "" else file.getName, rows)
  }

  override def abort(): Unit = {
    if (writer != null) { try writer.close() catch { case _: Exception => () } }
    if (file != null) { file.getFileSystem(conf).delete(file, false): Unit }
  }

  override def close(): Unit = ()
}

/** One streaming task's STORE-layout output: the dot-staged files it
  * wrote (paths relative to the data root, `space=X/.stream-…`) and the
  * distinct (space, grouping) pairs they contain — the manifest delta
  * the driver's commit appends, so manifest upkeep stays O(batch), not
  * O(store).
  */
final case class EsdbStoreFilesMessage(files: Seq[String],
                                       pairs: Seq[(String, String)]) extends WriterCommitMessage

/** The native exactly-once streaming sink for STORE-layout dirs —
  * `df.writeStream.format("esdb")`, the streaming dual of
  * [[graft.engine.EsdbWriter.append]] (reference: the `Stream.Write`
  * ingest loop, open_stream.go:77-105, landing in the bucketed layout).
  *
  * Division of labor:
  *  - Spark plans each micro-batch clustered by `space` and sorted
  *    (space, grouping, ts_us DESC, event_id) — the sink's
  *    [[RequiresDistributionAndOrdering]] — so a task's rows arrive as
  *    contiguous per-space runs already in the layout's scan order;
  *  - each executor task writes one dot-staged parquet file per space
  *    run (`space=X/.stream-<epoch>-p<k>-<uuid>.parquet`) with idx_*
  *    columns recomputed from the payload — a leading dot keeps the
  *    file invisible to every reader until commit;
  *  - the driver's `commit(epoch)` finalizes via
  *    [[graft.engine.EsdbWriter.commitStoreEpoch]]: dot-strip renames,
  *    crashed-attempt straggler sweep, the epoch marker, and
  *    groupings/ts-range/schema sidecar deltas;
  *  - a replayed epoch whose marker exists writes nothing (the factory
  *    checks once per task) and commit sweeps replay duplicates —
  *    exactly-once, mirroring [[EsdbLogStreamingWrite]].
  *
  * Files of a value-clustered store streamed this way are sorted but
  * not value-clustered (a micro-batch can't see the domain); stats
  * pruning stays CORRECT (footer min/max still bound each file) and
  * the next compaction re-clusters them.
  *
  * Subpartitioned stores (`subparts > 1`) stream too: a grouping's
  * bucket is the same pure hash the batch writer uses
  * ([[graft.engine.EsdbWriter.bucketOf]]), so the task keeps one open
  * file per bucket of the CURRENT space (≤ subparts writers at once)
  * and routes each row — a bucket's subsequence of the task's
  * (grouping, ts desc, id)-sorted run is itself sorted, so the
  * per-file invariant and grouping-pinned bucket pruning both hold.
  */
final class EsdbStoreStreamingWrite(logicalPath: String, inputSchema: StructType,
                                    fileSchema: StructType, manifestSchema: StructType,
                                    indexAttrs: Seq[String]) extends StreamingWrite {

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new EsdbStoreWriterFactory(logicalPath, inputSchema, fileSchema, indexAttrs,
      new SerializableConfiguration(EsdbVectorReader.sessionConf()))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.toSeq.collect { case m: EsdbStoreFilesMessage => m }
    graft.engine.EsdbWriter.commitStoreEpoch(
      SparkSession.active, logicalPath, epochId,
      staged = ms.flatMap(_.files),
      pairs = ms.flatMap(_.pairs).distinct,
      batchSchema = manifestSchema)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val root = new Path(graft.engine.Publish.resolve(conf, logicalPath))
    val fs = root.getFileSystem(conf)
    messages.foreach {
      case EsdbStoreFilesMessage(files, _) =>
        files.foreach(f => fs.delete(new Path(root, f), false): Unit)
      case _ => ()
    }
  }
}

final class EsdbStoreWriterFactory(logicalPath: String, inputSchema: StructType,
                                   fileSchema: StructType, indexAttrs: Seq[String],
                                   conf: SerializableConfiguration)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val hconf = conf.value
    val logical = new Path(logicalPath)
    val fs = logical.getFileSystem(hconf)
    if (fs.exists(new Path(logical, graft.engine.EsdbWriter.SealMarker)))
      throw new IllegalStateException(
        s"stream at $logicalPath is closed (reference: closed_stream.go:48-50)")
    val root = new Path(graft.engine.Publish.resolve(hconf, logicalPath))
    fs.mkdirs(root)
    // the bucket count is read from the SAME version dir this task's
    // files land in, not captured at query start: a re-bucketing
    // compaction (compact with a new subparts) landing mid-stream
    // would otherwise leave this epoch hashing groupings into the OLD
    // bucket space inside the NEW layout — silently unprunable. A
    // version swap mid-epoch still surfaces via the commit's finalize
    // rename (the staged files' dir is gone) and the epoch replays.
    val subparts = graft.engine.EsdbWriter.subpartsOf(hconf, root.toString)
    val marker = new Path(new Path(root, graft.engine.LogCommits.Dir), s"$epochId.commit")
    if (fs.exists(marker)) new EsdbNoopStreamWriter
    else new EsdbStoreDataWriter(root, inputSchema, fileSchema, indexAttrs, subparts,
      epochId, partitionId, hconf)
  }
}

/** Writes one task's micro-batch partition as one dot-staged file per
  * (space run × bucket). Rows arrive sorted with `space` leading (the
  * sink's required ordering), so space rotation is a plain value-change
  * check; within a space, `subparts` writers stay open at most and each
  * row routes to its grouping's hash bucket.
  */
final class EsdbStoreDataWriter(root: Path, inputSchema: StructType,
                                fileSchema: StructType, indexAttrs: Seq[String],
                                subparts: Int,
                                epochId: Long, partitionId: Int,
                                conf: org.apache.hadoop.conf.Configuration)
  extends DataWriter[InternalRow] {

  private val spaceOrd = inputSchema.fieldIndex("space")
  private val groupingOrd = inputSchema.fieldIndex("grouping")
  // file columns from the input row: idx_* recomputed from the payload
  // (codegen'd JsonAttr — the same byte-scanner the batch path uses),
  // everything else bound by name
  private val project: UnsafeProjection = {
    val exprs = fileSchema.fields.toIndexedSeq.map { f =>
      val attr = f.name.stripPrefix("idx_")
      if (f.name.startsWith("idx_") && indexAttrs.contains(attr))
        graft.functions.JsonAttr(
          BoundReference(inputSchema.fieldIndex("payload"), StringType, nullable = true),
          Literal.create(attr, StringType))
      else {
        val i = inputSchema.fieldIndex(f.name)
        BoundReference(i, inputSchema.fields(i).dataType, inputSchema.fields(i).nullable)
      }
    }
    UnsafeProjection.create(exprs)
  }

  private val fs = root.getFileSystem(conf)
  // one open writer per bucket of the CURRENT space (flat store: one)
  private val writers =
    new Array[org.apache.parquet.hadoop.ParquetWriter[InternalRow]](subparts)
  private var currentSpace: org.apache.spark.unsafe.types.UTF8String = _
  private var currentGrouping: org.apache.spark.unsafe.types.UTF8String = _
  private var currentBucket: Int = 0
  private val staged = scala.collection.mutable.ArrayBuffer.empty[String]
  private val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

  private def closeAll(): Unit = {
    var b = 0
    while (b < subparts) {
      if (writers(b) != null) { writers(b).close(); writers(b) = null }
      b += 1
    }
  }

  private def openBucket(bucket: Int): org.apache.parquet.hadoop.ParquetWriter[InternalRow] = {
    val spaceDir = new Path(root,
      "space=" + ExternalCatalogUtils.escapePathName(currentSpace.toString))
    val dir = if (subparts == 1) spaceDir else new Path(spaceDir, s"bucket=$bucket")
    fs.mkdirs(dir)
    val file = new Path(dir, f".stream-$epochId-p$partitionId%05d-" +
      java.util.UUID.randomUUID().toString.take(8) + ".parquet")
    staged += (if (subparts == 1) s"${spaceDir.getName}/${file.getName}"
      else s"${spaceDir.getName}/${dir.getName}/${file.getName}")
    EsdbRowParquetWriter.open(file, fileSchema, conf,
      bloomCols = indexAttrs.map("idx_" + _))
  }

  override def write(row: InternalRow): Unit = {
    val space = row.getUTF8String(spaceOrd)
    val grouping = row.getUTF8String(groupingOrd)
    if (space == null || grouping == null) throw new IllegalArgumentException(
      "store events require non-null space and grouping")
    if (currentSpace == null || !space.equals(currentSpace)) {
      closeAll() // space runs are contiguous: the previous space is done
      currentSpace = space.clone()
      currentGrouping = null
    }
    // rows sort (space, grouping, …), so distinct pairs are contiguous
    // runs: O(#pairs) bookkeeping, no per-row set insertion — and the
    // bucket only changes when the grouping does (it is a pure hash)
    if (currentGrouping == null || !grouping.equals(currentGrouping)) {
      currentGrouping = grouping.clone()
      pairs += ((currentSpace.toString, currentGrouping.toString))
      currentBucket =
        if (subparts == 1) 0
        else graft.engine.EsdbWriter.bucketOf(currentGrouping.toString, subparts)
    }
    if (writers(currentBucket) == null) writers(currentBucket) = openBucket(currentBucket)
    writers(currentBucket).write(project(row))
  }

  override def commit(): WriterCommitMessage = {
    closeAll()
    EsdbStoreFilesMessage(staged.toSeq, pairs.toSeq)
  }

  override def abort(): Unit = {
    try closeAll() catch { case _: Exception => () }
    staged.foreach(f => fs.delete(new Path(root, f), false): Unit)
  }

  override def close(): Unit = ()
}

/** CTAS/RTAS target: `CREATE TABLE esdb.ns.t AS SELECT …` (and
  * `[CREATE OR] REPLACE TABLE … AS SELECT`) IS "creation by writing" —
  * the one way a store may legally come into existence, since the
  * writer establishes the layout invariants a bare DDL cannot (which
  * is why the catalog still rejects plain `CREATE TABLE`).
  *
  * Layout is steered by TBLPROPERTIES:
  *  - `layout`        — `store` (bucketed, default) or `log` (flat
  *    id-ordered stream layout);
  *  - `indexAttrs`    — comma-separated payload attrs materialized as
  *    bloom-filtered `idx_*` columns (space_writer.go:47-49);
  *  - `subparts`      — hot-space subpartition count (changeable later
  *    only by a full compaction with a new count);
  *  - `clusterBy`     — comma-separated value-domain clustering
  *    columns (X23), with `clusterChunks` (default 8) and
  *    `clusterCurve` (`range` default, or `zorder` for balanced
  *    multi-column pruning, X27) — fixed for the store's lifetime
  *    like subparts;
  *  - `keepVersions`  — publish retention for REPLACE (≥2 keeps the
  *    replaced snapshot readable by in-flight scans).
  *
  * Commit protocol: the query result is written into a fresh versioned
  * data dir and the publish POINTER commit makes it visible — all
  * inside `insert()` ([[graft.engine.Publish.publish]] is itself
  * stage-then-commit, and REPLACE must be a versioned publish to keep
  * snapshot isolation). `commitStagedChanges` is therefore a no-op and
  * `abortStagedChanges` has nothing partial to clean: before the
  * pointer lands readers see the old state, a crashed write leaves
  * only an orphaned staging dir the next publish sweeps, and a
  * concurrent publisher conflict fails the statement loudly.
  */
final class EsdbStagedTable(logicalPath: String, dataSchema: StructType,
                            props: java.util.Map[String, String])
  extends StagedTable with SupportsWrite {

  private val opts = new CaseInsensitiveStringMap(props)

  override def name(): String = s"esdb:$logicalPath (staged)"
  override def schema(): StructType = dataSchema
  // TRUNCATE is required by RTAS's OverwriteByExpression(true) plan and
  // is vacuous here: the write fills a FRESH versioned dir either way,
  // and the publish pointer swap is what replaces the old snapshot
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
    override def truncate(): WriteBuilder = this // versioned replace, not in-place
    override def build(): Write = new V1Write {
      override def toInsertableRelation: InsertableRelation = new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          val conf = data.sparkSession.sparkContext.hadoopConfiguration
          val indexAttrs = Option(opts.get("indexattrs")).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
          val subparts = Option(opts.get("subparts")).map(_.toInt).getOrElse(1)
          val keep = Option(opts.get("keepversions")).map(_.toInt).getOrElse(1)
          val clusterBy = Option(opts.get("clusterby")).toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
          val clusterChunks = Option(opts.get("clusterchunks")).map(_.toInt).getOrElse(8)
          val clusterCurve = Option(opts.get("clustercurve")).getOrElse("range")
          val cdc = Option(opts.get("cdc"))
            .exists(graft.engine.EsdbWriter.parseCdcFlag)
          Option(opts.get("layout")).getOrElse("store") match {
            case "store" =>
              graft.engine.Publish.publish(conf, logicalPath, keep) { tmp =>
                graft.engine.EsdbWriter.write(data, tmp, indexAttrs, subparts,
                  clusterBy = clusterBy, clusterChunks = clusterChunks,
                  clusterCurve = clusterCurve)
              }: Unit
            case "log" =>
              require(indexAttrs.isEmpty && subparts == 1 && clusterBy.isEmpty,
                "layout=log takes no indexAttrs/subparts/clusterBy (flat id-ordered stream layout)")
              graft.engine.Publish.publish(conf, logicalPath, keep) { tmp =>
                graft.engine.EsdbWriter.writeLog(data, tmp)
              }: Unit
            case other => throw new IllegalArgumentException(
              s"unknown layout '$other' — store (bucketed) or log (flat stream)")
          }
          // after the pointer commit: the marker lives at the logical
          // root and steers every future INSERT INTO on this table —
          // recording the declared keepVersions so CDC appends honor it
          if (cdc) graft.engine.EsdbWriter.setCdc(conf, logicalPath,
            enabled = true, keepVersions = math.max(2, keep))
        }
      }
    }
  }

  override def commitStagedChanges(): Unit = () // the publish pointer was the commit
  override def abortStagedChanges(): Unit = () // publish is atomic; nothing partial leaks
}
