package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.catalog.{StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
                             logLayout: Boolean) extends WriteBuilder {
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: DataFrame, overwrite: Boolean): Unit = {
        if (overwrite) throw new UnsupportedOperationException(
          s"esdb store at $logicalPath is append-only: rewrites go through " +
            "EsdbWriter.write/compact under Publish.publish (snapshot-isolated " +
            "versioned replace), not INSERT OVERWRITE")
        if (logLayout) graft.engine.EsdbWriter.appendLog(data, logicalPath)
        else {
          val indexAttrs = tableSchema.fieldNames.toSeq
            .filter(_.startsWith("idx_")).map(_.stripPrefix("idx_"))
          graft.engine.EsdbWriter.append(data, logicalPath, indexAttrs)
        }
      }
    }
  }
}

/** CTAS/RTAS target: `CREATE TABLE esdb.ns.t AS SELECT …` (and
  * `[CREATE OR] REPLACE TABLE … AS SELECT`) IS "creation by writing" —
  * the one way a store may legally come into existence, since the
  * writer establishes the layout invariants a bare DDL cannot (which
  * is why the catalog still rejects plain `CREATE TABLE`).
  *
  * Layout is steered by TBLPROPERTIES:
  *  - `layout`       — `store` (bucketed, default) or `log` (flat
  *    id-ordered stream layout);
  *  - `indexAttrs`   — comma-separated payload attrs materialized as
  *    bloom-filtered `idx_*` columns (space_writer.go:47-49);
  *  - `subparts`     — hot-space subpartition count, fixed for the
  *    store's lifetime;
  *  - `keepVersions` — publish retention for REPLACE (≥2 keeps the
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
          Option(opts.get("layout")).getOrElse("store") match {
            case "store" =>
              graft.engine.Publish.publish(conf, logicalPath, keep) { tmp =>
                graft.engine.EsdbWriter.write(data, tmp, indexAttrs, subparts)
              }: Unit
            case "log" =>
              require(indexAttrs.isEmpty && subparts == 1,
                "layout=log takes no indexAttrs/subparts (flat id-ordered stream layout)")
              graft.engine.Publish.publish(conf, logicalPath, keep) { tmp =>
                graft.engine.EsdbWriter.writeLog(data, tmp)
              }: Unit
            case other => throw new IllegalArgumentException(
              s"unknown layout '$other' — store (bucketed) or log (flat stream)")
          }
        }
      }
    }
  }

  override def commitStagedChanges(): Unit = () // the publish pointer was the commit
  override def abortStagedChanges(): Unit = () // publish is atomic; nothing partial leaks
}
