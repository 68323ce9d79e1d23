package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, StagedTable, StagingTableCatalog, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.engine.{EsdbWriter, Publish}

/** SQL catalog over a directory tree of engine-written stores: register
  * with
  * {{{
  * spark.sql.catalog.esdb      = graft.sources.EsdbCatalog
  * spark.sql.catalog.esdb.root = /data/stores
  * }}}
  * and every store published under the root is a plain SQL table —
  * `SELECT ... FROM esdb.payments`, `SHOW TABLES IN esdb`,
  * `FROM esdb.payments VERSION AS OF 3` — no DataFrame code required.
  * This is the piece that lets a reference user's ad-hoc SQL tooling
  * see stores the way `esdb.Open` does (esdb.go:23-38): the directory
  * IS the catalog state, so there is no metastore to run or to drift —
  * exactly the reference's files-are-the-database stance, lifted to
  * Spark's catalog plugin surface.
  *
  * Semantics:
  *  - a TABLE is any directory under the root holding a committed
  *    publish version or legacy direct-layout data; subdirectories in
  *    between are NAMESPACES (`esdb.prod.payments` ≡
  *    `<root>/prod/payments`);
  *  - layout is auto-detected per table: a log-layout store (flat
  *    `_MANIFEST.log` dual of the reference's stream file) binds to
  *    [[EsdbLogTable]], a bucketed store to [[EsdbStoreTable]] — both
  *    keep their full pushdown/ordering contracts, so SQL text gets
  *    the same Sort-free ordered plans as the DataFrame surface;
  *  - `VERSION AS OF v` resolves through [[Publish.resolveAt]]: reads
  *    pin the retained snapshot and fail loudly when `v` is retired,
  *    never silently serving different data;
  *  - tables are CREATED by writing ([[EsdbWriter.write]]/`writeLog` +
  *    [[Publish.publish]]) — `CREATE TABLE` is rejected because a bare
  *    DDL statement cannot establish the layout invariants (ts-desc
  *    clustering, manifests, blooms) that make a store a store;
  *    `DROP TABLE` deletes the store directory.
  *
  * Catalog calls resolve against the live filesystem on every
  * invocation (the listing memoization in the scan layer still
  * applies per query): correctness over staleness, and at catalog
  * frequency — human-issued DDL/SQL — listing cost is irrelevant.
  */
class EsdbCatalog extends TableCatalog with SupportsNamespaces with StagingTableCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _
  private var root: String = _

  private def conf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root=<stores dir>"))
  }

  override def name(): String = catalogName

  private def dirFor(parts: Seq[String]): String =
    (root +: parts).mkString("/")

  private def tablePath(ident: Identifier): String =
    dirFor(ident.namespace.toSeq :+ ident.name)

  /** A directory is a table iff it holds a committed publish version
    * or direct store-layout markers (partition dirs, parquet files, a
    * write's `_SUCCESS`/manifest sidecars). A namespace directory whose
    * children are tables has none of these at its own level, so
    * namespaces and tables never collide.
    */
  private def isTable(dir: String): Boolean = EsdbCatalog.isTableDir(conf, dir)

  private def isDir(dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  /** Child directories that are neither publish machinery nor data
    * files — namespace candidates and table roots.
    */
  private def childDirs(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = dirFor(namespace.toSeq)
    if (!isDir(ns)) throw new NoSuchNamespaceException(catalogName +: namespace)
    childDirs(ns).filter(n => isTable(s"$ns/$n"))
      .sorted.map(Identifier.of(namespace, _)).toArray
  }

  /** Bind the resolved data root to the layout-matching table. Version
    * resolution happens HERE, at load time, so one SQL statement reads
    * one snapshot even across a concurrent compact's publish (same
    * contract as the path-based sources).
    */
  private def bind(logical: String, resolved: String,
                   writable: Boolean = false): Table = {
    val isLog = {
      val m = new Path(resolved, EsdbWriter.LogManifest)
      m.getFileSystem(conf).exists(m)
    }
    // writes always target the LOGICAL root (the append path re-resolves
    // the live version itself); a version-pinned load is read-only
    val wp = if (writable) Some(logical) else None
    if (isLog) new EsdbLogTable(resolved, EsdbLogSource.canonicalSchema(resolved), wp)
    else new EsdbStoreTable(resolved, EsdbStoreSource.canonicalSchema(resolved), wp)
  }

  /** Maintenance lifecycle as SQL: `CALL cat.system.compact(table =>
    * 't')` etc. — see [[EsdbProcedures]].
    */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      EsdbProcedures.names.map(Identifier.of(Array("system"), _)).toArray
    else Array.empty

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (ident.namespace.toSeq != Seq("system") ||
        !EsdbProcedures.names.contains(ident.name))
      throw new UnsupportedOperationException(
        s"unknown procedure $ident; available: system.${EsdbProcedures.names.mkString(", system.")}")
    EsdbProcedures.load(ident.name, root, () => conf)
  }

  override def loadTable(ident: Identifier): Table = {
    val logical = tablePath(ident)
    if (!isTable(logical)) {
      // metadata tables: `SELECT * FROM cat.t.versions|files|groupings|
      // tails` — the identifier's namespace tail is the TABLE, its name
      // the metadata view (namespaces and tables never collide, so a
      // real table can't shadow these)
      if (ident.namespace.nonEmpty && EsdbMetaTables.names.contains(ident.name.toLowerCase)) {
        val parent = dirFor(ident.namespace.toSeq)
        if (isTable(parent))
          return EsdbMetaTables.load(parent, ident.name.toLowerCase, conf)
      }
      throw new NoSuchTableException(ident)
    }
    bind(logical, Publish.resolve(conf, logical), writable = true)
  }

  /** `FOR VERSION AS OF v` — pin a committed publish version. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val logical = tablePath(ident)
    if (!isTable(logical)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"esdb versions are integers (got '$version'); " +
          s"see committed versions via Publish.committedVersions")
    }
    bind(logical, Publish.resolveAt(conf, logical, v))
  }

  /** `FOR TIMESTAMP AS OF t` — the newest version committed at or
    * before `t` (Spark hands the instant in MICROseconds).
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val logical = tablePath(ident)
    if (!isTable(logical)) throw new NoSuchTableException(ident)
    bind(logical, Publish.resolveAtTime(conf, logical, timestamp))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(tablePath(ident))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "esdb stores are created by writing (EsdbWriter.write/writeLog under " +
        "Publish.publish), which establishes the clustering, manifests, and " +
        "bloom filters a bare CREATE TABLE cannot; use CREATE TABLE ... AS " +
        s"SELECT (creation by writing), or write to ${tablePath(ident)} directly")

  // ---- CTAS/RTAS: the SQL form of "stores are created by writing" --------

  /** CREATE TABLE ... AS SELECT — unlike bare CREATE TABLE, the query
    * result flows through the engine writer, which establishes every
    * layout invariant; see [[EsdbStagedTable]] for the TBLPROPERTIES
    * (layout/indexAttrs/subparts/keepVersions) and the commit protocol.
    */
  override def stageCreate(ident: Identifier,
                           info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    staged(ident, info)
  }

  /** REPLACE TABLE ... AS SELECT — a versioned publish over the existing
    * store: readers pinned to the replaced snapshot keep it while the
    * retention window (`keepVersions` ≥ 2) holds.
    */
  override def stageReplace(ident: Identifier,
                            info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    staged(ident, info)
  }

  override def stageCreateOrReplace(ident: Identifier,
                                    info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable =
    staged(ident, info)

  /** Fail-fast schema contract: the canonical event-frame columns must
    * be present with their layout types before any data moves (the
    * writer sorts/partitions on them; a late failure would burn the
    * whole SELECT's work).
    */
  private def staged(ident: Identifier,
                     info: org.apache.spark.sql.connector.catalog.TableInfo): StagedTable = {
    val schema = info.schema()
    def req(n: String, t: org.apache.spark.sql.types.DataType): Unit = {
      val f = schema.fields.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"esdb CTAS requires canonical column $n (event frame: space, grouping, ts_us, event_id)"))
      require(f.dataType == t,
        s"esdb CTAS column $n must be $t, got ${f.dataType} — cast in the SELECT")
    }
    req("space", org.apache.spark.sql.types.StringType)
    req("grouping", org.apache.spark.sql.types.StringType)
    req("ts_us", org.apache.spark.sql.types.LongType)
    req("event_id", org.apache.spark.sql.types.LongType)
    new EsdbStagedTable(tablePath(ident), schema, info.properties())
  }

  /** Additive schema evolution as DDL: `ALTER TABLE t ADD COLUMN c T`
    * is a SIDECAR-ONLY update (the files are immutable — existing rows
    * read null for the new column; future appends may fill it). Only
    * top-level nullable no-default adds are expressible this way;
    * everything else keeps the written-layout refusal.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val logical = tablePath(ident)
    if (!isTable(logical)) throw new NoSuchTableException(ident)
    val adds = scala.collection.mutable.ArrayBuffer[StructField]()
    val widens = scala.collection.mutable.ArrayBuffer[(String, org.apache.spark.sql.types.DataType)]()
    val renames = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val drops = scala.collection.mutable.ArrayBuffer[String]()
    changes.foreach {
      case a: TableChange.AddColumn if a.fieldNames.length == 1 && a.isNullable &&
        a.defaultValue == null && a.position == null =>
        adds += StructField(a.fieldNames.head, a.dataType, nullable = true)
      case a: TableChange.AddColumn => throw new UnsupportedOperationException(
        "esdb ADD COLUMN is metadata-only (files are immutable): the column must " +
          "be top-level and nullable, with no default and no position — got " + a.fieldNames.mkString("."))
      // proactive type widening (ALTER COLUMN c TYPE BIGINT): sidecar-
      // only, readers up-cast old files at scan time — same machinery
      // an appended wider batch triggers
      case u: TableChange.UpdateColumnType if u.fieldNames.length == 1 =>
        widens += (u.fieldNames.head -> u.newDataType)
      // metadata-only rename/drop ride the field-ID machinery
      // (EsdbWriter.renameColumn/dropColumn): the sidecar field keeps
      // its parquet field ID, so old files resolve by ID untouched
      case r: TableChange.RenameColumn if r.fieldNames.length == 1 =>
        renames += (r.fieldNames.head -> r.newName)
      case d: TableChange.DeleteColumn if d.fieldNames.length == 1 =>
        drops += d.fieldNames.head
      // ALTER TABLE t SET TBLPROPERTIES ('cdc'='true'|'false'): toggle
      // the _CDC marker — whether INSERT INTO commits its own version
      // (immediately change-feed-visible) or appends in place
      case sp: TableChange.SetProperty if sp.property.equalsIgnoreCase("cdc") =>
        // re-enabling keeps a previously recorded retention; a fresh
        // enable records the default (declare a _POLICY for more)
        val keep = EsdbWriter.cdcKeepVersions(conf, logical).getOrElse(2)
        EsdbWriter.setCdc(conf, logical, EsdbWriter.parseCdcFlag(sp.value),
          keepVersions = keep)
      case rp: TableChange.RemoveProperty if rp.property.equalsIgnoreCase("cdc") =>
        EsdbWriter.setCdc(conf, logical, enabled = false)
      case other => throw new UnsupportedOperationException(
        s"esdb store schemas are fixed by their written layout; $other is not " +
          "expressible as a metadata-only change (rewrite via EsdbWriter + Publish.publish)")
    }
    val resolved = Publish.resolve(conf, logical)
    // the sidecar is the one holder of the merged logical schema; a
    // legacy store gets one seeded from inference before the add
    val base = EsdbWriter.schemaManifest(conf, resolved).getOrElse {
      val isLog = {
        val m = new Path(resolved, EsdbWriter.LogManifest)
        m.getFileSystem(conf).exists(m)
      }
      if (isLog) EsdbLogSource.canonicalSchema(resolved)
      else EsdbStoreSource.canonicalSchema(resolved)
    }
    val widened = widens.foldLeft(base) { case (cur, (name, to)) =>
      val f = cur.fields.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no such column '$name' in ${ident.name}"))
      if (!EsdbWriter.widenType(f.dataType, to).contains(to))
        throw new UnsupportedOperationException(
          s"ALTER COLUMN '$name' ${f.dataType.simpleString} -> ${to.simpleString}: only " +
            "lossless widenings (int->long, float->double) are metadata-only; anything " +
            "else would corrupt already-written files")
      StructType(cur.map(g => if (g.name == name) g.copy(dataType = to) else g))
    }
    // adds on an ID-ed store allocate fresh field IDs (above the
    // tombstone-inclusive max) so the new column is rename/drop-capable
    val addsAligned =
      if (graft.engine.FieldIds.hasIds(widened))
        graft.engine.FieldIds.align(StructType(adds.toSeq), widened)
      else StructType(adds.toSeq)
    EsdbWriter.writeSchemaManifest(conf, resolved,
      EsdbWriter.unionSchemas(widened, addsAligned))
    val spark = org.apache.spark.sql.SparkSession.active
    renames.foreach { case (from, to) => EsdbWriter.renameColumn(spark, logical, from, to) }
    drops.foreach(name => EsdbWriter.dropColumn(spark, logical, name))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    if (!isTable(dir)) return false
    val p = new Path(dir)
    p.getFileSystem(conf).delete(p, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = tablePath(from)
    if (!isTable(src)) throw new NoSuchTableException(from)
    val dst = new Path(tablePath(to))
    val fs = dst.getFileSystem(conf)
    if (fs.exists(dst))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(to)
    fs.mkdirs(dst.getParent) // cross-namespace rename: ensure the target namespace dir
    if (!fs.rename(new Path(src), dst))
      throw new IllegalStateException(s"rename $src -> $dst failed")
  }

  // ---- namespaces: directories between the root and table roots ----------

  override def listNamespaces(): Array[Array[String]] =
    childDirs(root).filterNot(n => isTable(s"$root/$n"))
      .sorted.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val ns = dirFor(namespace.toSeq)
    if (!isDir(ns)) throw new NoSuchNamespaceException(catalogName +: namespace)
    childDirs(ns).filterNot(n => isTable(s"$ns/$n"))
      .sorted.map(n => namespace :+ n).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val dir = dirFor(namespace.toSeq)
      isDir(dir) && !isTable(dir)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    val p = new Path(dirFor(namespace.toSeq))
    p.getFileSystem(conf).mkdirs(p): Unit
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("esdb namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = dirFor(namespace.toSeq)
    if (!namespaceExists(namespace)) return false
    if (!cascade && (childDirs(dir).nonEmpty || isTable(dir)))
      throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
        catalogName +: namespace)
    val p = new Path(dir)
    p.getFileSystem(conf).delete(p, true)
  }
}

object EsdbCatalog {

  /** The table-vs-namespace test, shared with the procedure surface
    * (`maintain_all` walks the catalog root with it).
    */
  private[sources] def isTableDir(conf: org.apache.hadoop.conf.Configuration,
                                  dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) return false
    if (Publish.currentVersion(conf, dir).isDefined) return true
    fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      (s.isFile && (n.endsWith(".parquet") || n == "_SUCCESS" || n.startsWith("_MANIFEST"))) ||
        (s.isDirectory && n.contains("="))
    }
  }

  /** Every table under the catalog root, as identifier PARTS in
    * deterministic (sorted) order — the `maintain_all` sweep list.
    * Parts, not dotted strings: a directory name may itself contain a
    * '.', and round-tripping through a dotted identifier would resolve
    * the wrong path and silently skip the store. Namespace dirs
    * recurse; table dirs do not (store-internal dirs like `space=X`
    * or `_versions` are below them, never tables).
    */
  private[sources] def allTables(conf: org.apache.hadoop.conf.Configuration,
                                 root: String): Seq[Seq[String]] = {
    def childDirs(dir: String): Seq[String] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return Seq.empty
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
        .map(_.getPath.getName)
    }
    def walk(dir: String, prefix: Seq[String]): Seq[Seq[String]] =
      childDirs(dir).sorted.flatMap { n =>
        val full = s"$dir/$n"
        if (isTableDir(conf, full)) Seq(prefix :+ n)
        else walk(full, prefix :+ n)
      }
    walk(root, Nil)
  }
}
