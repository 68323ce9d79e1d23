package graft.engine

import org.apache.spark.sql.SparkSession

/** Policy-driven store maintenance — the operational autopilot over the
  * primitives the engine already has: time retention
  * ([[EsdbWriter.deleteOlderThan]], ts-manifest-priced), fragmentation
  * repair ([[EsdbWriter.compactIncremental]], rewrites only fragmented
  * spaces), and retired-version sweeping ([[Publish.vacuum]]). A policy
  * is declared ONCE on the store (a `_POLICY` marker beside the seal
  * marker — it survives every versioned publish) and `maintain` applies
  * it idempotently: a second run against an already-conforming store
  * commits nothing (every primitive is a stats/manifest-proven no-op),
  * so a scheduler can call it blindly on every store it knows.
  *
  * The reference's analog is operational too: `.esdb` files are
  * write-once and replaced wholesale (README.md:30-36); retention there
  * is "stop shipping the old file". A mutable store needs the policy
  * spelled out — this is where it lives.
  */
object Maintenance {

  val PolicyMarker = "_POLICY"

  /** What `maintain` enforces. All knobs optional: an absent knob means
    * "leave that dimension alone".
    *
    * @param retentionUs       events older than (now − retentionUs) are
    *                          deleted (ts-manifest-priced; straddling
    *                          files rewrite, expired files just drop)
    * @param maxFilesPerSpace  spaces fragmented past this many files
    *                          re-compact (the rest carry)
    * @param keepVersions      publish retention for the maintenance
    *                          commits AND the vacuum floor
    * @param reclusterOverlapX100  re-cluster (full compaction) when any
    *                          declared cluster column's overlap factor
    *                          ([[ClusterHealth]]: expected files opened
    *                          per point lookup) exceeds this/100 —
    *                          e.g. 300 = repair once lookups open 3×
    *                          the files a fresh clustering would
    */
  final case class Policy(retentionUs: Option[Long] = None,
                          maxFilesPerSpace: Option[Int] = None,
                          keepVersions: Int = 2,
                          reclusterOverlapX100: Option[Long] = None) {
    require(retentionUs.forall(_ > 0), s"retentionUs must be positive: $retentionUs")
    require(maxFilesPerSpace.forall(_ >= 1), s"maxFilesPerSpace must be >= 1")
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    require(reclusterOverlapX100.forall(_ > 100),
      s"reclusterOverlapX100 must be > 100 (1.0× is a fresh clustering): $reclusterOverlapX100")
  }

  def setPolicy(conf: org.apache.hadoop.conf.Configuration, path: String,
                policy: Policy): Unit = {
    val m = new org.apache.hadoop.fs.Path(path, PolicyMarker)
    val out = m.getFileSystem(conf).create(m, true)
    val txt = Seq(
      policy.retentionUs.map(r => s"retention_us=$r"),
      policy.maxFilesPerSpace.map(f => s"max_files_per_space=$f"),
      Some(s"keep_versions=${policy.keepVersions}"),
      policy.reclusterOverlapX100.map(o => s"recluster_overlap_x100=$o")).flatten.mkString("\n")
    try out.write(txt.getBytes("UTF-8")) finally out.close()
  }

  def clearPolicy(conf: org.apache.hadoop.conf.Configuration, path: String): Unit = {
    val m = new org.apache.hadoop.fs.Path(path, PolicyMarker)
    val fs = m.getFileSystem(conf)
    if (fs.exists(m)) fs.delete(m, false): Unit
  }

  /** The declared policy, or None for an unmanaged store. A corrupt
    * marker throws (like the cluster marker): silently skipping
    * maintenance would let retention quietly stop being enforced.
    */
  def policyOf(conf: org.apache.hadoop.conf.Configuration,
               path: String): Option[Policy] = {
    val m = new org.apache.hadoop.fs.Path(path, PolicyMarker)
    val fs = m.getFileSystem(conf)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val txt = try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
      finally in.close()
      val kv = txt.split("\n").map(_.trim).filter(_.nonEmpty).map { line =>
        line.split("=", 2) match {
          case Array(k, v) if v.trim.nonEmpty && v.trim.forall(_.isDigit) =>
            k.trim -> v.trim.toLong
          case _ => throw new IllegalStateException(
            s"unparseable policy marker at $m: line '$line'")
        }
      }.toMap
      val known = Set("retention_us", "max_files_per_space", "keep_versions",
        "recluster_overlap_x100")
      val unknown = kv.keySet -- known
      if (unknown.nonEmpty) throw new IllegalStateException(
        s"unknown policy key(s) ${unknown.mkString(", ")} at $m")
      Some(Policy(
        retentionUs = kv.get("retention_us"),
        maxFilesPerSpace = kv.get("max_files_per_space").map(_.toInt),
        keepVersions = kv.getOrElse("keep_versions", 2L).toInt,
        reclusterOverlapX100 = kv.get("recluster_overlap_x100")))
    }
  }

  /** Apply the store's policy. Returns the actions that actually
    * changed something ("retention", "compaction", "vacuum") — empty
    * for an unmanaged or already-conforming store. `nowUs` pins the
    * clock for tests and for replaying a maintenance schedule.
    *
    * Layout-aware: an ordered store uses `deleteOlderThan` +
    * `compactIncremental`; a LOG store (detected by its `_MANIFEST.log`
    * sidecar) uses a stats-pruned ts predicate delete and `compactLog`
    * — there `maxFilesPerSpace` doubles as the log's target file count
    * (which is also its parallel-replay width).
    */
  def maintain(spark: SparkSession, path: String,
               nowUs: Option[Long] = None): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    policyOf(conf, path) match {
      case None => Nil
      case Some(p0) =>
        // the widest declared retention wins everywhere versions are
        // swept: a CDC-marked table records its own window (`_CDC`
        // marker), and maintenance must not vacuum feed history the
        // INSERT path is deliberately preserving
        val p = EsdbWriter.cdcKeepVersions(conf, path) match {
          case Some(cdcKeep) if cdcKeep > p0.keepVersions =>
            p0.copy(keepVersions = cdcKeep)
          case _ => p0
        }
        val actions = scala.collection.mutable.ArrayBuffer.empty[String]
        def version(): Long = Publish.currentVersionNumber(conf, path).getOrElse(0L)
        def root() = new org.apache.hadoop.fs.Path(EsdbWriter.dataRoot(spark, path))
        val fs = root().getFileSystem(conf)
        val isLog = fs.exists(
          new org.apache.hadoop.fs.Path(root(), EsdbWriter.LogManifest))
        p.retentionUs.foreach { r =>
          val now = nowUs.getOrElse(System.currentTimeMillis() * 1000L)
          val before = version()
          if (isLog) EsdbWriter.deleteWhereLog(spark, path,
            Seq(org.apache.spark.sql.sources.LessThan("ts_us", now - r)),
            keepVersions = p.keepVersions)
          else EsdbWriter.deleteOlderThan(spark, path, now - r,
            keepVersions = p.keepVersions)
          if (version() != before) actions += "retention"
        }
        p.maxFilesPerSpace.foreach { m =>
          val did =
            if (isLog) {
              val files = LogCommits.visibleDataFiles(fs, root()).size
              if (files > m) {
                EsdbWriter.compactLog(spark, path, numFiles = m, keepVersions = p.keepVersions)
                true
              } else false
            }
            else EsdbWriter.compactIncremental(spark, path, m, p.keepVersions)
          if (did) actions += "compaction"
        }
        // cluster-sharpness repair: per-batch range cuts drift under
        // appends ("drift costs sharpness, never correctness"), and
        // nothing else measures the accumulated per-file span overlap —
        // when a point lookup would open more than threshold× the files
        // a fresh clustering would, a full compaction re-draws the cuts
        // from the whole store. Skipped when fragmentation repair just
        // ran a rewrite this pass only if still past threshold (the
        // incremental rewrite may already have tightened enough).
        p.reclusterOverlapX100.foreach { th =>
          if (!isLog) {
            val worst = ClusterHealth.worstOverlap(spark, path)
            if (worst.exists(_ * 100.0 > th.toDouble)) {
              EsdbWriter.compact(spark, path, keepVersions = p.keepVersions)
              actions += "recluster"
            }
          }
        }
        if (Publish.committedVersions(conf, path).size > p.keepVersions) {
          Publish.vacuum(conf, path, keep = p.keepVersions)
          actions += "vacuum"
        }
        // Declared vector indexes (`_VECIDX` registry): every commit
        // above moves the corpus stamp, so re-run the build-if-stale
        // contract for each — a no-op on a fresh index, a rebuild after
        // retention/compaction. Without this the autopilot un-does ANN
        // probing (stale indexes refuse) until a human rebuilds.
        graft.ops.Ivf.registeredIndexes(conf, path).foreach { r =>
          val before = Publish.currentVersionNumber(conf, r.indexPath)
          graft.ops.Ivf.ensureIndexFor(spark, path, r.indexPath,
            nLists = r.nLists, seed = r.seed,
            recallTarget = Some(r.recallTarget).filter(_ > 0.0))(
            graft.ops.Ivf.payloadEmbedding(r.attr))
          if (Publish.currentVersionNumber(conf, r.indexPath) != before)
            actions += "index_refresh"
        }
        actions.toSeq
    }
  }
}
