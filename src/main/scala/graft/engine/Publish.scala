package graft.engine

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-store-safe publish protocol: a version-pointer commit in place
  * of directory rename-swaps. S3-class stores have no atomic rename (a
  * "rename" is a non-atomic copy+delete per object), so any protocol
  * whose commit point is a directory rename can expose half-copied
  * stores to readers. Here the commit point is the creation of ONE new,
  * immutable, never-rewritten pointer object — atomic on every store
  * (local/HDFS: temp + single-file rename; S3-class: a single PUT that
  * becomes visible all-or-nothing on close).
  *
  * Layout under a logical store root:
  * {{{
  *   root/_ptr/<N>.ptr          one line: the data dir name (immutable)
  *   root/_versions/<N>-<uuid>/ a complete, self-contained data root
  * }}}
  * Readers resolve root → `_versions/<dir>` named by the HIGHEST-N
  * pointer; with no pointer the root itself is the data root (legacy
  * direct layout — every store starts this way, and first publish
  * upgrades it in place). A crash anywhere before the pointer write
  * leaves only unreferenced garbage: readers keep seeing the previous
  * version. Superseded data is deleted only AFTER the pointer commits,
  * so no reader window ever observes a partial store.
  *
  * Single-writer, like the reference's O_EXCL create (writer.go:27):
  * concurrent publishers race benignly on distinct uuid-suffixed dirs,
  * and the highest committed pointer wins. The `_`-prefixed dir names
  * keep both sidecars invisible to Spark's parquet discovery, so a
  * legacy data root stays readable while its first version is staged.
  */
object Publish {

  val PtrDir = "_ptr"
  val VersionsDir = "_versions"

  /** Highest committed (version, dataDirName), or None when the root
    * has no pointer (legacy direct layout or nothing written yet).
    */
  def currentVersion(conf: Configuration, root: String): Option[(Long, String)] = {
    val ptr = new Path(root, PtrDir)
    val fs = ptr.getFileSystem(conf)
    if (!fs.exists(ptr)) return None
    val ptrs = fs.listStatus(ptr).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".ptr"))
      .flatMap { s =>
        val n = s.getPath.getName.stripSuffix(".ptr")
        scala.util.Try(n.toLong).toOption.map(v => (v, s.getPath))
      }
    if (ptrs.isEmpty) None
    else {
      val (v, p) = ptrs.maxBy(_._1)
      val in = fs.open(p)
      val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                 finally in.close()
      Some((v, name))
    }
  }

  /** Resolve a logical store path to its current data root. */
  def resolve(conf: Configuration, root: String): String =
    currentVersion(conf, root)
      .map { case (_, dir) => s"$root/$VersionsDir/$dir" }
      .getOrElse(root)

  /** True when the root has at least one committed version OR legacy
    * direct-layout data (any non-sidecar entry).
    */
  def hasData(conf: Configuration, root: String): Boolean = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return false
    if (currentVersion(conf, root).isDefined) return true
    fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      n != PtrDir && n != VersionsDir && !n.startsWith(".")
    }
  }

  /** Stage-then-commit: `write` fills a fresh versioned data dir; the
    * pointer object is created only after it returns, and superseded
    * data (the previous version dir, or the legacy direct layout's
    * `space=*`/manifest entries) plus any orphaned staging dirs are
    * removed only after the pointer is durable. Returns the new data
    * root. Seal markers (`_CLOSED*`) always live at the logical root
    * and survive publishes.
    */
  def publish(conf: Configuration, root: String)(write: String => Unit): String = {
    val cur = currentVersion(conf, root)
    val next = cur.map(_._1 + 1).getOrElse(1L)
    val dirName = s"$next-" + java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$root/$VersionsDir/$dirName"
    write(dataDir)

    val ptrDir = new Path(root, PtrDir)
    val fs = ptrDir.getFileSystem(conf)
    fs.mkdirs(ptrDir)
    // commit point: one small immutable object. Local/HDFS: write a
    // hidden temp then a single-FILE rename (atomic). S3-class stores
    // would PUT the final object directly; the temp+rename of one small
    // object degrades to copy+delete there, still all-or-nothing for
    // the destination's visibility.
    val tmp = new Path(ptrDir, s".tmp-$next-" + java.util.UUID.randomUUID().toString.take(8))
    val out = fs.create(tmp, true)
    try out.write(dirName.getBytes("UTF-8")) finally out.close()
    val ptrPath = new Path(ptrDir, s"$next.ptr")
    // FileSystem.rename on the local FS delegates to File.renameTo,
    // which OVERWRITES an existing destination on POSIX — two racing
    // publishers would both "commit" and then sweep each other's data.
    // FileContext.rename without Options.Rename.OVERWRITE refuses an
    // existing destination (atomically on HDFS; checked on the local
    // FS), so the loser surfaces the conflict instead of corrupting.
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(ptrPath.toUri, conf)
        .rename(tmp, ptrPath)
    } catch {
      case e: Exception =>
        fs.delete(tmp, false)
        // a concurrent publisher committed this version first; our
        // staged data is garbage — remove it and surface the conflict
        fs.delete(new Path(dataDir), true)
        throw new java.io.IOException(
          s"publish conflict: version $next already committed at $root", e)
    }

    // post-commit retirement (failure here is harmless: readers follow
    // the pointer; leftovers are re-swept by the next publish). NOTE:
    // retirement is immediate — right for a single-writer store with
    // bounded scans (this engine's contract, like the reference's
    // write-once files); a production deployment with long-running
    // concurrent readers would apply a retention window before deleting
    // superseded versions, exactly as snapshot-based table formats do.
    val rootPath = new Path(root)
    cur match {
      case Some(_) => () // previous version dir swept below
      case None => // legacy direct layout now shadowed by version 1
        if (fs.exists(rootPath)) fs.listStatus(rootPath).foreach { s =>
          val n = s.getPath.getName
          val shadowed = n.startsWith("space=") || n == EsdbWriter.GroupingsManifest ||
            n == "_SUCCESS" || n == "assigned" || n == "centroids"
          if (shadowed) fs.delete(s.getPath, true): Unit
        }
    }
    val versions = new Path(root, VersionsDir)
    if (fs.exists(versions)) fs.listStatus(versions).foreach { s =>
      val n = s.getPath.getName
      // sweep superseded versions and crashed-publish orphans at or
      // below our version; never a (hypothetical) newer publisher's
      // in-flight staging dir
      val v = scala.util.Try(n.takeWhile(_.isDigit).toLong).toOption
      if (n != dirName && v.exists(_ <= next)) fs.delete(s.getPath, true): Unit
    }
    dataDir
  }
}
