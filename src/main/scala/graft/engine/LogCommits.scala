package graft.engine

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Exactly-once visibility protocol for STREAMING appends to a log
  * store — the commit layer under [[graft.streaming.StreamIngest.sinkLog]].
  *
  * The reference's `Stream.Write` appends records to a flat file whose
  * write offset is the commit point (stream/open_stream.go:77-105): a
  * torn write past the last fsync'd offset is invisible to readers. A
  * distributed micro-batch sink has no single write offset, so the same
  * guarantee is rebuilt from immutable objects, exactly as the batch
  * [[Publish]] protocol does for whole-store swaps:
  *
  *  - each micro-batch's files land in the data root under the
  *    recognizable name `stream-<epoch>-<k>.parquet`;
  *  - a batch becomes VISIBLE only when its marker object
  *    `_STREAM_COMMITS/<epoch>.commit` exists — every reader listing
  *    (batch scan, micro-batch source, manifest refresh) filters
  *    stream-batch files through [[visibleDataFiles]];
  *  - the marker is one small immutable object created after all the
  *    batch's data files are durable (local/HDFS: temp + single-file
  *    no-overwrite rename; S3-class: a single PUT) — atomic everywhere,
  *    no directory rename anywhere in the protocol.
  *
  * Crash anywhere before the marker leaves only invisible garbage; the
  * replayed epoch (Structured Streaming re-runs the failed batch with
  * the SAME epoch id from its checkpoint) sweeps it and rewrites. A
  * replay of an epoch whose marker exists is a no-op — the batch is
  * already durable — which is what makes the end-to-end pipeline
  * exactly-once rather than at-least-once.
  */
object LogCommits {

  /** Sidecar directory holding one `<epoch>.commit` marker per
    * committed streaming batch; `_`-prefixed so Spark's parquet
    * discovery and the log reader's listings never see it as data.
    */
  val Dir = "_STREAM_COMMITS"

  private val StreamFile = "^stream-(\\d+)-.*".r

  /** The streaming epoch a data file belongs to, if it is a
    * stream-batch file at all (plain batch-append files are not).
    */
  def epochOf(name: String): Option[Long] = name match {
    case StreamFile(e) => scala.util.Try(e.toLong).toOption
    case _ => None
  }

  /** Epochs with a durable commit marker. One listStatus of the
    * sidecar — O(committed batches), driver-side, once per planning.
    */
  def committedEpochs(fs: FileSystem, root: Path): Set[Long] = {
    val d = new Path(root, Dir)
    if (!fs.exists(d)) return Set.empty
    fs.listStatus(d).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".commit"))
        scala.util.Try(n.stripSuffix(".commit").toLong).toOption
      else None
    }.toSet
  }

  /** Data files currently visible in a log data root: non-sidecar,
    * non-empty plain files, MINUS stream-batch files whose epoch has no
    * commit marker (in-flight or crashed streaming appends). This is
    * the single listing rule shared by the batch scan, the micro-batch
    * source, and the manifest refresh — one filesystem listing plus one
    * sidecar listing per call.
    */
  def visibleDataFiles(fs: FileSystem, root: Path): Seq[FileStatus] = {
    if (!fs.exists(root)) return Seq.empty
    val physical = fs.listStatus(root).toSeq.filter { f =>
      val n = f.getPath.getName
      f.isFile && f.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
    }
    // manifest-carried files resolve to their physical hosts; names are
    // preserved by carry, so the epoch-commit filter below still applies.
    // One manifest read, reusing the listing above (no second walk).
    val files = {
      val manifest = Carry.readManifest(fs, root)
      if (manifest.isEmpty) physical
      else {
        // same LOUD drift rule as every other resolved listing
        Carry.assertNoShadow(physical.map(_.getPath.getName), manifest, root)
        val wanted = manifest.filter { case (rel, _) => !rel.contains('/') }
        physical ++ Carry.resolveCarried(fs, root, wanted).map(_._2)
      }
    }
    // the sidecar is listed only when stream-batch files are present,
    // so pure batch-written logs pay nothing for the protocol
    if (files.exists(f => epochOf(f.getPath.getName).isDefined)) {
      val committed = committedEpochs(fs, root)
      files.filter(f => epochOf(f.getPath.getName).forall(committed.contains))
    } else files
  }
}
