package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reference `Writer.New → Add* → Flush* → Write` (writer.go:26-85):
  * an incremental builder for an immutable store. `add` buffers event
  * frames; `flush` spills everything buffered so far to a staging log
  * — the reference's `Flush` exists to bound builder memory during
  * long builds (writer.go:59-68), and the staging append plays that
  * exact role here; `write` freezes the accumulated batches into the
  * final immutable store (ErrorIfExists ≡ O_EXCL, writer.go:27) and
  * removes the staging directory. Further `add`/`write` calls error,
  * as re-Add after Write does in the reference (writer.go:44-46).
  */
final class EsdbBuilder private[engine] (spark: SparkSession, path: String,
                                         indexAttrs: Seq[String]) {

  private val staging = path + ".building"
  private var buffered: Vector[DataFrame] = Vector.empty
  private var written = false

  private def requireOpen(): Unit =
    require(!written, s"store at $path already written (reference: writer.go:44-46)")

  /** Buffer a batch of canonical events. */
  def add(ev: DataFrame): this.type = synchronized {
    requireOpen()
    buffered :+= ev
    this
  }

  /** Spill buffered batches to the staging log, releasing them from
    * builder memory — call between large adds, exactly like the
    * reference's `Flush`.
    */
  def flush(): this.type = synchronized {
    requireOpen()
    buffered.foreach { df =>
      if (new java.io.File(staging).isDirectory) EsdbWriter.append(df, staging, indexAttrs)
      else EsdbWriter.write(df, staging, indexAttrs)
    }
    buffered = Vector.empty
    this
  }

  /** Freeze everything added into the final immutable store. */
  def write(): Unit = synchronized {
    flush()
    require(new java.io.File(staging).isDirectory, "nothing added before write()")
    GraftSession.tune(spark)
    // full-width read: the final write re-sorts and re-partitions the
    // accumulated batches into the canonical immutable layout (one
    // sorted file set per space + manifest), like compaction
    EsdbWriter.write(spark.read.option("basePath", staging).parquet(staging), path)
    def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit }
    rm(new java.io.File(staging))
    written = true
  }
}

object EsdbBuilder {
  /** Reference `esdb.New(path)` (writer.go:26-39). */
  def create(spark: SparkSession, path: String, indexAttrs: Seq[String] = Nil): EsdbBuilder = {
    require(!new java.io.File(path).exists(),
      s"store at $path already exists (reference: O_EXCL create, writer.go:27)")
    new EsdbBuilder(spark, path, indexAttrs)
  }
}
