package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r15 optimization round): time a NAMED SUBSET of the declared
  * queries with exactly the Bench methodology (same session confs, same
  * `queryExecution.toRdd.count()` action, JIT warmup at sf0.001, page-cache
  * prime, best-of-N), so a single operator can be iterated on without paying
  * a full 125-query run. This is measurement scaffolding only — the driver
  * contract lives in [[Bench]] and is unchanged.
  *
  * Usage: sbt "runMain graft.BenchSome [-nN] [-progress] query [query ...]"
  *   -nN        runs per query (default 3)
  *   -progress  print each streaming micro-batch's durationMs breakdown
  */
/** Prints each streaming micro-batch's duration breakdown; registered via
  * `spark.sql.streaming.streamingQueryListeners` so child sessions
  * (StreamIngest runs drains on `newSession()`) report too.
  */
class BenchProgressListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit =
    System.err.println(s"[progress] batch=${e.progress.batchId} durationMs=${e.progress.durationMs} " +
      s"stateOperators=${e.progress.stateOperators.map(o => s"(rows=${o.numRowsTotal} commitMs=${o.commitTimeMs})").mkString(",")}")
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
}

object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.collectFirst { case a if a.startsWith("-n") => a.drop(2).toInt }.getOrElse(3)
    val progress = args.contains("-progress")
    val names = args.filterNot(_.startsWith("-")).toSeq
    require(names.nonEmpty, "pass query names")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
    val spark = (if (progress)
      builder.config("spark.sql.streaming.streamingQueryListeners", "graft.BenchProgressListener")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getAbsolutePath else sfDir
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, warmDir).queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"[warm] $name failed: $e") }
    }
    graft.ops.Caches.clear()
    Bench.primePageCache(sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        graft.ops.Caches.clear()
        t
      }
      println(f"$name%-32s min=${times.min}%.3f runs=" + times.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
