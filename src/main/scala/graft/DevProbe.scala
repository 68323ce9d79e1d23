package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch measurement probe for the r16 optimization round — times
  * individual pipeline substages. Dev-only; not part of any contract.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.primePageCache(sfDir)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-44s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

    // stream_log_replay dissection: where do the ~0.7s outside the
    // micro-batch trigger go?
    val key = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val p = s"${System.getProperty("java.io.tmpdir")}/graft-logstore/$key"
    // fixture exists from prior bench runs; if not, build via the query
    if (graft.engine.Publish.currentVersion(spark.sparkContext.hadoopConfiguration, p).isEmpty) {
      println("[probe] building log store fixture first")
      force(SparkEntry.queries("stream_log_replay")(spark, sfDir))
    }

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val s = time("newSession + tune")({
        val s = spark.newSession()
        graft.engine.GraftSession.tune(s)
        s
      })
      val ck = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe-ck")
      s.conf.set("spark.sql.streaming.checkpointLocation", ck.toString)
      val src = time("readLogStream (source construction)")(
        graft.engine.EsdbWriter.readLogStream(s, p, parallel = true))
      val qname = "probe_drain_" + round
      val q = time("writeStream.start")(
        src.writeStream.format("memory").queryName(qname)
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start())
      time("awaitTermination")(q.awaitTermination())
      val out = s.table(qname).orderBy("event_id")
      time("materialize result (sort 10k memory rows)")(force(out))
      time("full drainLog again (steady)")(
        force(graft.streaming.StreamIngest.drainLog(spark, p)))
    }
    spark.stop()
  }
}
