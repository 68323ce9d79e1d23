package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Queries are forced via
  * `queryExecution.toRdd.count()` — unlike `df.count()`, this executes
  * the query's own optimized plan (a count() wrapper would let Catalyst
  * eliminate top-level sorts and under-measure).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup: run EVERY query once at the smallest SF so the
    // timed runs measure the engine, not first-call JIT + classload +
    // janino compilation of each query's generated code (the warmup set
    // is ~1% of the timed SF, so this costs seconds and removes the
    // dominant cold-start noise from per-query numbers).
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getAbsolutePath else sfDir
    }
    var warmFailures = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).queryExecution.toRdd.count()
      catch { case _: Throwable => warmFailures += 1 }
    }
    if (warmFailures == SparkEntry.queries.size)
      System.err.println(s"[bench] WARMUP NEVER RAN ($warmDir unusable) — timed runs include cold JIT")
    graft.ops.Caches.clear()
    // best-of-2 per query: the second run reuses JIT'd codegen classes
    // and the OS page cache, which is the steady-state a long-lived
    // cluster sees; the min damps local-mode scheduler noise.
    // a run that throws contributes NO time (a query failing in
    // milliseconds must not masquerade as a fast one); queries with no
    // successful run report -1 and are listed under "failed"
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).queryExecution.toRdd.count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => None }
      }
      graft.ops.Caches.clear() // release operator-persisted frames between queries
      name -> times
    }
    val failed = results.collect { case (name, ts) if ts.isEmpty => name }
    val qs = results.map { case (k, ts) => "\"" + k + "\":" + ts.minOption.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // any failure makes the headline incomparable-by-construction:
    // a broken slow query must not read as a round-over-round speedup
    val total = if (failed.nonEmpty) -1.0 else results.flatMap(_._2.minOption).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // defensive self-report: sbt prefixes stdout with [info], which can
    // defeat line-oriented JSON parsing downstream — the same line lands
    // unprefixed in a well-known file
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SELF.json"), line + "\n")
    catch { case _: Exception => () }
    spark.stop()
  }
}
