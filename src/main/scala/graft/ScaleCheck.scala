package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-evidence harness: replicate the sf0.1 tables 10× (ids
  * offset so keys stay unique and cardinalities scale with volume),
  * then time a representative query per operator family at 1× and 10×
  * and print the ratio. Linear-ish ratios are the point — they are the
  * local evidence that the plan shapes (pruned scans, partial aggs,
  * banded self-joins, broadcast dims) scale with data volume rather
  * than with some accidental quadratic.
  *
  * Usage: `sbt "runMain graft.ScaleCheck"` (writes under /tmp).
  */
object ScaleCheck {

  val Factor = 10

  private def replicate(df: DataFrame, idCols: Seq[String], out: String): Unit = {
    val maxes = idCols.map(c => c -> (df.agg(max(col(c))).head().getLong(0) + 1L)).toMap
    val copies = (0 until Factor).map { i =>
      idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * maxes(c))))
    }
    copies.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(out)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.engine.GraftExtensions")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigDir = "/tmp/graft_scale"
    if (args.contains("skew")) { skewCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("spjskew")) { spjSkewCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("bpe")) { bpeCheck(spark, sfDir); spark.stop(); return }
    if (args.contains("ordered")) { orderedCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("ingest")) { ingestCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("compaction")) { compactionCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("replay")) { replayCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("delete")) { deleteCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("mutation")) { mutationCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("lshcap")) { lshCapCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("rebucket")) { rebucketCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("drift")) { driftCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("recall")) { recallCheck(spark, sfDir, bigDir); spark.stop(); return }
    if (args.contains("carry")) { carryCheck(spark, sfDir, bigDir); spark.stop(); return }
    // user_id not offset: groupings keep their cardinality and grow in
    // length, the dominant real-world growth mode for an event store
    replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    replicate(engine.Tables.documents(spark, sfDir), Seq("doc_id"), s"$bigDir/documents.parquet")
    replicate(engine.Tables.embeddings(spark, sfDir), Seq("vec_id"), s"$bigDir/embeddings.parquet")
    replicate(engine.Tables.lineitem(spark, sfDir), Seq("l_orderkey"), s"$bigDir/lineitem.parquet")
    // dims referenced by replicated facts keep their original keys
    Seq("orders", "customer", "part", "supplier", "nation", "region").foreach { t =>
      engine.Tables.table(spark, sfDir, t)
        .write.mode(SaveMode.Overwrite).parquet(s"$bigDir/$t.parquet")
    }

    val families = Seq(
      "space_scan_index_limit", // pruned scan + top-k
      "stream_tails",           // partial-agg argmax over json_attr
      "agg_space_stats",        // hash aggregation
      "store_join_copartitioned", // storage-partitioned join, zero hash exchanges
      "events_sessionize",      // window functions
      "events_asof_join",       // union-window asof
      "q1_lineitem_agg",        // wide fact aggregation
      "events_funnel",          // per-grouping scalar funnel reductions
      "events_retention",       // cohort/retention grid
      "dedup_exact",            // hash-group dedup
      "dedup_minhash",          // LSH banding self-join
      "similarity_topk",        // broadcast nested-loop scoring
      "text_vocab_topk",        // explode + count + top-k
      "text_bpe_train",         // tokenizer training: one corpus scan + vocab-table merge rounds
      "embeddings_project",     // sign projection: scan-stage kernel, no shuffle
      "text_quality_classifier", // batch-perceptron training: cached features, dim-sized model state
      "text_bigram_topk_sketch", // Misra-Gries heavy hitters (cap-bounded shuffle)
      "text_span_dedup",        // span explode + hash-only shuffle
      "corpus_pack",            // per-source running-total window
      "corpus_chunk",           // per-partition chunking kernel
      "corpus_shuffle",         // global md5-rank permutation (range sort)
      "corpus_mix",             // hash-threshold scan-stage sampling
      "corpus_decontaminate",   // shingle-hash broadcast join, text never shuffles
      "multimodal_features",    // real container decode kernel, no shuffle
      "text_redact_pii",        // codegen regex scrub, scan-stage only
      "similarity_ivf",         // persisted-index probe (build amortized by ensureIndex)
      "store_merge_sql",        // native MERGE INTO via SupportsRowLevelOperations
      "store_zorder_strings",   // string-curve store: string-range delete + SPJ agg
      "store_changes_exact")    // EXCEPT ALL audit feed (payloads shuffle by design)

    // `families=a,b` runs just those rows (adding a new family doesn't
    // require re-measuring the rest of the harness)
    val famFilter = args.collectFirst {
      case a if a.startsWith("families=") => a.drop("families=".length).split(",").toSet
    }
    val chosen = famFilter.map(f => families.filter(f)).getOrElse(families)

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      ops.Caches.clear() // harness housekeeping stays outside the measurement
      elapsed
    }

    // warm both paths once so JIT/codegen is steady before measuring
    chosen.foreach { n => time(n, sfDir); time(n, bigDir) }
    println(f"${"query"}%-24s ${"t_1x"}%8s ${"t_10x"}%8s ratio")
    chosen.foreach { n =>
      val t1 = math.min(time(n, sfDir), time(n, sfDir))
      val t10 = math.min(time(n, bigDir), time(n, bigDir))
      println(f"$n%-24s $t1%8.2f $t10%8.2f ${t10 / t1}%5.1f")
    }
    if (famFilter.isDefined) { spark.stop(); return }

    // write path: the reference's own benchmark shapes are bulk writes
    // (writer_test.go: 10k/100k/1M events) — time the full store write
    // (repartition by space + within-partition sort + partitioned
    // parquet + index materialization) at 1x (~100k) and 10x (~1M)
    def timeWrite(src: String, out: String): Double = {
      val dir = new java.io.File(out)
      if (dir.exists()) { // fresh target: the store write is create-once
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
      val evFrame = engine.EventFrame.fromEvents(
        spark.read.option("basePath", src).parquet(s"$src/events.parquet"))
      val t0 = System.nanoTime()
      engine.EsdbWriter.write(evFrame, out, indexAttrs = Seq("k"))
      (System.nanoTime() - t0) / 1e9
    }
    timeWrite(sfDir, "/tmp/graft_scale/store_warm") // warm the write path
    // best-of-2, same as the query families — a single sample is too
    // exposed to local-mode GC/page-cache noise to publish as a ratio
    val w1 = math.min(timeWrite(sfDir, "/tmp/graft_scale/store_1x"),
      timeWrite(sfDir, "/tmp/graft_scale/store_1x"))
    val w10 = math.min(timeWrite(bigDir, "/tmp/graft_scale/store_10x"),
      timeWrite(bigDir, "/tmp/graft_scale/store_10x"))
    println(f"${"esdb_write"}%-24s $w1%8.2f $w10%8.2f ${w10 / w1}%5.1f")
    skewCheck(spark, sfDir, bigDir)
    orderedCheck(spark, sfDir, bigDir)
    ingestCheck(spark, sfDir, bigDir)
    replayCheck(spark, sfDir, bigDir)
    spark.stop()
  }

  /** Parallel-replay evidence at 10×: a full-history consumption of
    * the 10× log store through the single global cursor (one task
    * merges every file — the reference's sequential `Iterate`) vs the
    * manifest-grouped parallel scan (one task per disjoint id-range
    * file group). The files are written range-partitioned, so the
    * groups are the write's partitions and the speedup bound is
    * min(groups, cores) — near-linear until the box runs out of
    * either. This is the row that says a 100 TB replay doesn't
    * serialize through one reader.
    */
  private def replayCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    // 100× events (the 10× table replicated again): a replay
    // measurement needs task time to dominate the fixed planning cost
    // (listing + manifest + footer probes ≈ 0.2 s) or the ratio
    // measures the planner, not the replay
    val logPath = s"$bigDir/log_replay100"
    if (!new java.io.File(logPath).exists()) {
      val ev10 = engine.Tables.events(spark, bigDir)
      val maxId = ev10.agg(max(col("event_id"))).head().getLong(0) + 1L
      val ev100 = (0 until Factor).map(i =>
        ev10.withColumn("event_id", col("event_id") + lit(i * maxId)))
        .reduce(_ unionByName _)
      engine.EsdbWriter.writeLog(engine.EventFrame.fromEvents(ev100), logPath)
    }
    // the consumption: every canonical column decoded (a replay feeds
    // downstream state, not a count(*) — column pruning must not turn
    // this into a metadata read)
    var groups = 0
    def replay(parallel: Boolean): Double = {
      val df = (if (parallel) engine.EsdbWriter.readLogParallel(spark, logPath)
                else engine.EsdbWriter.readLog(spark, logPath))
        .select("event_id", "ts_us", "space", "grouping", "value", "payload")
      val t0 = System.nanoTime()
      val rdd = df.queryExecution.toRdd
      rdd.count()
      if (parallel) groups = rdd.getNumPartitions
      (System.nanoTime() - t0) / 1e9
    }
    replay(parallel = false); replay(parallel = true) // warm
    val single = math.min(replay(parallel = false), replay(parallel = false))
    val par = math.min(replay(parallel = true), replay(parallel = true))
    println(f"replay_log10x              single=$single%6.2f parallel=$par%6.2f " +
      f"groups=$groups%3d speedup=${single / par}%4.1f")
  }

  /** Streaming-sink evidence at 10×: full exactly-once ingest of the
    * events table through [[graft.streaming.StreamIngest.sinkLog]]
    * (file stream source → canonical frame → marker-committed log
    * batches), 1× vs 10×. The per-batch protocol cost is one small
    * commit object + one manifest delta, so wall time should scale
    * with data volume, not batch count.
    */
  private def ingestCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    // a 1× copy as a DIRECTORY (the file stream source monitors dirs;
    // the raw testdata table is a single file)
    val oneX = s"$bigDir/events_1x.parquet"
    if (!new java.io.File(oneX).exists())
      engine.Tables.events(spark, sfDir).write.mode(SaveMode.Overwrite).parquet(oneX)
    def timeIngest(srcDir: String, out: String): Double = {
      import scala.reflect.io.Directory
      Seq(out, s"$out-ckpt").foreach(p => new Directory(new java.io.File(p)).deleteRecursively())
      val schema = spark.read.parquet(srcDir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(srcDir)
      val t0 = System.nanoTime()
      graft.streaming.StreamIngest.sinkLog(
        engine.EventFrame.fromEvents(stream), out, s"$out-ckpt").awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    timeIngest(oneX, s"$bigDir/ingest_warm") // warm the sink path
    val i1 = math.min(timeIngest(oneX, s"$bigDir/ingest_1x"),
      timeIngest(oneX, s"$bigDir/ingest_1x"))
    val i10 = math.min(timeIngest(s"$bigDir/events.parquet", s"$bigDir/ingest_10x"),
      timeIngest(s"$bigDir/events.parquet", s"$bigDir/ingest_10x"))
    println(f"${"log_sink_ingest"}%-24s $i1%8.2f $i10%8.2f ${i10 / i1}%5.1f")
    // the ingested 10x store must round-trip: same count as the source
    val n = engine.EsdbWriter.readLog(spark, s"$bigDir/ingest_10x").count()
    val want = spark.read.parquet(s"$bigDir/events.parquet").count()
    require(n == want, s"ingest round-trip lost rows: $n != $want")
    // the same ingest through the NATIVE DSv2 sink
    // (writeStream.format("esdblog") — executors write final-named
    // stream-<epoch> files, the driver's epoch commit is one marker
    // object): no foreachBatch, so the driver never re-plans a batch
    // write per micro-batch, and no staging dirs or renames
    def timeNative(srcDir: String, out: String): Double = {
      import scala.reflect.io.Directory
      Seq(out, s"$out-ckpt").foreach(p => new Directory(new java.io.File(p)).deleteRecursively())
      val schema = spark.read.parquet(srcDir).schema
      val t0 = System.nanoTime()
      // seed: the sink binds to an existing store for its schema (the
      // reference's stream.New before Stream.Write, stream/stream.go:45-52)
      engine.EsdbWriter.writeLog(
        engine.EventFrame.fromEvents(spark.read.parquet(srcDir)).limit(0).repartition(1), out)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(srcDir)
      engine.EventFrame.fromEvents(stream).writeStream
        .format("esdblog").option("path", out)
        .option("checkpointLocation", s"$out-ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    timeNative(oneX, s"$bigDir/ingest_native_warm")
    val n1 = math.min(timeNative(oneX, s"$bigDir/ingest_native_1x"),
      timeNative(oneX, s"$bigDir/ingest_native_1x"))
    val n10 = math.min(timeNative(s"$bigDir/events.parquet", s"$bigDir/ingest_native_10x"),
      timeNative(s"$bigDir/events.parquet", s"$bigDir/ingest_native_10x"))
    println(f"${"log_native_ingest"}%-24s $n1%8.2f $n10%8.2f ${n10 / n1}%5.1f")
    val nn = engine.EsdbWriter.readLog(spark, s"$bigDir/ingest_native_10x").count()
    require(nn == want, s"native ingest round-trip lost rows: $nn != $want")
    // the STORE-layout native sink (r11): same stream, but micro-batches
    // arrive space-clustered + layout-sorted and land as per-space
    // dot-staged epoch files committed by commitStoreEpoch — the extra
    // cost over the log sink is the per-batch cluster/sort exchange and
    // the per-space manifest deltas
    def timeStoreNative(srcDir: String, out: String): Double = {
      import scala.reflect.io.Directory
      Seq(out, s"$out-ckpt").foreach(p => new Directory(new java.io.File(p)).deleteRecursively())
      val schema = spark.read.parquet(srcDir).schema
      val t0 = System.nanoTime()
      engine.EsdbWriter.write(
        engine.EventFrame.fromEvents(spark.read.parquet(srcDir)).limit(0).repartition(1), out)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(srcDir)
      engine.EventFrame.fromEvents(stream).writeStream
        .format("esdb").option("path", out)
        .option("checkpointLocation", s"$out-ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    timeStoreNative(oneX, s"$bigDir/ingest_store_warm")
    val s1 = math.min(timeStoreNative(oneX, s"$bigDir/ingest_store_1x"),
      timeStoreNative(oneX, s"$bigDir/ingest_store_1x"))
    val s10 = math.min(timeStoreNative(s"$bigDir/events.parquet", s"$bigDir/ingest_store_10x"),
      timeStoreNative(s"$bigDir/events.parquet", s"$bigDir/ingest_store_10x"))
    println(f"${"store_native_ingest"}%-24s $s1%8.2f $s10%8.2f ${s10 / s1}%5.1f")
    val sn = engine.EsdbWriter.readOrdered(spark, s"$bigDir/ingest_store_10x").count()
    require(sn == want, s"store-native ingest round-trip lost rows: $sn != $want")
    // SUBPARTITIONED store sink (r12 row for the r11 claim): the seed
    // store declares subparts=4, per-(space,bucket) writers stage epoch
    // files under both layout levels, and the merge invariant must hold
    // per bucket — measured like the flat layout, then the bucket-pruned
    // grouping read-back asserted against the flat store's answer
    def timeStoreSub(srcDir: String, out: String): Double = {
      import scala.reflect.io.Directory
      Seq(out, s"$out-ckpt").foreach(p => new Directory(new java.io.File(p)).deleteRecursively())
      val schema = spark.read.parquet(srcDir).schema
      val t0 = System.nanoTime()
      engine.EsdbWriter.write(
        engine.EventFrame.fromEvents(spark.read.parquet(srcDir)).limit(0).repartition(1),
        out, subparts = 4)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(srcDir)
      engine.EventFrame.fromEvents(stream).writeStream
        .format("esdb").option("path", out)
        .option("checkpointLocation", s"$out-ckpt")
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start().awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    timeStoreSub(oneX, s"$bigDir/ingest_sub_warm")
    val b1 = math.min(timeStoreSub(oneX, s"$bigDir/ingest_sub_1x"),
      timeStoreSub(oneX, s"$bigDir/ingest_sub_1x"))
    val b10 = math.min(timeStoreSub(s"$bigDir/events.parquet", s"$bigDir/ingest_sub_10x"),
      timeStoreSub(s"$bigDir/events.parquet", s"$bigDir/ingest_sub_10x"))
    println(f"${"store_native_ingest_sub"}%-24s $b1%8.2f $b10%8.2f ${b10 / b1}%5.1f")
    val bn = engine.EsdbWriter.readOrdered(spark, s"$bigDir/ingest_sub_10x").count()
    require(bn == want, s"subpartitioned ingest round-trip lost rows: $bn != $want")
    // bucket-pruned ordered read-back: a grouping-pinned scan on the
    // subpartitioned store equals the flat store's (order included)
    val subScan = engine.EventStore.scan(
      engine.EsdbWriter.readOrdered(spark, s"$bigDir/ingest_sub_10x"), "click", "7")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    val flatScan = engine.EventStore.scan(
      engine.EsdbWriter.readOrdered(spark, s"$bigDir/ingest_store_10x"), "click", "7")
      .select("event_id").collect().map(_.getLong(0)).toSeq
    require(subScan == flatScan,
      s"bucket-pruned scan diverged: ${subScan.take(5)} vs ${flatScan.take(5)}")
  }

  /** Ordered-read evidence at 10×: the same scans through the vanilla
    * parquet path (Sort planned) and the DSv2 ordered source (Sort
    * elided). Measures BOTH the filtered single-grouping scan (the
    * reference's flagship read) and the unbounded whole-space ordered
    * iterate — the shapes have different winners and the table says so.
    */
  private def orderedCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    val store = s"$bigDir/store_ordered"
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    if (!new java.io.File(store).exists())
      engine.EsdbWriter.write(
        engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir)), store)
    def frame(ordered: Boolean) =
      if (ordered) engine.EsdbWriter.readOrdered(spark, store)
      else engine.EsdbWriter.read(spark, store)
    val cases: Seq[(String, Boolean => org.apache.spark.sql.DataFrame)] = Seq(
      ("scan_grouping" -> (o => engine.EventStore.scan(frame(o), "click", "7"))),
      ("scan_grouping_lim" -> (o => engine.EventStore.scan(frame(o), "click", "7", Some(500)))),
      ("scan_space_full" -> (o => engine.EventStore.scanSpace(frame(o), "click"))))
    def time(fn: Boolean => org.apache.spark.sql.DataFrame, o: Boolean): Double = {
      val t0 = System.nanoTime()
      fn(o).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    cases.foreach { case (_, fn) => time(fn, false); time(fn, true) } // warm
    cases.foreach { case (name, fn) =>
      val tv = math.min(time(fn, false), time(fn, false))
      val to = math.min(time(fn, true), time(fn, true))
      println(f"ordered_$name%-22s vanilla=$tv%6.2f ordered=$to%6.2f ordered/vanilla=${to / tv}%4.2f")
    }
    // hot-space subpartitioning: the same 10x store bucketed 8 ways.
    // The write-side lever is measurable locally (spaces x buckets
    // tasks instead of one task per space); the read-side lever —
    // listing-time bucket pruning — shows as parity here because a
    // freshly-written flat space is ONE file whose row-group stats
    // already skip foreign groupings; it pays off when a space holds
    // many files at object-store listing/open latencies
    val bucketed = s"$bigDir/store_bucketed"
    def timeBucketedWrite(out: String, subparts: Int): Double = {
      val dir = new java.io.File(out)
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
      val evf = engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir))
      val t0 = System.nanoTime()
      engine.EsdbWriter.write(evf, out, subparts = subparts)
      (System.nanoTime() - t0) / 1e9
    }
    val wFlat = math.min(timeBucketedWrite(s"$bigDir/store_wflat", 1),
      timeBucketedWrite(s"$bigDir/store_wflat", 1))
    val wBuck = math.min(timeBucketedWrite(bucketed, 8), timeBucketedWrite(bucketed, 8))
    println(f"bucketed_write8            flat=$wFlat%6.2f bucketed=$wBuck%6.2f bucketed/flat=${wBuck / wFlat}%4.2f")
    def bScan() = engine.EventStore.scan(
      engine.EsdbWriter.readOrdered(spark, bucketed), "click", "7")
    def fScan() = engine.EventStore.scan(
      engine.EsdbWriter.readOrdered(spark, store), "click", "7")
    def timeDf(fn: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn().queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    timeDf(bScan _); timeDf(fScan _) // warm
    val tb = math.min(timeDf(bScan _), timeDf(bScan _))
    val tf = math.min(timeDf(fScan _), timeDf(fScan _))
    println(f"ordered_scan_bucketed8     flat=$tf%6.2f bucketed=$tb%6.2f bucketed/flat=${tb / tf}%4.2f")

    // the log-layout dual: whole-log iterate (vectorized concatenation)
    // vs the same iterate over vanilla parquet (global sort planned)
    val logStore = s"$bigDir/log_ordered"
    if (!new java.io.File(logStore).exists())
      engine.EsdbWriter.writeLog(
        engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir)), logStore)
    val logHead = engine.EsdbWriter.readLog(spark, logStore)
      .agg(org.apache.spark.sql.functions.max("event_id")).head().getLong(0)
    def logTime(ordered: Boolean, from: Long): Double = {
      val frame =
        if (ordered) engine.EsdbWriter.readLog(spark, logStore)
        else engine.GraftSession.tune(spark).read.parquet(
          engine.Publish.resolve(spark.sparkContext.hadoopConfiguration, logStore))
      val t0 = System.nanoTime()
      engine.EventLog.iterate(frame, from).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    for ((name, from) <- Seq(("log_iterate_full", 0L), ("log_resume_tail1pct", logHead - logHead / 100))) {
      logTime(ordered = false, from); logTime(ordered = true, from) // warm
      val lv = math.min(logTime(ordered = false, from), logTime(ordered = false, from))
      val lo = math.min(logTime(ordered = true, from), logTime(ordered = true, from))
      println(f"ordered_$name%-22s vanilla=$lv%6.2f ordered=$lo%6.2f ordered/vanilla=${lo / lv}%4.2f")
    }
  }

  /** Write-amplification evidence at 10×: a store where ONE of five
    * spaces is fragmented by appends, compacted full-rewrite vs
    * incrementally. The incremental path rewrites the fragmented space
    * and file-copies the rest — locally the copy still moves bytes, so
    * the measured win is the skipped decode+sort+encode; on an object
    * store the copy is a metadata-priced server-side COPY and the gap
    * widens to the fragmented fraction.
    */
  /** Delete-cost evidence: a GDPR scrub of one grouping confined to one
    * small space, and a time retention whose cutoff expires the older
    * of two appended batches, each timed against the full-rewrite
    * alternative (`compact`) on the SAME 10× store. The claim under
    * test is "delete cost tracks the doomed data, not store size": the
    * scrub rewrites one tiny space, retention drops whole files by
    * manifest and rewrites only the straddler. Locally the carried
    * spaces still cost a byte copy (same caveat as incremental
    * compaction — on an object store that copy is metadata-priced), so
    * the honest local comparison is delete-vs-full-rewrite, where the
    * saved decode+sort+encode dominates.
    */
  private def deleteCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    val big = s"$bigDir/events.parquet"
    if (!new java.io.File(big).exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), big)
    def frame(src: String) = engine.EventFrame.fromEvents(
      spark.read.option("basePath", src).parquet(s"$src/events.parquet"))
    // constant doomed payload: one synthetic space holding the grouping
    // to scrub — the store grows 10x around it, the user's data doesn't
    val doomed = spark.range(1000).select(
      lit("zzz_scrub").as("space"), lit("scrub_me").as("grouping"),
      (col("id") * 1000L).as("ts_us"), (col("id") + 900000000L).as("event_id"),
      lit(0.0).as("value"), lit("{}").as("payload"))
    def fresh(out: String): String = {
      val dir = new java.io.File(out)
      if (dir.exists()) { import scala.reflect.io.Directory; new Directory(dir).deleteRecursively() }
      out
    }
    def buildScrub(src: String, out: String): String = {
      engine.EsdbWriter.write(frame(src).unionByName(doomed), fresh(out)); out
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // builds stay OUTSIDE the timed thunks (by-name evaluation would
    // otherwise fold the store build into the delete measurement)
    val dWarmStore = buildScrub(sfDir, "/tmp/graft_scale/del_warm")
    timed { engine.EsdbWriter.delete(spark, dWarmStore, groupings = Some(Set("scrub_me"))) }
    val d1store = buildScrub(sfDir, "/tmp/graft_scale/del_1x")
    val d1 = timed { engine.EsdbWriter.delete(spark, d1store, groupings = Some(Set("scrub_me"))) }
    val d10store = buildScrub(bigDir, "/tmp/graft_scale/del_10x")
    val d10 = timed { engine.EsdbWriter.delete(spark, d10store, groupings = Some(Set("scrub_me"))) }
    println(f"${"gdpr_delete"}%-24s $d1%8.2f $d10%8.2f ${d10 / d1}%5.1f")
    // the alternative a layout without manifests pays: full rewrite
    val c10 = timed { engine.EsdbWriter.compact(spark, d10store) }
    println(f"${"vs_full_rewrite_10x"}%-24s ${"-"}%8s $c10%8.2f ${c10 / d10}%5.1fx costlier")
    // arbitrary-predicate delete (r8): the doomed rows carry values far
    // outside the base distribution and land as their own appended
    // batch — footer stats prove every base file carry-able, so the
    // cost tracks the predicate's stat footprint (one batch) while the
    // store grows 10x around it
    val doomedVal = spark.range(1000).select(
      lit("click").as("space"), lit("pd").as("grouping"),
      (col("id") * 1000L).as("ts_us"), (col("id") + 910000000L).as("event_id"),
      (col("id") + 500000L).cast("double").as("value"), lit("{}").as("payload"))
    def buildPred(src: String, out: String): String = {
      engine.EsdbWriter.write(frame(src), fresh(out))
      engine.EsdbWriter.append(doomedVal, out)
      out
    }
    val predFilter = Seq[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("value", 500000.0))
    val pWarm = buildPred(sfDir, "/tmp/graft_scale/pred_warm")
    timed { engine.EsdbWriter.deleteWhere(spark, pWarm, predFilter) }
    val p1store = buildPred(sfDir, "/tmp/graft_scale/pred_1x")
    val p1 = timed { engine.EsdbWriter.deleteWhere(spark, p1store, predFilter) }
    val p10store = buildPred(bigDir, "/tmp/graft_scale/pred_10x")
    val p10 = timed { engine.EsdbWriter.deleteWhere(spark, p10store, predFilter) }
    println(f"${"predicate_delete"}%-24s $p1%8.2f $p10%8.2f ${p10 / p1}%5.1f")
    val cp10 = timed { engine.EsdbWriter.compact(spark, p10store) }
    println(f"${"vs_full_rewrite_10x"}%-24s ${"-"}%8s $cp10%8.2f ${cp10 / p10}%5.1fx costlier")
    // retention: two time-ordered batches, cutoff between them — the
    // old batch's files drop by manifest, nothing straddles
    def buildRet(src: String, out: String): String = {
      val f = frame(src).filter(col("ts_us").isNotNull)
      engine.EsdbWriter.write(f, fresh(out))
      engine.EsdbWriter.append(f.withColumn("ts_us", col("ts_us") + lit(20L * 365 * 86400 * 1000000L))
        .withColumn("event_id", col("event_id") + lit(900000000L)), out)
      out
    }
    val cutoff = 1800000000000000L // between the two batches' ts ranges
    val rWarmStore = buildRet(sfDir, "/tmp/graft_scale/ret_warm")
    timed { engine.EsdbWriter.deleteOlderThan(spark, rWarmStore, cutoff) }
    val r1store = buildRet(sfDir, "/tmp/graft_scale/ret_1x")
    val r1 = timed { engine.EsdbWriter.deleteOlderThan(spark, r1store, cutoff) }
    val r10store = buildRet(bigDir, "/tmp/graft_scale/ret_10x")
    val r10 = timed { engine.EsdbWriter.deleteOlderThan(spark, r10store, cutoff) }
    println(f"${"ts_retention"}%-24s $r1%8.2f $r10%8.2f ${r10 / r1}%5.1f")
    val cr10 = timed { engine.EsdbWriter.compact(spark, r10store) }
    println(f"${"vs_full_rewrite_10x"}%-24s ${"-"}%8s $cr10%8.2f ${cr10 / r10}%5.1fx costlier")
  }

  /** Measured rows for the r9/r10 mutation-and-evolution surface
    * (X21 predicate UPDATE, X22 change feed, X23 value clustering,
    * X25 rename/drop): each claim in the scaladocs — cost ∝ predicate
    * stat footprint / churn / selectivity / nothing — gets a 1× vs 10×
    * number here, like the delete table.
    */
  private def mutationCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    val big = s"$bigDir/events.parquet"
    if (!new java.io.File(big).exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), big)
    def frame(src: String) = engine.EventFrame.fromEvents(
      spark.read.option("basePath", src).parquet(s"$src/events.parquet"))
    def fresh(out: String): String = {
      val dir = new java.io.File(out)
      if (dir.exists()) { import scala.reflect.io.Directory; new Directory(dir).deleteRecursively() }
      out
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- X21: predicate UPDATE cost tracks the predicate's stat
    // footprint, not store size (same doomed-batch shape as
    // predicate_delete: the matching rows live in one appended batch
    // whose value range no base file overlaps)
    val doomedVal = spark.range(1000).select(
      lit("click").as("space"), lit("pu").as("grouping"),
      (col("id") * 1000L).as("ts_us"), (col("id") + 920000000L).as("event_id"),
      (col("id") + 500000L).cast("double").as("value"), lit("{}").as("payload"))
    def buildUpd(src: String, out: String): String = {
      engine.EsdbWriter.write(frame(src), fresh(out))
      engine.EsdbWriter.append(doomedVal, out)
      out
    }
    val updSet = Map("payload" -> lit("\"redacted\""))
    val updFilter = Seq[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("value", 500000.0))
    val uWarm = buildUpd(sfDir, s"$bigDir/upd_warm")
    timed { engine.EsdbWriter.updateWhere(spark, uWarm, updSet, updFilter): Unit }
    val u1store = buildUpd(sfDir, s"$bigDir/upd_1x")
    val u1 = timed { engine.EsdbWriter.updateWhere(spark, u1store, updSet, updFilter): Unit }
    val u10store = buildUpd(bigDir, s"$bigDir/upd_10x")
    val u10 = timed { engine.EsdbWriter.updateWhere(spark, u10store, updSet, updFilter): Unit }
    println(f"${"predicate_update"}%-24s $u1%8.2f $u10%8.2f ${u10 / u1}%5.1f")
    val cu10 = timed { engine.EsdbWriter.compact(spark, u10store) }
    println(f"${"vs_full_rewrite_10x"}%-24s ${"-"}%8s $cu10%8.2f ${cu10 / u10}%5.1fx costlier")

    // ---- X23: value-domain clustering makes mid-domain predicate
    // deletes (which footer stats CANNOT prune on an interleaved
    // layout: every file's min/max straddles the cutoff) rewrite only
    // the files whose narrow value slice matches — same store, same
    // predicate, clustered vs not
    val vals = frame(sfDir).select("value").na.drop()
      .stat.approxQuantile("value", Array(0.45, 0.55), 0.01)
    val (lo, hi) = (vals(0), vals(1))
    val cluFilter = Seq[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("value", lo),
      org.apache.spark.sql.sources.LessThan("value", hi))
    def buildClu(src: String, out: String, clustered: Boolean): String = {
      engine.EsdbWriter.write(frame(src), fresh(out),
        clusterBy = if (clustered) Seq("value") else Nil, clusterChunks = 16)
      out
    }
    def dataFiles(p: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(p)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      engine.Publish.currentFiles(spark.sparkContext.hadoopConfiguration, p).size
    }
    val fWarm = buildClu(sfDir, s"$bigDir/clu_warm", clustered = true)
    timed { engine.EsdbWriter.deleteWhere(spark, fWarm, cluFilter): Unit }
    val flat10 = buildClu(bigDir, s"$bigDir/clu_flat10", clustered = false)
    val filesBefore = dataFiles(flat10)
    val f10 = timed { engine.EsdbWriter.deleteWhere(spark, flat10, cluFilter): Unit }
    val clu10 = buildClu(bigDir, s"$bigDir/clu_clu10", clustered = true)
    val c10 = timed { engine.EsdbWriter.deleteWhere(spark, clu10, cluFilter): Unit }
    println(f"${"middecile_delete_flat"}%-24s ${"-"}%8s $f10%8.2f (rewrites ~all of $filesBefore files)")
    println(f"${"middecile_delete_clustered"}%-20s ${"-"}%8s $c10%8.2f ${f10 / c10}%5.1fx cheaper")

    // ---- X22: change-feed cost tracks churn. Three windows over the
    // same 10× store: pure append (no diff machinery), small rewrite
    // (diff over the footprint), full compaction with zero logical
    // churn (hash-only pass, no payload shuffle)
    def buildVersioned(src: String, out: String): String = {
      val p = fresh(out)
      val conf = spark.sparkContext.hadoopConfiguration
      engine.Publish.publish(conf, p, keepVersions = 8) { tmp =>
        engine.EsdbWriter.write(frame(src), tmp)
      }
      p
    }
    def feed(p: String, from: Long): Double =
      timed { engine.EsdbWriter.changesFeed(spark, p, from).queryExecution.toRdd.count(): Unit }
    val chg1 = buildVersioned(sfDir, s"$bigDir/chg_1x")
    val chg10 = buildVersioned(bigDir, s"$bigDir/chg_10x")
    Seq(chg1, chg10).foreach { p =>
      engine.EsdbWriter.appendVersioned(doomedVal, p, keepVersions = 8) // v2: pure append
    }
    feed(chg1, 1L) // warm
    println(f"${"changes_pure_append"}%-24s ${feed(chg1, 1L)}%8.2f ${feed(chg10, 1L)}%8.2f   (direct file read, no diff)")
    Seq(chg1, chg10).foreach { p =>
      engine.EsdbWriter.deleteWhere(spark, p, updFilter, keepVersions = 8): Unit // v3: small rewrite
    }
    println(f"${"changes_small_churn"}%-24s ${feed(chg1, 2L)}%8.2f ${feed(chg10, 2L)}%8.2f   (diff over the rewrite footprint)")
    Seq(chg1, chg10).foreach(p => engine.EsdbWriter.compact(spark, p, keepVersions = 8)) // v4
    println(f"${"changes_zero_churn_compact"}%-20s ${feed(chg1, 3L)}%8.2f ${feed(chg10, 3L)}%8.2f   (hash-only pass, no payload shuffle)")

    // ---- X26: keyed MERGE. On a key-interleaved layout every file's
    // id range admits a match (full footprint — what any CoW engine
    // pays); clusterBy on the merge key bounds the rewrite to the
    // source's key slice, same lever as X23
    def buildMrg(src: String, out: String, clustered: Boolean): String = {
      engine.EsdbWriter.write(frame(src), fresh(out),
        clusterBy = if (clustered) Seq("event_id") else Nil, clusterChunks = 16)
      out
    }
    val mrgSource = spark.range(500).select(
      lit("click").as("space"), lit("mg").as("grouping"),
      (col("id") * 1000L).as("ts_us"), (col("id") + 3L).as("event_id"),
      lit(1.5).as("value"), lit("{}").as("payload"))
    def timeMerge(p: String): Double =
      timed { engine.EsdbWriter.mergeInto(spark, p, mrgSource, Seq("event_id")): Unit }
    timeMerge(buildMrg(sfDir, s"$bigDir/mrg_warm", clustered = false))
    val m1 = timeMerge(buildMrg(sfDir, s"$bigDir/mrg_1x", clustered = false))
    val m10 = timeMerge(buildMrg(bigDir, s"$bigDir/mrg_10x", clustered = false))
    println(f"${"merge_interleaved_key"}%-24s $m1%8.2f $m10%8.2f ${m10 / m1}%5.1f (footprint = every overlapping file)")
    val mc10 = timeMerge(buildMrg(bigDir, s"$bigDir/mrg_clu10", clustered = true))
    println(f"${"merge_key_clustered_10x"}%-24s ${"-"}%8s $mc10%8.2f ${m10 / mc10}%5.1fx cheaper (footprint = the key slice)")

    // ---- X28: CDC apply — replicate one feed window onto a 1× vs 10×
    // replica. The delete set is footprint-bounded by (space, id-range)
    // stats, so the apply prices by the window's churn, not replica size
    // the deleted slice is a CONSTANT synthetic batch inside v1 (values
    // far below the base distribution): the window's churn stays fixed
    // while the store grows 10x around it — the shape the claim is about
    val doomedNeg = spark.range(1000).select(
      lit("click").as("space"), lit("cd").as("grouping"),
      (col("id") * 1000L).as("ts_us"), (col("id") + 930000000L).as("event_id"),
      (col("id").cast("double") - lit(1000.0)).as("value"), lit("{}").as("payload"))
    def buildPair(src: String, tag: String): (String, String) = {
      val sp = s"$bigDir/cdc_${tag}_src"; val rp = s"$bigDir/cdc_${tag}_rep"
      Seq(sp, rp).foreach { o =>
        fresh(o)
        engine.Publish.publish(spark.sparkContext.hadoopConfiguration, o, 8) { t =>
          engine.EsdbWriter.write(frame(src).unionByName(doomedNeg), t)
        }
      }
      engine.EsdbWriter.appendVersioned(doomedVal, sp, keepVersions = 8)
      // the window carries BOTH kinds: inserts (the appended batch) and
      // deletes (the constant doomed slice of v1)
      engine.EsdbWriter.deleteWhere(spark, sp,
        Seq(org.apache.spark.sql.sources.LessThan("value", -0.5)), keepVersions = 8): Unit
      (sp, rp)
    }
    def timeApply(pair: (String, String)): Double = timed {
      engine.EsdbWriter.applyChanges(spark, pair._2,
        engine.EsdbWriter.changesFeed(spark, pair._1, 1L), keepVersions = 8): Unit
    }
    timeApply(buildPair(sfDir, "warm"))
    val a1 = timeApply(buildPair(sfDir, "1x"))
    val a10 = timeApply(buildPair(bigDir, "10x"))
    println(f"${"cdc_apply_window"}%-24s $a1%8.2f $a10%8.2f ${a10 / a1}%5.1f (footprint = the window's churn)")
    // the same 10× apply under MANIFEST carry (the HDFS/S3 mode): the
    // whole chain — versioned append, predicate delete, feed apply —
    // carries untouched files by `_CARRY` reference, so the commit
    // cost stays the window's churn with ZERO links available
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set(engine.Carry.ModeKey, "manifest")
    val am10 = try timeApply(buildPair(bigDir, "mani10"))
               finally hc.unset(engine.Carry.ModeKey)
    println(f"${"cdc_apply_manifest_10x"}%-24s ${"-"}%8s $am10%8.2f ${a10 / am10}%5.2fx vs link mode (reference-carried, no links needed)")

    // ---- X25: rename/drop are one sidecar write — flat at any scale
    def buildIded(src: String, out: String): String = {
      engine.EsdbWriter.write(frame(src).withColumn("note", lit("n")), fresh(out))
      out
    }
    val id1 = buildIded(sfDir, s"$bigDir/ided_1x")
    val id10 = buildIded(bigDir, s"$bigDir/ided_10x")
    val rn1 = timed { engine.EsdbWriter.renameColumn(spark, id1, "note", "memo") }
    val rn10 = timed { engine.EsdbWriter.renameColumn(spark, id10, "note", "memo") }
    println(f"${"rename_column"}%-24s $rn1%8.3f $rn10%8.3f   (one sidecar write)")
    val dp1 = timed { engine.EsdbWriter.dropColumn(spark, id1, "memo") }
    val dp10 = timed { engine.EsdbWriter.dropColumn(spark, id10, "memo") }
    println(f"${"drop_column"}%-24s $dp1%8.3f $dp10%8.3f   (one sidecar write)")
  }

  private def compactionCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    val conf = spark.sparkContext.hadoopConfiguration
    def build(out: String): Unit = {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out)).deleteRecursively()
      val evf = engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir))
      engine.Publish.publish(conf, out) { tmp =>
        engine.EsdbWriter.write(evf, tmp)
      }: Unit
      val clicks = evf.where(col("space") === "click")
      (0 until 6).foreach { i =>
        engine.EsdbWriter.append(clicks.where(pmod(col("event_id"), lit(64)) === i), out)
      }
    }
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    build(s"$bigDir/store_cfull"); build(s"$bigDir/store_cincr") // fresh pair per run
    val tFull = time(engine.EsdbWriter.compact(spark, s"$bigDir/store_cfull"))
    val tIncr = time {
      require(engine.EsdbWriter.compactIncremental(spark, s"$bigDir/store_cincr",
        maxFilesPerSpace = 3), "incremental compaction found nothing fragmented")
    }
    // both paths must converge to the same row set before times mean anything
    val nFull = engine.EsdbWriter.readOrdered(spark, s"$bigDir/store_cfull").count()
    val nIncr = engine.EsdbWriter.readOrdered(spark, s"$bigDir/store_cincr").count()
    require(nFull == nIncr, s"compaction paths diverged: $nFull != $nIncr")
    println(f"${"compact_full"}%-24s $tFull%8.2f")
    println(f"${"compact_incremental"}%-24s $tIncr%8.2f  incr/full=${tIncr / tFull}%4.2f")
  }

  /** Layout-evolution evidence: a store created FLAT (subparts=1) at
    * 10× volume, then re-bucketed by `compact(subparts = 8)` — the r13
    * lift of the "fixed at creation" restriction. Times a grouping-
    * pinned scan before and after: flat must read the whole space,
    * re-bucketed prunes to its hash bucket (~1/8), which is the whole
    * point of letting a store that outgrew its creation layout
    * re-bucket under one version commit instead of clone + rewrite.
    */
  private def rebucketCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    val conf = spark.sparkContext.hadoopConfiguration
    import scala.reflect.io.Directory
    // ONE hot space holding the whole 10× volume — the shape the
    // subparts lever exists for (a store created flat before the space
    // went hot is exactly the store that needs to re-bucket)
    val evf = engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir))
      .withColumn("space", lit("hot"))
    def build(out: String): Unit = {
      new Directory(new java.io.File(out)).deleteRecursively()
      engine.Publish.publish(conf, out) { tmp =>
        engine.EsdbWriter.write(evf, tmp) // created flat: subparts = 1
      }: Unit
    }
    val flatOut = s"$bigDir/store_rebucket_flat"
    val bucketOut = s"$bigDir/store_rebucket_8"
    build(flatOut); build(bucketOut)
    val hot = evf.groupBy("space", "grouping").count()
      .orderBy(desc("count")).head()
    val (sp, gr) = (hot.getString(0), hot.getString(1))
    def pinned(out: String): Long = engine.EventStore.scan(
      engine.EsdbWriter.readOrdered(spark, out), sp, gr)
      .queryExecution.toRdd.count()
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    // the maintenance-cost half: a full compaction of the hot space is
    // ONE task flat (a single sorted file to produce) but `subparts`
    // tasks re-bucketed — the write parallelism the layout change buys
    val tCompactFlat = time(engine.EsdbWriter.compact(spark, flatOut))
    val tCompact8 = time(engine.EsdbWriter.compact(spark, bucketOut, subparts = Some(8)))
    require(engine.EsdbWriter.subpartsOf(conf,
      engine.Publish.resolve(conf, bucketOut)) == 8, "_SUBPARTS must be rewritten")
    // the read half: a grouping-pinned scan opens the whole space flat
    // (sorted layout: row-group stats still skip inside it) vs one
    // bucket (1/8 of the files AND bytes even before row-group stats)
    pinned(flatOut): Unit; pinned(bucketOut): Unit // warm
    val rowsFlat = pinned(flatOut)
    val rowsBucketed = pinned(bucketOut)
    require(rowsFlat == rowsBucketed,
      s"re-bucket changed a pinned scan's rows: $rowsFlat != $rowsBucketed")
    val tFlat = math.min(time(pinned(flatOut): Unit), time(pinned(flatOut): Unit))
    val tBucketed = math.min(time(pinned(bucketOut): Unit), time(pinned(bucketOut): Unit))
    println(f"${"compact_hot_flat"}%-24s $tCompactFlat%8.2f  (subparts stays 1: one write task)")
    println(f"${"compact_hot_rebucket_8"}%-24s $tCompact8%8.2f  flat/rebucket=${tCompactFlat / tCompact8}%4.2f (8 write tasks)")
    println(f"${"pinned_scan_flat"}%-24s $tFlat%8.2f  ($rowsFlat rows of $sp/$gr)")
    println(f"${"pinned_scan_rebucketed"}%-24s $tBucketed%8.2f  flat/rebucketed=${tFlat / tBucketed}%4.2f")
  }

  /** Versioned-append carry cost (r13): with `cdc=true` routing every
    * catalog INSERT through [[engine.EsdbWriter.appendVersioned]], the
    * predecessor carry must be metadata-priced or frequent small
    * INSERTs pay O(store bytes) per statement. Data files now carry as
    * HARD LINKS on the local FS (server-side COPY on object stores):
    * this times a 100-row versioned append onto the 10× store and
    * reports the carried byte volume the link spared.
    */
  private def carryCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    val conf = spark.sparkContext.hadoopConfiguration
    val out = s"$bigDir/store_carry"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(out)).deleteRecursively()
    val evf = engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir))
    engine.Publish.publish(conf, out, keepVersions = 4) { tmp =>
      engine.EsdbWriter.write(evf, tmp)
    }: Unit
    val root = new org.apache.hadoop.fs.Path(engine.Publish.resolve(conf, out))
    val fs = root.getFileSystem(conf)
    def bytes(p: org.apache.hadoop.fs.Path): Long =
      fs.getContentSummary(p).getLength
    val storeBytes = bytes(root)
    val batch = evf.limit(100).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    batch.count(): Unit
    val t0 = System.nanoTime()
    engine.EsdbWriter.appendVersioned(batch, out, keepVersions = 4)
    val t = (System.nanoTime() - t0) / 1e9
    batch.unpersist()
    require(engine.EsdbWriter.read(spark, out).count() == evf.count() + 100)
    println(f"${"store_bytes_carried"}%-24s ${storeBytes / 1e6}%8.1f MB (linked, not copied)")
    println(f"${"append_versioned_100row"}%-24s $t%8.2f s (O(files) links + one 100-row write)")
    // ---- manifest mode: the link-refusing-filesystem path (HDFS/S3) ----
    // Same 10× store, carry.mode=manifest: the new version dir must
    // physically hold ONLY the appended batch + sidecars — commit cost
    // O(changed), no links, no byte copies. This is the mode `auto`
    // picks on every non-raw-local filesystem.
    val out2 = s"$bigDir/store_carry_manifest"
    new Directory(new java.io.File(out2)).deleteRecursively()
    conf.set(engine.Carry.ModeKey, "manifest")
    try {
      engine.Publish.publish(conf, out2, keepVersions = 4) { tmp =>
        engine.EsdbWriter.write(evf, tmp)
      }: Unit
      val base = bytes(new org.apache.hadoop.fs.Path(engine.Publish.resolve(conf, out2)))
      val batch2 = evf.limit(100).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch2.count(): Unit
      val t1 = System.nanoTime()
      engine.EsdbWriter.appendVersioned(batch2, out2, keepVersions = 4)
      val tm = (System.nanoTime() - t1) / 1e9
      batch2.unpersist()
      val head = new org.apache.hadoop.fs.Path(engine.Publish.resolve(conf, out2))
      val newBytes = bytes(head)
      require(engine.EsdbWriter.read(spark, out2).count() == evf.count() + 100)
      require(newBytes < base / 10,
        f"manifest-mode commit materialized ${newBytes / 1e6}%.1f MB of a ${base / 1e6}%.1f MB store — not O(changed)")
      println(f"${"manifest_commit_bytes"}%-24s ${newBytes / 1e6}%8.3f MB physical in the new version (store ${base / 1e6}%.0f MB)")
      println(f"${"manifest_append_100row"}%-24s $tm%8.2f s (O(changed): one _CARRY + one 100-row write)")
    } finally conf.unset(engine.Carry.ModeKey)
  }

  /** IVF operating curve (r13): recall@10 at partial probes vs the
    * full probe (nProbe = nLists, exact over the index by
    * construction), at 1× and 10× corpus volume — the honesty row that
    * turns the ANN family's exactness certificate
    * (`similarity_ivf_full_probe`) into an operating curve a user can
    * pick nProbe from. Asserted: recall@10 at the DEFAULT nProbe=4
    * stays ≥ 0.4 at both scales on the fixture (synthetic near-uniform
    * embeddings are IVF's adversarial case — real corpora cluster).
    */
  private def recallCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/embeddings.parquet").exists())
      replicate(engine.Tables.embeddings(spark, sfDir), Seq("vec_id"), s"$bigDir/embeddings.parquet")
    import scala.reflect.io.Directory
    println(f"${"scale"}%-6s ${"nProbe"}%7s ${"recall@10"}%10s")
    for ((label, dir) <- Seq(("1x", sfDir), ("10x", bigDir))) {
      val emb = engine.Tables.embeddings(spark, dir).where(col("embedding").isNotNull)
      val idx = s"$bigDir/ivf_recall_$label"
      new Directory(new java.io.File(idx)).deleteRecursively()
      ops.Ivf.ensureIndex(emb, idx, nLists = 16)
      val queries = emb.where(pmod(col("vec_id"), lit(101)) === 7).limit(64)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def topk(nProbe: Int): Map[Long, Set[Long]] =
        ops.Ivf.ivfTopKIndexed(spark, idx, queries, k = 10, nProbe = nProbe)
          .select("query_id", "neighbor_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val truth = topk(16) // full probe: exact over the index
      for (nProbe <- Seq(4, 8, 16)) {
        val got = if (nProbe == 16) truth else topk(nProbe)
        val recall = truth.toSeq.map { case (q, t) =>
          got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / math.max(1, t.size)
        }.sum / math.max(1, truth.size)
        println(f"$label%-6s $nProbe%7d $recall%10.3f")
        if (nProbe == 4) require(recall >= 0.4,
          f"recall@10 at the default nProbe=4 fell to $recall%.3f at $label")
      }
      queries.unpersist(): Unit
    }
    // ---- clustered fixture at realistic nLists (r14) ----
    // The rows above cover IVF's ADVERSARIAL case (near-uniform) and an
    // inflated one (10x replicate). This is the regime IVF exists for:
    // a gaussian mixture with clusters >> nLists, at nLists = 64 (tiny
    // toy indexes stop at 16), probed at the RECALL-CONTRACT operating
    // point a 0.9 build target selects — the r14 contract path end to
    // end, asserted >= 0.9 against the full probe on fresh queries.
    import spark.implicits._
    val nClusters = 512
    val dim = 32
    val perCluster = 64
    val rng = new scala.util.Random(11)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rng.nextGaussian().toFloat * 5f))
    val mixture = (0 until nClusters * perCluster).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => x + rng.nextGaussian().toFloat * 0.3f).toSeq)
    }.toDF("vec_id", "embedding")
      .repartition(32).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    mixture.count(): Unit
    val idx = s"$bigDir/ivf_recall_clustered"
    new Directory(new java.io.File(idx)).deleteRecursively()
    val t0 = System.nanoTime()
    ops.Ivf.ensureIndex(mixture, idx, nLists = 64, recallTarget = Some(0.9))
    val buildS = (System.nanoTime() - t0) / 1e9
    val conf = spark.sparkContext.hadoopConfiguration
    val chosen = ops.Ivf.defaultProbes(conf, idx).getOrElse(64)
    val fresh = mixture.where(pmod(xxhash64(col("vec_id")), lit(97)) === 13).limit(64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def topkC(nProbe: Int): Map[Long, Set[Long]] =
      ops.Ivf.ivfTopKIndexed(spark, idx, fresh, k = 10, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truthC = topkC(64)
    val gotC = topkC(chosen)
    val recallC = truthC.toSeq.map { case (q, t) =>
      gotC.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / math.max(1, t.size)
    }.sum / math.max(1, truthC.size)
    println(f"${"clustered(512c,64L)"}%-20s probes=$chosen%-3d recall@10=$recallC%6.3f build=$buildS%.1fs")
    require(chosen < 64, s"0.9 contract on clustered data must not need the full probe: $chosen")
    require(recallC >= 0.9,
      f"contract-chosen probes=$chosen recalls $recallC%.3f < 0.9 on fresh clustered queries")
    fresh.unpersist(): Unit
    mixture.unpersist(): Unit
  }

  /** Cluster-sharpness drift evidence (r13, [[engine.ClusterHealth]]):
    * a value-clustered store at 10× volume accumulates full-domain
    * appends (each batch re-draws range cuts from ITSELF, so its files
    * overlap every earlier batch's), then `maintain` re-clusters when
    * the overlap factor passes the declared threshold. Times a narrow
    * value-band DELETE's footprint proxy — the files a footer check
    * admits — before and after the repair, which is exactly what the
    * overlap factor prices.
    */
  private def driftCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    val conf = spark.sparkContext.hadoopConfiguration
    val out = s"$bigDir/store_drift"
    import scala.reflect.io.Directory
    new Directory(new java.io.File(out)).deleteRecursively()
    val evf = engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir))
    val parts = evf.withColumn("slice", pmod(col("event_id"), lit(5)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    engine.Publish.publish(conf, out) { tmp =>
      engine.EsdbWriter.write(parts.where(col("slice") === 0).drop("slice"), tmp,
        clusterBy = Seq("value"), clusterChunks = 16)
    }: Unit
    val freshOverlap = engine.ClusterHealth.worstOverlap(spark, out).getOrElse(1.0)
    // 4 appends, each spanning the WHOLE value domain — worst drift
    (1 to 4).foreach { k =>
      engine.EsdbWriter.append(parts.where(col("slice") === k).drop("slice"), out)
    }
    parts.unpersist()
    val driftedOverlap = engine.ClusterHealth.worstOverlap(spark, out).getOrElse(1.0)
    def bandScan(): Long = {
      // a 5%-of-domain value band: on a sharp clustering this opens
      // ~5% of files; drifted, every overlapping file opens
      val df = engine.EsdbWriter.read(spark, out)
      df.where(col("value") >= 0.0 && col("value") < 0.05 * 1000)
        .queryExecution.toRdd.count()
    }
    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    bandScan(): Unit // warm
    val rowsDrifted = bandScan()
    val tDrifted = math.min(time(bandScan(): Unit), time(bandScan(): Unit))
    engine.Maintenance.setPolicy(conf, out, engine.Maintenance.Policy(
      keepVersions = 1, reclusterOverlapX100 = Some(200L)))
    val t0 = System.nanoTime()
    val actions = engine.Maintenance.maintain(spark, out)
    val tRepair = (System.nanoTime() - t0) / 1e9
    require(actions.contains("recluster"), s"maintain must fire past threshold: $actions")
    val repairedOverlap = engine.ClusterHealth.worstOverlap(spark, out).getOrElse(1.0)
    bandScan(): Unit // warm the new layout
    val rowsRepaired = bandScan()
    require(rowsDrifted == rowsRepaired, s"repair changed rows: $rowsDrifted != $rowsRepaired")
    val tRepaired = math.min(time(bandScan(): Unit), time(bandScan(): Unit))
    require(!engine.Maintenance.maintain(spark, out).contains("recluster"),
      "second maintain must converge")
    println(f"${"overlap_fresh"}%-24s $freshOverlap%8.2f  (expected files per point lookup)")
    println(f"${"overlap_drifted"}%-24s $driftedOverlap%8.2f  (after 4 full-domain appends)")
    println(f"${"overlap_repaired"}%-24s $repairedOverlap%8.2f  (maintain recluster, $tRepair%.2fs one-time)")
    println(f"${"band_scan_drifted"}%-24s $tDrifted%8.2f  ($rowsDrifted rows)")
    println(f"${"band_scan_repaired"}%-24s $tRepaired%8.2f  drifted/repaired=${tDrifted / tRepaired}%4.2f")
  }

  /** Hot-key evidence for [[ops.Skew.saltedTails]]: a replica of the
    * 10× events where 90% of rows carry ONE index value — the worst
    * realistic shape for a per-index-value aggregate — timed through
    * the plain partial-agg tails and the salted two-phase tails, with
    * a result-equality assert. Published to SCALE.md with the measured
    * switch guidance.
    */
  private def skewCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    val skewPath = s"$bigDir/events_skew.parquet"
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    if (!new java.io.File(skewPath).exists()) {
      engine.Tables.events(spark, bigDir)
        .withColumn("props",
          when(pmod(col("event_id"), lit(10)) < 9, lit("""{"k": 7}"""))
            .otherwise(col("props")))
        .write.mode(SaveMode.Overwrite).parquet(skewPath)
    }
    def ev = engine.EventFrame.fromEvents(
      engine.GraftSession.tune(spark).read.parquet(skewPath))
    def time(salted: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = if (salted) ops.Skew.saltedTails(ev, "k") else engine.EventLog.tails(ev, "k")
      df.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // results must be identical before the timings mean anything
    val plainRows = engine.EventLog.tails(ev, "k").collect().map(_.toSeq).toSeq
    val saltedRows = ops.Skew.saltedTails(ev, "k").collect().map(_.toSeq).toSeq
    require(plainRows == saltedRows, "salted tails diverged from plain tails on the skewed replica")
    time(salted = false); time(salted = true) // warm
    val tPlain = math.min(time(salted = false), time(salted = false))
    val tSalted = math.min(time(salted = true), time(salted = true))
    println(f"${"tails_skew90_plain"}%-24s $tPlain%8.2f")
    println(f"${"tails_skew90_salted"}%-24s $tSalted%8.2f  salted/plain=${tSalted / tPlain}%4.2f")
  }

  /** Per-round flatness of BPE training at REAL merge counts: round r
    * used to carry r chained maps over the word table (O(R²) total);
    * the periodic local checkpoint restarts the lineage, so total cost
    * must scale ~linearly in the merge count. Timed at 30 vs 110
    * merges — linear predicts ratio ≈ 3.7; quadratic would be ≈ 13.
    */
  private def bpeCheck(spark: SparkSession, sfDir: String): Unit = {
    val docs = engine.Tables.documents(spark, sfDir)
    def time(merges: Int): Double = {
      val t0 = System.nanoTime()
      ops.TextOps.bpeTrain(docs, numMerges = merges).queryExecution.toRdd.count()
      val e = (System.nanoTime() - t0) / 1e9
      ops.Caches.clear()
      e
    }
    time(10) // warm
    val t30 = time(30)
    val t110 = time(110)
    println(f"${"bpe_30_merges"}%-24s $t30%8.2f")
    println(f"${"bpe_110_merges"}%-24s $t110%8.2f  ratio=${t110 / t30}%4.2f (linear=3.7)")
  }

  /** Hot-SPACE evidence for the SPJ skew lever (`option("skewSplit")`
    * + partially-clustered distribution): a store where 90% of rows
    * live in ONE space, spread over several files by appends. A plain
    * storage-partitioned join serializes that space into one task; the
    * split scan keeps its file chunks as separate same-key partitions
    * and SPJ replicates the dim side's groups instead of shuffling —
    * timed both ways, with a result-equality assert. Published to
    * SCALE.md.
    */
  private def spjSkewCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    if (!new java.io.File(s"$bigDir/events.parquet").exists())
      replicate(engine.Tables.events(spark, sfDir), Seq("event_id"), s"$bigDir/events.parquet")
    val ev = engine.EventFrame.fromEvents(engine.Tables.events(spark, bigDir))
      .withColumn("space",
        when(pmod(col("event_id"), lit(10)) < 9, lit("hot")).otherwise(col("space")))
    val storeA = s"$bigDir/spj_hot_store"
    val storeB = s"$bigDir/spj_dim_store"
    if (!new java.io.File(storeA).exists()) {
      // eight appended slices → several files per space (chunks to split)
      val sliced = ev.withColumn("slice", pmod(col("event_id"), lit(8)))
      engine.EsdbWriter.write(sliced.filter(col("slice") === 0).drop("slice"), storeA)
      (1 to 7).foreach(i =>
        engine.EsdbWriter.append(sliced.filter(col("slice") === i).drop("slice"), storeA))
    }
    if (!new java.io.File(storeB).exists()) {
      // one dim row per space: the join fans out 1:1
      val dim = ev.groupBy("space").agg(count(lit(1)).cast("double").as("value"))
        .withColumn("grouping", lit("dim")).withColumn("ts_us", lit(0L))
        .withColumn("event_id", lit(1L)).withColumn("payload", lit("{}"))
        .select("space", "grouping", "ts_us", "event_id", "value", "payload")
      engine.EsdbWriter.write(dim, storeB)
    }
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SPJ/SMJ path
    try {
      def joined(split: Boolean) = {
        val rd = spark.read.format("esdb")
        val a = (if (split) rd.option("skewSplit", (8L * 1024 * 1024).toString) else rd)
          .load(storeA).select("space", "event_id", "value")
        val b = spark.read.format("esdb").load(storeB)
          .select(col("space"), col("value").as("b_value"))
        a.join(b, "space").groupBy("space")
          .agg(count(lit(1)).as("n"), sum(round(col("value") * col("b_value"))).as("s"))
      }
      val plainRows = joined(split = false).collect().map(_.toSeq).toSet
      val splitRows = joined(split = true).collect().map(_.toSeq).toSet
      require(plainRows == splitRows, "skew-split SPJ diverged from the plain join")
      def time(split: Boolean): Double = {
        val t0 = System.nanoTime()
        joined(split).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      time(split = false); time(split = true) // warm
      val tPlain = math.min(time(split = false), time(split = false))
      val tSplit = math.min(time(split = true), time(split = true))
      println(f"${"spj_skew90_plain"}%-24s $tPlain%8.2f")
      println(f"${"spj_skew90_split"}%-24s $tSplit%8.2f  split/plain=${tSplit / tPlain}%4.2f")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
  }

  /** LSH bucket-cap evidence: the 10× replicate duplicates every
    * document body 10× — an adversarial duplicate flood where every
    * band bucket holds all copies, so uncapped candidate volume grows
    * with the SQUARE of the duplication factor (the one superlinear
    * term in the dedup family). The cap is set AT the flood size (8 <
    * 10 copies) so the mechanism engages at test scale; the production
    * default (1024) behaves identically against >1024-copy floods.
    * Expect: capped 10×/1× ratio well under the uncapped one, and the
    * bucket-stats bound linear in corpus size.
    */
  private def lshCapCheck(spark: SparkSession, sfDir: String, bigDir: String): Unit = {
    replicate(engine.Tables.documents(spark, sfDir), Seq("doc_id"), s"$bigDir/documents.parquet")
    def docs(dir: String) = engine.Tables.documents(spark, dir)
    def time(dir: String, cap: Int): Double = {
      val t0 = System.nanoTime()
      ops.Dedup.minhashNearDups(docs(dir), 0.8, bucketCap = cap)
        .queryExecution.toRdd.count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      ops.Caches.clear()
      elapsed
    }
    for (cap <- Seq(0, 8)) { time(sfDir, cap); time(bigDir, cap) } // warm
    println(f"${"variant"}%-24s ${"t_1x"}%8s ${"t_10x"}%8s ratio")
    for ((label, cap) <- Seq(("minhash_uncapped", 0), ("minhash_cap8", 8))) {
      val t1 = math.min(time(sfDir, cap), time(sfDir, cap))
      val t10 = math.min(time(bigDir, cap), time(bigDir, cap))
      println(f"$label%-24s $t1%8.2f $t10%8.2f ${t10 / t1}%5.1f")
    }
    val (nb, nover, uncapped, capped) = ops.Dedup.lshBucketStats(docs(bigDir), bucketCap = 8)
    println(s"buckets=$nb oversized=$nover pair_bound_uncapped=$uncapped pair_bound_cap8=$capped")
  }
}
