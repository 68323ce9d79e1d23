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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bigDir = "/tmp/graft_scale"
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
      "events_sessionize",      // window functions
      "events_asof_join",       // union-window asof
      "q1_lineitem_agg",        // wide fact aggregation
      "dedup_exact",            // hash-group dedup
      "dedup_minhash",          // LSH banding self-join
      "similarity_topk",        // broadcast nested-loop scoring
      "text_vocab_topk")        // explode + count + top-k

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      val elapsed = (System.nanoTime() - t0) / 1e9
      ops.Caches.clear() // harness housekeeping stays outside the measurement
      elapsed
    }

    // warm both paths once so JIT/codegen is steady before measuring
    families.foreach { n => time(n, sfDir); time(n, bigDir) }
    println(f"${"query"}%-24s ${"t_1x"}%8s ${"t_10x"}%8s ratio")
    families.foreach { n =>
      val t1 = math.min(time(n, sfDir), time(n, sfDir))
      val t10 = math.min(time(n, bigDir), time(n, bigDir))
      println(f"$n%-24s $t1%8.2f $t10%8.2f ${t10 / t1}%5.1f")
    }

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
    spark.stop()
  }
}
