package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement probe for the r15 optimization round — times
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

    val e = engine.Tables.embeddings(spark, sfDir)
    force(e.select(count(lit(1)))) // warm scan

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val (a1, _) = time(s"buildIndex default (5 iter, kmeans||)")(
        ops.Ivf.buildIndex(e, nLists = 16))
      time("  force assigned")(force(a1))
      val (a2, _) = time(s"buildIndex cheap (1 iter, random)")(
        ops.Ivf.buildIndex(e, nLists = 16, maxIter = 1, initMode = "random"))
      time("  force assigned")(force(a2))
      val q = e.where(col("vec_id") < 10)
      val full = ops.Ivf.ivfTopK(e, q, 10, nLists = 16, nProbe = 16)
      time("full ivfTopK (build+probe)")(force(full))
      ops.Caches.clear()
    }
    spark.stop()
  }
}
