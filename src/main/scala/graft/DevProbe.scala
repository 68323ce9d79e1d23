package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

    import graft.ops.Similarity
    val embs = graft.engine.Tables.embeddings(spark, sfDir)
    val tables = 16; val bits = 4
    val threshold = 0.35
    def bucketed() =
      Similarity.withBuckets(embs.select(col("vec_id"), col("embedding")), tables, bits, 64)
        .withColumn("nrm", Similarity.norm(col("embedding")))

    def vOld(): DataFrame = { // r15 shape re-created on the new schema
      val b = bucketed().drop("sig", "notmask")
      val l = b.as("l"); val r = b.as("r")
      l.join(r, col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
          (Similarity.dot(col("l.embedding"), col("r.embedding"))
            / (col("l.nrm") * col("r.nrm"))).as("cos"))
        .where(col("cos") >= threshold)
        .select(col("a"), col("b"), floor(col("cos") * 1000000).cast("long").as("cos_x1e6"))
        .distinct()
        .orderBy("a", "b")
    }
    def vNew(): DataFrame =
      graft.ops.Dedup.embeddingNearDups(embs, threshold, tables, bits, 64)
    def fc(lSig: org.apache.spark.sql.Column, rSig: org.apache.spark.sql.Column,
           notmask: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      var ones = 0L
      var i = 0
      while (i < tables) { ones |= 1L << (bits * i); i += 1 }
      val highs = ones << (bits - 1)
      val v = lSig.bitwiseXOR(rSig).bitwiseOR(notmask)
      ((v - lit(ones)).bitwiseAND(bitwise_not(v)).bitwiseAND(lit(highs))) === 0L
    }
    def vNoDot(): DataFrame = { // candidate enumeration + bit test only, NO dot
      val b = bucketed()
      val l = b.as("l"); val r = b.as("r")
      l.join(r, col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id") &&
          fc(col("l.sig"), col("r.sig"), col("l.notmask")))
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
    }
    def vNoBit(): DataFrame = { // candidates + dot, NO bit test (old minus distinct)
      val b = bucketed()
      val l = b.as("l"); val r = b.as("r")
      val pairCos = Similarity.dot(col("l.embedding"), col("r.embedding")) /
        (col("l.nrm") * col("r.nrm"))
      l.join(r, col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id") && pairCos >= threshold)
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
    }
    def vEnum(): DataFrame = { // pure candidate enumeration
      val b = bucketed()
      val l = b.as("l"); val r = b.as("r")
      l.join(r, col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
    }

    def vNewBare(): DataFrame = { // full new condition, bare (a,b) select, no sort
      val b = bucketed()
      val l = b.as("l"); val r = b.as("r")
      val pairCos = Similarity.dot(col("l.embedding"), col("r.embedding")) /
        (col("l.nrm") * col("r.nrm"))
      l.join(r, col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id") &&
          fc(col("l.sig"), col("r.sig"), col("l.notmask")) && pairCos >= threshold)
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"))
    }
    def vNewNoSort(): DataFrame = { // new with floor select, no orderBy
      val b = bucketed()
      val l = b.as("l"); val r = b.as("r")
      val pairCos = Similarity.dot(col("l.embedding"), col("r.embedding")) /
        (col("l.nrm") * col("r.nrm"))
      l.join(r, col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id") &&
          fc(col("l.sig"), col("r.sig"), col("l.notmask")) && pairCos >= threshold)
        .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
          floor(pairCos * 1000000).cast("long").as("cos_x1e6"))
    }
    val variants = Seq(
      "enum only (no condition)" -> (() => vEnum()),
      "enum + bit test" -> (() => vNoDot()),
      "enum + dot" -> (() => vNoBit()),
      "new bare (cond only, no floor/sort)" -> (() => vNewBare()),
      "new no sort (floor, no orderBy)" -> (() => vNewNoSort()),
      "old (distinct)" -> (() => vOld()),
      "new (packed firstCollision + reorder)" -> (() => vNew()))
    variants.foreach { case (_, f) => force(f()); graft.ops.Caches.clear() }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      variants.foreach { case (n, f) =>
        time(n)(force(f()))
        graft.ops.Caches.clear()
      }
    }
    spark.stop()
  }
}
