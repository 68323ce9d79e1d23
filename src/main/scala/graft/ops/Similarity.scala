package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`), for the
  * `embeddings` table (`vec_id, embedding[64], label`).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k. Query side is broadcast, so the
  *    corpus is scanned exactly once with no corpus shuffle — the right
  *    baseline even at 100 TB when the query set is small.
  *  - [[annTopK]]: random-hyperplane LSH buckets; only same-bucket pairs
  *    are scored. The scale path when the query set is itself large.
  *
  * Dot products are `zip_with` + `aggregate` column expressions — no
  * UDFs, no driver collect. LSH hyperplanes are deterministic
  * pseudo-random ±1 sign vectors generated driver-side (splitmix64) and
  * embedded as array literals: per row the bucket computation is pure
  * multiply-add, no hashing.
  */
object Similarity {

  /** dot(a, b) as a single column expression. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** splitmix64 — tiny deterministic PRNG for reproducible hyperplanes. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** ±1 sign hyperplane for (table, bit), `dims` components. */
  private def plane(table: Int, bit: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      if ((splitmix64(table.toLong * 1000003 + bit.toLong * 8191 + i) & 1L) == 0L) 1.0 else -1.0
    }

  /** Bucket id for one LSH table: `bits` sign-bits of hyperplane dots. */
  private def bucketExpr(vec: Column, table: Int, bits: Int, dims: Int): Column =
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(vec, typedlit(plane(table, b, dims)), (x, s) => x * s),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** (vec_id, embedding, t, bucket) rows across `tables` LSH tables. */
  def withBuckets(embs: DataFrame, tables: Int = 8, bits: Int = 8, dims: Int = 64): DataFrame = {
    val buckets = array((0 until tables).map { t =>
      struct(lit(t).as("t"), bucketExpr(col("embedding"), t, bits, dims).as("bucket"))
    }: _*)
    spread(embs).select(col("vec_id"), col("embedding"), explode(buckets).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
  }

  /** Exact cosine top-k: `queries` (small, broadcast) vs the corpus. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val scored = spread(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")))
      .join(q, col("query_id") =!= col("neighbor_id")) // broadcast nested loop; corpus scanned once
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (col("cos") * 1000000).cast("long").as("cos_x1e6"))
      .orderBy("query_id", "rank")
  }

  /** ANN top-k: score only same-bucket (any table) candidates. Recall is
    * tuned by (tables, bits); verified against [[bruteTopK]] in tests.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              tables: Int = 8, bits: Int = 4): DataFrame = {
    val cb = withBuckets(corpus, tables, bits)
    val qb = broadcast(withBuckets(queries, tables, bits)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("t"), col("bucket")))
    val cand = cb.join(qb, Seq("t", "bucket"))
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .distinct()
    val scored = cand.withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (col("cos") * 1000000).cast("long").as("cos_x1e6"))
      .orderBy("query_id", "rank")
  }
}
