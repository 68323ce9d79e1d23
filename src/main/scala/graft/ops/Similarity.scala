package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

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
  * The inner loop is [[graft.functions.VecDot]] — a codegen'd primitive
  * float loop (the built-in zip_with/aggregate route is interpreted and
  * measured ~20× slower in the pair-scoring stage). Norms are
  * precomputed per row before any join, so each candidate pair costs
  * exactly one dot product.
  *
  * LSH hyperplanes are deterministic ±1 sign vectors generated
  * driver-side (splitmix64) and embedded as float-array literals: the
  * bucket bits are plain vec_dot calls against constants.
  */
object Similarity {

  /** dot(a, b) via the native [[graft.functions.VecDot]] expression.
    * Callers must have registered [[VectorFunctions]] on the session
    * (all public operators here do).
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def spread(df: DataFrame): DataFrame = {
    VectorFunctions.register(df.sparkSession)
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
  }

  /** splitmix64 — tiny deterministic PRNG for reproducible hyperplanes. */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** ±1 sign hyperplane for (table, bit), `dims` components. */
  private def plane(table: Int, bit: Int, dims: Int): Seq[Float] =
    (0 until dims).map { i =>
      if ((splitmix64(table.toLong * 1000003 + bit.toLong * 8191 + i) & 1L) == 0L) 1.0f else -1.0f
    }

  /** (vec_id, embedding, t, bucket, buckets) rows across `tables` LSH
    * tables — `bucket` is table t's key, `buckets` the row's key in
    * EVERY table (the per-vector array computed once and shared by all
    * t rows).
    *
    * Runs as a per-partition kernel with the hyperplanes precomputed in
    * the task closure: the expression form (tables × bits typedlit
    * float-array literals, each under a vec_dot + when) made every
    * plan carry ~50 embedded 64-float constants, and Catalyst's
    * per-query analysis/canonicalization of those trees dominated the
    * runtime of the small-query case. The kernel math is identical
    * (sequential double accumulation, sign bit per plane).
    *
    * `buckets` exists for [[firstCollision]]: a candidate pair
    * colliding in several tables must be emitted once, and the arrays
    * let the join keep exactly the FIRST colliding table's row — no
    * distinct / dedup exchange of the pair stream at all (r16, guide
    * §2.4). Cost: `tables` extra longs per exploded row, dwarfed by the
    * embedding payload already on it.
    */
  def withBuckets(embs: DataFrame, tables: Int = 8, bits: Int = 8, dims: Int = 64): DataFrame = {
    val sp = embs.sparkSession
    VectorFunctions.register(sp)
    import sp.implicits._
    val planes: Array[Array[Float]] =
      Array.tabulate(tables * bits)(i => plane(i / bits, i % bits, dims).toArray)
    spread(embs.where(col("embedding").isNotNull).select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, vec) =>
          val barr = new Array[Long](tables)
          var t = 0
          while (t < tables) {
            var bucket = 0L
            var b = 0
            while (b < bits) {
              val p = planes(t * bits + b)
              val n = math.min(vec.length, p.length)
              var acc = 0.0d
              var i = 0
              while (i < n) { acc += vec(i).toDouble * p(i).toDouble; i += 1 }
              if (acc >= 0) bucket |= (1L << b)
              b += 1
            }
            barr(t) = bucket
            t += 1
          }
          (0 until tables).iterator.map(t => (id, vec, t, barr(t), barr))
        }
      }
      .toDF("vec_id", "embedding", "t", "bucket", "buckets")
  }

  /** TRUE iff table `t` is the FIRST table in which the two rows'
    * bucket arrays collide: for every earlier table i < t the keys
    * differ. Joining LSH sides on (t, bucket) and filtering with this
    * predicate emits every colliding pair EXACTLY once — replacing the
    * post-join `distinct()` (a full exchange + aggregation of the pair
    * stream, in [[annTopK]]'s case keyed on the float vectors
    * themselves) with a codegen'd per-row boolean over ≤ `tables`
    * array cells. Both sides carry identical `t`; either's works.
    */
  private[ops] def firstCollision(tables: Int, t: Column,
                                  lBuckets: Column, rBuckets: Column): Column =
    (0 until tables).map { i =>
      lit(i) >= t || lBuckets.getItem(i) =!= rBuckets.getItem(i)
    }.reduce(_ && _)

  /** Per-query top-k of scored candidates via the [[graft.functions.TopKByScore]]
    * heap aggregate: map-side partial combine keeps k candidates per
    * query per task, where the window-function form
    * (`row_number() OVER (... ORDER BY cos DESC)`) shuffles and sorts
    * every scored pair. Selection and tie order ((cos desc,
    * neighbor_id asc)) are identical; floor (not cast-truncation,
    * which rounds toward zero on negative cosines) keeps the
    * fixed-point value engine-neutral for the oracle.
    */
  private[ops] def topK(scored: DataFrame, k: Int): DataFrame = {
    graft.functions.SampleFunctions.register(scored.sparkSession)
    scored.groupBy("query_id")
      .agg(call_function("top_k_by_score", col("cos"), col("neighbor_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("query_id"), (col("i") + 1).cast("long").as("rank"),
        col("t.payload").as("neighbor_id"),
        floor(col("t.score") * 1000000).cast("long").as("cos_x1e6"))
      .orderBy("query_id", "rank")
  }

  /** Exact cosine top-k: `queries` (small, broadcast) vs the corpus.
    * Null embeddings are excluded up front — the heap aggregate skips
    * null scores, so the exclusion is the declared contract rather
    * than an implementation accident.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = broadcast(queries.where(col("embedding").isNotNull)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = spread(corpus.where(col("embedding").isNotNull)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id")) // broadcast nested loop
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topK(scored, k)
  }

  /** ANN top-k: score only same-bucket (any table) candidates. Recall is
    * tuned by (tables, bits); verified against [[bruteTopK]] in tests.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              tables: Int = 8, bits: Int = 4): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val cb = withBuckets(corpus, tables, bits).withColumn("cn", norm(col("embedding")))
      .withColumnRenamed("buckets", "cbuckets")
    val qb = broadcast(withBuckets(queries, tables, bits)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"), col("t"), col("bucket"),
        col("buckets").as("qbuckets")))
    // A (query, candidate) pair colliding in several tables must score
    // once. r15 deduped with a distinct over the full candidate row —
    // whose hash keys were the two FLOAT VECTORS themselves, so the
    // dedup exchange shuffled every candidate pair's qv+cv payload
    // (~0.5 KB/pair at 64 dims) and hashed float arrays. r16 (guide
    // §2.3/§2.4: shuffle keys, not payloads; remove the exchange):
    // [[firstCollision]] keeps exactly one colliding row per pair at
    // the join itself, so the pair stream flows straight into the
    // top-k heap aggregate — one dot per pair, no dedup exchange.
    val scored = cb.join(qb, Seq("t", "bucket"))
      .where(col("query_id") =!= col("vec_id") &&
        firstCollision(tables, col("t"), col("cbuckets"), col("qbuckets")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("embedding")) / (col("qn") * col("cn"))).as("cos"))
    topK(scored, k)
  }
}
