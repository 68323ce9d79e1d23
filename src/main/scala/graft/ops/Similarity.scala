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

  /** (vec_id, embedding, t, bucket, sig, notmask) rows across `tables`
    * LSH tables — `bucket` is table t's key; `sig` packs the row's key
    * in EVERY table into one long (cell i = bucket_i at bit offset
    * bits·i, requires tables·bits ≤ 64); `notmask` has 1s at every bit
    * of cells ≥ t (the row's own precomputed mask for
    * [[firstCollision]]).
    *
    * Runs as a per-partition kernel with the hyperplanes precomputed in
    * the task closure: the expression form (tables × bits typedlit
    * float-array literals, each under a vec_dot + when) made every
    * plan carry ~50 embedded 64-float constants, and Catalyst's
    * per-query analysis/canonicalization of those trees dominated the
    * runtime of the small-query case. The kernel math is identical
    * (sequential double accumulation, sign bit per plane).
    *
    * `sig`/`notmask` exist for [[firstCollision]]: a candidate pair
    * colliding in several tables must be emitted once, and the packed
    * cells let the join keep exactly the FIRST colliding table's row —
    * no distinct / dedup exchange of the pair stream at all (r16,
    * guide §2.4). Two longs per exploded row, dwarfed by the embedding
    * payload already on it. (A first form carried the bucket ARRAY and
    * tested the tables cells as separate conjuncts — at 16 tables the
    * 16-GetArrayItem join condition measured 3.6× slower than the
    * distinct it replaced on the 10× corpus; the packed-scalar test is
    * five bitwise ops regardless of table count.)
    */
  def withBuckets(embs: DataFrame, tables: Int = 8, bits: Int = 8, dims: Int = 64): DataFrame = {
    require(tables > 0 && bits > 1 && tables * bits <= 64,
      s"tables*bits must fit one packed long (got $tables x $bits); " +
        "widen cells or split tables across two sig columns to go bigger")
    val sp = embs.sparkSession
    VectorFunctions.register(sp)
    import sp.implicits._
    val planes: Array[Array[Float]] =
      Array.tabulate(tables * bits)(i => plane(i / bits, i % bits, dims).toArray)
    spread(embs.where(col("embedding").isNotNull).select(col("vec_id"), col("embedding")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.flatMap { case (id, vec) =>
          var sig = 0L
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
            sig |= bucket << (bits * t)
            t += 1
          }
          val cellMask = if (bits == 64) -1L else (1L << bits) - 1
          val s = sig
          (0 until tables).iterator.map { t =>
            (id, vec, t, (s >>> (bits * t)) & cellMask, s, ~((1L << (bits * t)) - 1))
          }
        }
      }
      .toDF("vec_id", "embedding", "t", "bucket", "sig", "notmask")
  }

  /** TRUE iff table `t` is the FIRST table in which the two rows
    * collide: no cell below t of the packed sigs is equal. Joining LSH
    * sides on (t, bucket) and filtering with this predicate emits every
    * colliding pair EXACTLY once — replacing the post-join `distinct()`
    * (a full exchange + aggregation of the pair stream, in
    * [[annTopK]]'s case keyed on the float vectors themselves) with
    * five codegen'd bitwise ops, independent of the table count.
    *
    * Mechanics: x = lSig ^ rSig has a ZERO cell exactly where the two
    * rows' buckets agree. `x | notmask` forces every cell ≥ t to
    * non-zero (notmask is the row's own precomputed ≥t mask; both
    * sides carry identical t, either's works), then the standard
    * zero-cell probe — (v − ONES) & ~v & HIGHS, with ONES/HIGHS the
    * per-cell LSB/MSB constants — is non-zero iff some cell < t is
    * zero. Existence detection is exact for any cell width ≥ 2: with
    * no zero cell every cell ≥ 1, so the subtraction never borrows and
    * each result cell (orig−1)'s top bit survives `& ~v` only if orig
    * had its top bit clear while orig−1 set it — impossible for
    * orig ≥ 1 in a ≥2-bit cell; a zero cell borrows to 0xF… with the
    * top bit set and ~v keeping it.
    */
  private[ops] def firstCollision(tables: Int, bits: Int,
                                  lSig: Column, rSig: Column,
                                  notmask: Column): Column = {
    var ones = 0L
    var i = 0
    while (i < tables) { ones |= 1L << (bits * i); i += 1 }
    val highs = ones << (bits - 1)
    val v = lSig.bitwiseXOR(rSig).bitwiseOR(notmask)
    ((v - lit(ones)).bitwiseAND(bitwise_not(v)).bitwiseAND(lit(highs))) === 0L
  }

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
      .withColumnRenamed("sig", "csig").drop("notmask")
    val qb = broadcast(withBuckets(queries, tables, bits)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"), col("t"), col("bucket"),
        col("sig").as("qsig"), col("notmask")))
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
        firstCollision(tables, bits, col("csig"), col("qsig"), col("notmask")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("embedding")) / (col("qn") * col("cn"))).as("cos"))
    topK(scored, k)
  }
}
