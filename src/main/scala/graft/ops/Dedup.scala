package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, over the
  * `documents` table.
  *
  * Scale design: every variant is
  *   per-row signature (one scan)
  *   → explode small blocking keys
  *   → self-equi-join on the blocking key (shuffle on key, AQE-skew-safe)
  *   → exact verify on the candidate pairs only.
  * No O(n²) step ever materializes; candidate volume is controlled by
  * the band/bit parameters.
  *
  * Execution note: signature computation (shingling, 64-permutation
  * MinHash, SimHash bit-voting) is per-partition imperative Scala
  * ([[DedupKernels]]) rather than nested `transform`/`aggregate`
  * column lambdas. Spark's higher-order functions are interpreted
  * (CodegenFallback) and Catalyst inlines the tokenizer into every
  * lambda element access, re-splitting the document once per array
  * element — measured quadratic blowup. A JIT-compiled per-partition
  * loop over xxhash64 is the idiomatic Spark escape hatch for exactly
  * this case; results stay deterministic (fixed hash seeds, no RNG).
  */
object Dedup {

  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  // --- exact --------------------------------------------------------------

  /** Exact dedup: group by content hash (md5), keep the smallest doc_id.
    * Hash-grouping shuffles 16-byte keys, not document bodies — the
    * difference between shuffling 100 TB and shuffling ~2 GB per 10^10
    * docs. (Collision risk of md5 on non-adversarial data ≪ task noise.)
    */
  def exact(docs: DataFrame): DataFrame =
    docs.select(md5(col("text")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select("keep_doc_id", "n_copies")
      .orderBy("keep_doc_id")

  // --- MinHash + LSH ------------------------------------------------------

  /** (doc_id, shash array<long>, bands array<long>): distinct shingle
    * hashes + LSH band keys per document, one pass, JIT-compiled.
    */
  def minhashSignatures(docs: DataFrame, bands: Int = 16, rowsPerBand: Int = 4,
                        shingleLen: Int = 3): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val sh = DedupKernels.shingleHashes(text, shingleLen)
          val sig = DedupKernels.minhashSig(sh, bands * rowsPerBand)
          (id, sh, DedupKernels.bandKeys(sig, bands, rowsPerBand))
        }
      }
      .toDF("doc_id", "shash", "bands")
  }

  /** Default per-(band, key) bucket bound for [[bandCandidates]]: far
    * above any bucket an honest corpus produces at the default band
    * config, low enough that a duplicate flood stays linear.
    */
  val DefaultBucketCap = 1024

  /** Candidate pairs (a < b) sharing at least one LSH band. The
    * self-join's two sides share one canonical plan, so the exchange is
    * computed once and reused; P(candidate) ≈ 1-(1-j^r)^b for Jaccard j.
    *
    * BUCKET CAP — the scale guard: a bucket of size m contributes
    * m(m-1)/2 candidate pairs, so Σ m² drives the join, and on a
    * duplicate-heavy corpus (the adversarial case: one document
    * repeated k times floods its bucket in EVERY band) the total goes
    * superlinear. Buckets larger than `bucketCap` are
    * deterministically SPLIT into ceil(m/cap) sub-buckets by doc_id
    * hash before the self-join, bounding each bucket's contribution by
    * O(m · cap) — candidate volume is linear in corpus size at a fixed
    * cap. Recall: a pair split apart in one band has b-1 independent
    * other bands to collide in (and sub-bucketing keeps ~cap/m of
    * same-bucket pairs even here); the residual loss is confined to
    * oversized buckets, which on real corpora are near-duplicate
    * floods that [[exact]] dedup and [[dedupClusters]]' transitive
    * closure already cover. `bucketCap <= 0` disables the cap.
    */
  private def bandCandidates(sigs: DataFrame,
                             bucketCap: Int = DefaultBucketCap): DataFrame = {
    val raw = sigs.select(col("doc_id"), posexplode(col("bands")).as(Seq("band", "bkey")))
    val buckets0 =
      if (bucketCap <= 0) raw.withColumn("sub", lit(0L))
      else {
        // bucket sizes via a WINDOW over the same (band, bkey) hash
        // partitioning the self-join below shuffles on anyway: the cap
        // costs one per-partition sort, never an extra exchange of the
        // exploded stream, and the window's output partitioning feeds
        // the join directly (HashPartitioning(band, bkey) satisfies
        // the join's (band, bkey, sub) clustering — sub is finer).
        // A broadcast-join form was measured 3x SLOWER at 10x: it
        // preserves the scan's partitioning, so the self-join must
        // re-shuffle the whole stream on the widened key.
        val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")
        raw.withColumn("bsz", count(lit(1)).over(w))
          .withColumn("sub",
            when(col("bsz") <= bucketCap, lit(0L))
              .otherwise(pmod(xxhash64(col("doc_id")),
                ceil(col("bsz").cast("double") / bucketCap).cast("long"))))
          .drop("bsz")
      }
    // persist the bucketed stream: the self-join's two sides would each
    // recompute the explode + exchange + sort + window subtree (AQE
    // builds the broadcast side from its own copy of the plan) — at
    // sf0.1 the window pass alone is ~0.35s of a ~0.9s candidate stage,
    // paid twice without this. One computation, both sides read the
    // cache; released by the caller's Caches.clear() like the sigs.
    val buckets = Caches.persist(buckets0)
    val l = buckets.as("l")
    val r = buckets.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
      col("l.sub") === col("r.sub") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
  }

  /** Diagnostic for the bucket cap: (buckets, oversized buckets,
    * candidate pairs without the cap, candidate pairs with it). The
    * "without" term is computed from bucket SIZES (Σ m(m-1)/2), not by
    * materializing the uncapped join.
    */
  def lshBucketStats(docs: DataFrame, bucketCap: Int = DefaultBucketCap,
                     bands: Int = 16, rowsPerBand: Int = 4): (Long, Long, Long, Long) = {
    val sigs = minhashSignatures(docs, bands, rowsPerBand)
    val sizes = sigs.select(posexplode(col("bands")).as(Seq("band", "bkey")))
      .groupBy("band", "bkey").agg(count(lit(1)).as("m"))
    val row = sizes.agg(
      count(lit(1)).as("nb"),
      sum(when(col("m") > bucketCap, 1L).otherwise(0L)).as("nover"),
      sum((col("m") * (col("m") - 1) / 2).cast("long")).as("uncapped"),
      // a split bucket lands ~cap-sized sub-buckets: bound the capped
      // volume by m/2 * cap per oversized bucket, exact below the cap
      sum(when(col("m") <= bucketCap, col("m") * (col("m") - 1) / 2)
        .otherwise(col("m") * lit(bucketCap) / 2).cast("long")).as("capped")).head()
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  /** Exact Jaccard over shingle-hash sets for candidate pairs only. */
  private def verifyJaccard(cand: DataFrame, sigs: DataFrame, threshold: Double): DataFrame = {
    val sh = sigs.select("doc_id", "shash")
    cand
      .join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("shash", "sh_a"), "a")
      .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("shash", "sh_b"), "b")
      .withColumn("jaccard_x1000",
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("long") * 1000
          / size(array_union(col("sh_a"), col("sh_b")))).cast("long"))
      .where(col("jaccard_x1000") >= (threshold * 1000).toLong)
      .select(col("a"), col("b"), col("jaccard_x1000"))
  }

  /** MinHash+LSH near-dup pairs at a Jaccard threshold. Signatures are
    * persisted across the candidate and verify stages (computed once)
    * and registered in [[Caches]] — callers release them via
    * `Caches.clear()` after materializing the result.
    */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.8,
                      bands: Int = 16, rowsPerBand: Int = 4,
                      bucketCap: Int = DefaultBucketCap): DataFrame =
    minhashNearDupsUnsorted(docs, threshold, bands, rowsPerBand, bucketCap)
      // shield the verify stage (two signature joins + exact Jaccard
      // over every candidate pair) from the output sort's
      // range-sampling pass, which re-executes its child when no
      // exchange sits in between (Dedup.embeddingNearDups has the full
      // story): one narrow exchange of surviving pairs, verify runs once
      .repartition(col("a"), col("b"))
      .orderBy("a", "b")

  /** [[minhashNearDups]] without the final global sort — the feed for
    * consumers that re-shuffle the pairs anyway ([[dedupClusters]]'
    * edge union), where an ORDER BY would buy nothing but a range
    * exchange + sort of the full pair stream.
    */
  private def minhashNearDupsUnsorted(docs: DataFrame, threshold: Double,
                                      bands: Int = 16, rowsPerBand: Int = 4,
                                      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val sigs = Caches.persist(minhashSignatures(docs, bands, rowsPerBand))
    verifyJaccard(bandCandidates(sigs, bucketCap), sigs, threshold)
  }

  /** Exact n-gram Jaccard pairs above `threshold`: LSH proposes, exact
    * verification disposes. Lower thresholds widen the band config
    * (more, shorter bands) instead of falling back to a cross join.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val (bands, rows) = if (threshold >= 0.7) (16, 4) else (32, 2)
    minhashNearDups(docs, threshold, bands, rows)
  }

  // --- SimHash ------------------------------------------------------------

  /** (doc_id, sig): 64-bit SimHash signatures, one pass per partition. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    spread(docs.select(col("doc_id"), col("text")))
      .as[(Long, String)]
      .mapPartitions(it => it.map { case (id, text) => (id, DedupKernels.simhash(text)) })
      .toDF("doc_id", "sig")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using
    * (maxHamming+1)-chunk blocking: by pigeonhole, any pair within the
    * requested Hamming radius agrees bit-for-bit on at least one chunk,
    * so recall is guaranteed for every maxHamming, not just the default
    * (a fixed 4-chunk split would silently miss pairs at radius >= 4).
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    simhashPairs(simhashSignatures(docs), maxHamming)

  /** Blocking + verify over precomputed (doc_id, sig) rows. */
  def simhashPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming must be in [0, 32) so each of the ${maxHamming + 1} chunks has >= 2 bits")
    val nChunks = maxHamming + 1
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    val chunkArr = array((0 until nChunks).map { c =>
      val start = bounds(c)
      val width = bounds(c + 1) - start
      val mask = if (width >= 64) -1L else (1L << width) - 1 // 1L<<64 would wrap
      shiftrightunsigned(col("sig"), start).bitwiseAND(lit(mask))
    }: _*)
    val chunks = sigs.select(col("doc_id"), col("sig"),
      posexplode(chunkArr).as(Seq("chunk", "ckey")))
    val l = chunks.as("l")
    val r = chunks.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") && col("l.ckey") === col("r.ckey") &&
      col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }

  // --- clustering: pairs → connected components → keep list ---------------

  /** Connected components over an undirected pair list (`a`, `b`) by
    * iterative min-label propagation: every node's label converges to
    * the smallest doc_id reachable from it. Each round is one
    * edge-join + min-aggregate (all shuffles on the node key); rounds
    * needed = graph diameter, which for near-dup clusters is tiny
    * (clusters are cliques or near-cliques from LSH banding). The loop
    * driver-side checks only a changed-count, never collects data.
    *
    * Output: (doc_id, cluster_id) with cluster_id = min doc_id of the
    * component. Nodes appearing in no pair are not listed (they are
    * their own singleton cluster by definition).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          localThreshold: Long = 1000000L): DataFrame = {
    val edges = Caches.persist(
      pairs.select(col("a").as("x"), col("b").as("y"))
        .union(pairs.select(col("b"), col("a")))
        .distinct())
    // size-aware strategy switch (same idea as broadcast-vs-shuffle
    // joins): near-dup pair graphs are a small fraction of the corpus
    // even at 100 TB, so below `localThreshold` edges a driver-side
    // union-find replaces the whole iterative job sequence — one
    // collect of (long, long) pairs instead of diameter-many
    // join+aggregate rounds. Above it, distributed min-label
    // propagation takes over unchanged.
    if (edges.count() / 2 <= localThreshold) {
      val sp = pairs.sparkSession
      import sp.implicits._
      // collect from the cached symmetric edge set (one direction);
      // x <= y keeps degenerate self-pairs, which must still yield a
      // singleton (a, a) label row exactly as the distributed branch does
      val es = edges.where(col("x") <= col("y")).as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val next = parent(c); parent(c) = r; c = next }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val ra = find(a)
        val rb = find(b)
        // union-by-min: the smaller root always wins, so each tree's
        // root converges to the component minimum
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val labels = parent.keys.toSeq.sorted.map(k => (k, find(k)))
      edges.unpersist()
      Caches.untrack(edges)
      return labels.toDF("doc_id", "cluster_id")
    }
    var labels = Caches.persist(
      edges.groupBy(col("x").as("doc_id"))
        .agg(min("y").as("m"))
        .select(col("doc_id"), least(col("doc_id"), col("m")).as("cluster_id")))
    // convergence test: labels only ever decrease, so sum(cluster_id)
    // strictly decreases on any change — one cheap scan of the cached
    // `next` replaces a join-against-previous per round. decimal(38,0)
    // so the sum is exact even at 10^10 docs with 63-bit ids.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0)
    var checksum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels.withColumnRenamed("doc_id", "y").withColumnRenamed("cluster_id", "nl"), "y")
        .groupBy(col("x").as("doc_id"))
        .agg(min("nl").as("neighbor_min"))
      val next = Caches.persist(
        labels.join(propagated, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id"))).as("cluster_id")))
      val nextChecksum = labelSum(next)
      labels.unpersist()
      Caches.untrack(labels)
      labels = next
      converged = nextChecksum == checksum
      checksum = nextChecksum
      iter += 1
    }
    edges.unpersist()
    Caches.untrack(edges)
    labels // remains tracked in Caches; released at the caller's clear()
  }

  /** Full near-dup dedup decision: MinHash pairs → components → keep
    * the smallest doc_id per cluster. Output one row per clustered doc:
    * (doc_id, cluster_id, keep) — the keep-list a training pipeline
    * joins against to drop duplicates.
    */
  def dedupClusters(docs: DataFrame, threshold: Double = 0.7): DataFrame = {
    // band config inherited from minhashNearDupsUnsorted's defaults —
    // the cluster feed must never silently diverge from the public
    // pair view it clusters (r15 advice)
    val pairs = minhashNearDupsUnsorted(docs, threshold).select("a", "b")
    connectedComponents(pairs)
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .orderBy("cluster_id", "doc_id")
  }

  // --- embedding near-dup -------------------------------------------------

  /** Exact embedding-cosine pairs (cosine >= threshold) — the brute
    * ground truth the LSH variant approximates. One side is broadcast
    * into a nested-loop join, so the corpus streams once with no
    * shuffle; cost is O(n·m) dot products. At 100 TB this is the
    * recall-audit tool you run on a sample (broadcast side bounded),
    * not the production path — [[embeddingNearDups]] is that.
    */
  def embeddingNearDupsExact(embs: DataFrame, threshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(embs.sparkSession)
    val e = embs.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val l = spread(e).as("l")
    val r = broadcast(e).as("r")
    l.join(r, col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        (Similarity.dot(col("l.embedding"), col("r.embedding"))
          / (col("l.nrm") * col("r.nrm"))).as("cos"))
      .where(col("cos") >= threshold)
      .select(col("a"), col("b"), floor(col("cos") * 1000000).cast("long").as("cos_x1e6"))
      // shield the O(n·m) nested loop from the output sort's range
      // sampling pass (see embeddingNearDups above): exchange the
      // narrow survivor rows once, so the scoring loop runs once
      .repartition(col("a"), col("b"))
      .orderBy("a", "b")
  }

  /** Embedding-cosine near-duplicates: pairs with cosine >= threshold.
    * Candidates from random-hyperplane LSH buckets, exact cosine verify
    * on candidates only.
    */
  def embeddingNearDups(embs: DataFrame, threshold: Double = 0.9,
                        tables: Int = 8, bitsPerTable: Int = 8, dims: Int = 64): DataFrame = {
    // embeddings (with precomputed norms) ride through the bucket
    // explode, so the pair is scored INSIDE the self-join and filtered
    // before any dedup: the threshold filter — a codegen'd vec_dot —
    // sees the 10^5-scale candidate stream, while distinct handles only
    // the survivors. (The alternative — distinct pairs first, then
    // re-join vectors twice — moves every candidate through three
    // shuffles and was measured ~3× slower.)
    val b = Similarity.withBuckets(embs.select(col("vec_id"), col("embedding")), tables, bitsPerTable, dims)
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val l = b.as("l")
    val r = b.as("r")
    // a pair colliding in several tables is emitted exactly once by the
    // first-colliding-table predicate (five bitwise ops on the packed
    // sigs) — the post-join distinct() (an extra exchange + dedup
    // aggregation of the surviving pair stream) is gone (r16, guide
    // §2.4 remove shuffles outright). The cosine threshold rides in
    // the SAME join condition AFTER the cheap predicates: written as a
    // downstream .where it was pushed into the join PREPENDED, so the
    // dot product — the one expensive term — ran per collision row
    // (up to `tables`× per pair); conjunct order here makes duplicate
    // collisions die on the bit test before any dot runs. Boolean
    // conjunction, so the surviving row set is identical either way.
    val pairCos = Similarity.dot(col("l.embedding"), col("r.embedding")) /
      (col("l.nrm") * col("r.nrm"))
    l.join(r, col("l.t") === col("r.t") && col("l.bucket") === col("r.bucket") &&
        col("l.vec_id") < col("r.vec_id") &&
        Similarity.firstCollision(tables, bitsPerTable,
          col("l.sig"), col("r.sig"), col("l.notmask")) &&
        pairCos >= threshold)
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"),
        floor(pairCos * 1000000).cast("long").as("cos_x1e6"))
      // exchange the (narrow) survivor pairs BEFORE the output sort:
      // a global sort's range partitioner first runs a SAMPLING job
      // over its child, and with no shuffle in between that re-executes
      // the whole candidate join — every bucket pair re-enumerated and
      // re-scored a second time (the r15 distinct used to shield this
      // by accident; measured +3.2s of a 6.9s query on the 10× corpus
      // once the distinct was removed). A hash exchange of ~24-byte
      // survivor rows is the cheapest shield: the sampler reads
      // materialized shuffle output, the join pipeline runs once.
      .repartition(col("a"), col("b"))
      .orderBy("a", "b")
  }
}
