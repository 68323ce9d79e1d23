package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Embedding-column maintenance operators for the `embeddings` table
  * (`vec_id, embedding: array<float>, label`) — the storage-side prep
  * an ANN/similarity deployment runs ahead of serving.
  *
  * Both operators are engine-reproducible: all float math is widened to
  * double (exact for float inputs), combined in a fixed order, and
  * reported in integer fixed-point, so a DuckDB oracle hash-matches
  * bit-for-bit.
  */
object Embeddings {

  /** Symmetric int8 scalar quantization: q_d = floor(x_d * 127 /
    * max_abs) per vector (all-zero vectors quantize to zeros). Emits
    * per-vector integer certificates — the scale factor and the
    * quantized vector's sum / squared norm / min / max — rather than
    * the int8 array itself, so correctness is checkable without
    * array-typed compares.
    *
    * Shape at 100 TB: one kernel pass, no shuffle (a per-row transform
    * in the scan stage; the HOF route would recompute max_abs per
    * element — the inlining pathology at Dedup.scala:18-25). This is
    * the 4× memory lever for the IVF/ANN serving path.
    */
  def quantize(emb: DataFrame): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          var maxAbs = 0.0
          var i = 0
          while (i < v.length) {
            val a = math.abs(v(i).toDouble)
            if (a > maxAbs) maxAbs = a
            i += 1
          }
          var qSum = 0L; var qNorm2 = 0L
          var qMin = 0L; var qMax = 0L
          if (maxAbs > 0) {
            qMin = Long.MaxValue; qMax = Long.MinValue
            i = 0
            while (i < v.length) {
              val q = math.floor(v(i).toDouble * 127.0 / maxAbs).toLong
              qSum += q; qNorm2 += q * q
              if (q < qMin) qMin = q
              if (q > qMax) qMax = q
              i += 1
            }
          }
          (id, math.floor(maxAbs * 1e9).toLong, qSum, qNorm2, qMin, qMax)
        }
      }
      .toDF("vec_id", "maxabs_x1e9", "q_sum", "q_norm2", "q_min", "q_max")
      .repartition(col("vec_id")) // sampling shield (see Dedup.embeddingNearDups)
      .orderBy("vec_id")
  }

  /** Per-label centroids in fixed-point: element d of label L's
    * centroid is floor(sum(floor(x_d * 1e6)) / n) — the inner floor
    * makes the summation exact integer arithmetic (order-independent,
    * unlike a double sum), the outer division is exact while the sum
    * stays under 2^53 (|x| ≲ 1 ⇒ holds beyond 10^9 vectors per label).
    *
    * Shape at 100 TB: posexplode fans each vector into (label, pos)
    * cells, but partial aggregation folds them map-side to
    * n_labels × dim rows per task before the one tiny shuffle — the
    * same shape KMeans update steps use.
    */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * 1e6).cast("long").as("fx"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"), sum(col("fx")).as("sum_fx"))
      .select(col("label"), col("pos"), col("n"),
        floor(col("sum_fx").cast("double") / col("n").cast("double"))
          .cast("long").as("centroid_x1e6"))
      .orderBy("label", "pos")

  /** Fixed-point copies of the embedding vectors: element d becomes
    * floor(x_d * scale) as a Long, so every downstream sum/product is
    * exact integer arithmetic — order-independent and bit-identical
    * across engines.
    */
  private def fxVectors(emb: DataFrame, scale: Double): Dataset[(Long, Array[Long])] = {
    val sp = emb.sparkSession
    import sp.implicits._
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        it.map { case (id, v) =>
          val a = new Array[Long](v.length)
          var i = 0
          while (i < v.length) { a(i) = math.floor(v(i).toDouble * scale).toLong; i += 1 }
          (id, a)
        }
      }
  }

  /** Deterministic Lloyd's k-means over the embedding column, entirely
    * in exact integer math so a DuckDB oracle hash-matches the
    * assignment bit-for-bit: vectors quantized to floor(x*1e6) Longs,
    * squared-L2 distances are exact Long sums (unit-norm 64-dim ⇒
    * ≤ 2.6e14 « 2^53), centroid update is floor(sum/n) (exact while
    * the sum < 2^53, same argument as [[labelCentroids]]), seeding is
    * the k smallest vec_ids, and distance ties break to the smallest
    * cluster id. Runs a FIXED `iters` Lloyd rounds (no convergence
    * test), so the oracle can unroll the same rounds as CTEs.
    *
    * Shape at 100 TB: per round, assignment is one broadcast-centroid
    * kernel pass (no shuffle) and the update shuffles k × dims
    * partially-aggregated cells per task — the classic scalable KMeans
    * step. Centroids (k × dims Longs) live on the driver between
    * rounds, which is the nature of Lloyd's: OK for the k ≲ 10^5 of a
    * SemDeDup/curation run, never proportional to the corpus.
    *
    * Returns (vec_id, cluster, dist_fx2) — the final assignment and
    * its exact squared distance in (1e6 fixed-point)² units.
    */
  def kmeansAssign(emb: DataFrame, k: Int = 4, iters: Int = 2): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    val fx = fxVectors(emb, 1e6)
    Caches.track(fx.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).toDF())

    // seed: the k lexicographically-smallest vec_ids, cluster id =
    // rank in that order (k × dims Longs — driver-side by design)
    var centroids: Array[Array[Long]] =
      fx.orderBy("_1").limit(k).collect().map(_._2)

    // nearest centroid by exact squared L2; strict < keeps the
    // smallest cluster id on ties (the oracle's ORDER BY dist, cluster)
    def bestOf(cents: Array[Array[Long]], v: Array[Long]): (Int, Long) = {
      var best = 0; var bestDist = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0L
        var i = 0
        while (i < v.length) { val t = v(i) - cent(i); d += t * t; i += 1 }
        if (d < bestDist) { bestDist = d; best = c }
        c += 1
      }
      (best, bestDist)
    }

    var round = 1
    while (round < iters) {
      // update: one fused kernel pass assigns AND explodes to
      // (cluster, pos, x) cells; partial aggregation folds them to
      // ≤ k×dims rows per task before the one small shuffle
      val bc = sp.sparkContext.broadcast(centroids)
      val cells = fx.flatMap { case (_, v) =>
        val cluster = bestOf(bc.value, v)._1
        v.iterator.zipWithIndex.map { case (x, pos) => (cluster, pos, x) }
      }
        .toDF("cluster", "pos", "x")
        .groupBy("cluster", "pos")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_fx"))
        .collect()
      val next = scala.collection.mutable.Map.empty[Int, Array[Long]]
      cells.foreach { r =>
        val cl = r.getInt(0)
        val arr = next.getOrElseUpdate(cl, new Array[Long](centroids(0).length))
        arr(r.getInt(1)) = math.floor(r.getLong(3).toDouble / r.getLong(2).toDouble).toLong
      }
      // empty clusters drop out (their centroid disappears), matching
      // the oracle's group-by; remap to a dense, id-ordered array? No:
      // cluster ids must stay stable, so keep a sparse map → ordered seq
      val kept = next.keys.toSeq.sorted
      centroids = kept.map(next).toArray
      // note: if a cluster emptied, ids after it would shift — forbid
      // silently-wrong ids by keeping position only when dense
      require(kept == (0 until kept.size), s"k-means cluster ids not dense: $kept")
      round += 1
    }
    val bc = sp.sparkContext.broadcast(centroids)
    fx.map { case (id, v) =>
      val (cluster, dist) = bestOf(bc.value, v)
      (id, cluster.toLong, dist)
    }
      .toDF("vec_id", "cluster", "dist_fx2")
      .orderBy("vec_id")
  }

  /** Random-projection dimensionality reduction (Achlioptas-style sign
    * projection): y_j = Σ_i sign(i,j)·v_i over floor(x*1e6) fixed-point
    * Longs, with a DETERMINISTIC arithmetic sign pattern
    * (sign(i,j) = + iff (31i+17j) mod 2 = 0) so the oracle recomputes
    * every projected coordinate exactly; a production deployment seeds
    * the sign from a hash — the shape is identical. One scan-stage
    * kernel per row, no shuffle except the presentation sort: at 100 TB
    * projection cost is the read itself, and downstream ANN/clustering
    * runs on outDim ≪ dims coordinates.
    */
  def project(emb: DataFrame, outDim: Int = 8): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    fxVectors(emb, 1e6).flatMap { case (id, v) =>
      (0 until outDim).map { j =>
        var s = 0L
        var i = 0
        while (i < v.length) {
          s += (if ((i * 31 + j * 17) % 2 == 0) v(i) else -v(i))
          i += 1
        }
        (id, j, s)
      }
    }.toDF("vec_id", "j", "y")
      .repartition(col("vec_id")) // sampling shield (see Dedup.embeddingNearDups)
      .orderBy("vec_id", "j")
  }

  /** SemDeDup-style semantic near-duplicates: k-means-cluster the
    * embeddings ([[kmeansAssign]]), then compare pairs ONLY within a
    * cluster, keeping those whose cosine ≥ 2/5. The threshold test is
    * exact rational arithmetic — dot > 0 ∧ 25·dot² ≥ 4·‖a‖²·‖b‖² over
    * floor(x*1e3) Longs (unit-norm 64-dim ⇒ every term ≤ 1.6e17 « 2^63)
    * — so no sqrt ever runs and the oracle hash-matches.
    *
    * Shape at 100 TB: clustering bounds the candidate set — pairs form
    * within a cluster, never across the corpus (the all-pairs
    * explosion is the reason SemDeDup clusters first; k grows with n
    * to cap cluster size). The pair dot products are codegen'd
    * zip_with/aggregate over the integer vectors; the cluster-side
    * join broadcasts the (vec_id, cluster, v, n2) frame, which is the
    * per-cluster working set by construction.
    */
  def semanticNearDups(emb: DataFrame, k: Int = 4, iters: Int = 2): DataFrame = {
    val sp = emb.sparkSession
    import sp.implicits._
    val asn = kmeansAssign(emb, k, iters).select(col("vec_id"), col("cluster"))
    // exact integer dot products via the codegen'd vec_dot_long — the
    // interpreted aggregate(zip_with) pair on this candidate-pair ×
    // dimensions hot path measured ~20× slower (11.5s → ~1s at sf0.1)
    val f3 = fxVectors(emb, 1e3).toDF("vec_id", "v")
      .withColumn("n2", call_function("vec_dot_long", col("v"), col("v")))
    // NOT persisted (r16, measured): sharing the (vec_id, cluster, v,
    // n2) frame via Caches.persist was tried — the self-join's two
    // sides each recompute the assignment pass + fxVectors kernel —
    // and measured SLOWER (1.03 → 1.09s best-of-4 at sf0.1): the
    // duplicate subtrees run as independent parallel stages while a
    // cache materialization serializes them, and the kernel is cheaper
    // than the cache round-trip. At cluster scale the broadcast side
    // is collected once either way.
    val side = asn.join(f3, "vec_id")
    val l = side.as("l")
    val r = broadcast(side).as("r")
    val dot = call_function("vec_dot_long", col("l.v"), col("r.v"))
    l.join(r, col("l.cluster") === col("r.cluster") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a"), col("r.vec_id").as("b"), col("l.cluster").as("cluster"),
        dot.as("dot"), col("l.n2").as("na2"), col("r.n2").as("nb2"))
      .where(col("dot") > 0 &&
        col("dot") * col("dot") * lit(25L) >= lit(4L) * col("na2") * col("nb2"))
      // shield the per-cluster pair scoring from the output sort's
      // range-sampling pass (Dedup.embeddingNearDups has the full
      // story): one narrow exchange of survivors, the dot loop runs once
      .repartition(col("a"), col("b"))
      .orderBy("a", "b")
  }
}
