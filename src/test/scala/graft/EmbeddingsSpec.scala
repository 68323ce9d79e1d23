package graft

import graft.ops.Embeddings

/** Embedding maintenance operators: int8 quantization certificates and
  * fixed-point label centroids.
  */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("quantize: known vector, all-zero vector, certificate arithmetic") {
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f), 0),
      (2L, Array(0.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Embeddings.quantize(emb)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // vec 1: maxabs=1.0 -> q = [127, floor(-63.5)=-64, floor(31.75)=31]
    val q = Seq(127L, -64L, 31L)
    assert(got(0) == ((1L, 1000000000L, q.sum, q.map(x => x * x).sum, -64L, 127L)))
    // all-zero vector: zero certificates, maxabs 0
    assert(got(1) == ((2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("labelCentroids: exact integer mean per (label, dimension)") {
    val emb = Seq(
      (1L, Array(0.5f, 1.0f), 7),
      (2L, Array(0.25f, -1.0f), 7),
      (3L, Array(1.0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val got = Embeddings.labelCentroids(emb)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // label 7 pos 0: (500000 + 250000)/2 = 375000; pos 1: (1000000 - 1000000)/2 = 0
    assert(got == Seq((7, 0L, 2L, 375000L), (7, 1L, 2L, 0L), (8, 0L, 1L, 1000000L)))
  }

  /** Two tight 2-D clusters around (1,0) and (0,1); vec_ids 0 and 1
    * are one seed in each, so Lloyd's converges in the first round and
    * the second round must not move anything.
    */
  private def twoClusters = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f), 0),
    (2L, Array(0.9f, 0.1f), 0),
    (3L, Array(0.1f, 0.9f), 0),
    (4L, Array(0.95f, 0.05f), 0),
    (5L, Array(0.05f, 0.95f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("kmeansAssign: separates planted clusters with exact integer distances") {
    val got = Embeddings.kmeansAssign(twoClusters, k = 2, iters = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._2) == Seq(0L, 1L, 0L, 1L, 0L, 1L))
    // round-1 centroids: cluster 0 = mean of fx{0,2,4}; fx(0.9f)=899999
    // (0.9f = 0.89999997... widened exactly), fx(0.95f)=949999 (same),
    // fx(0.1f)=100000, fx(0.05f)=50000 (both exact in float)
    // c0 = (floor((1000000+899999+949999)/3), floor((0+100000+50000)/3))
    //    = (949999, 50000) -> dist(vec 0) = (1000000-949999)^2 + 50000^2
    val c0 = (949999L, 50000L)
    val expectDist0 = (1000000L - c0._1) * (1000000L - c0._1) + c0._2 * c0._2
    assert(got.head._3 == expectDist0)
  }

  test("kmeansAssign: assignment is total and clusters are dense ids") {
    val got = Embeddings.kmeansAssign(twoClusters, k = 3, iters = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 6)
    assert(got.map(_._2).forall(c => c >= 0 && c < 3))
  }

  test("semanticNearDups: pairs only within a cluster, exact rational threshold") {
    // vecs 0,2,4 cluster together (near (1,0)); 0~2 cosine ≈ 0.994.
    // vec 1 is at (0,1): cosine with 0 is 0 — never a pair. The
    // cross-cluster near-pair CANNOT appear even if cosine were high,
    // because pairing is within-cluster by construction.
    val got = Embeddings.semanticNearDups(twoClusters, k = 2, iters = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val pairs = got.map(g => (g._1, g._2)).toSet
    assert(pairs == Set((0L, 2L), (0L, 4L), (2L, 4L), (1L, 3L), (1L, 5L), (3L, 5L)))
    // exact integers: dot(0,2) over floor(x*1e3): (1000*899 + 0*100)
    val row02 = got.find(g => g._1 == 0L && g._2 == 2L).get
    assert(row02._4 == 1000L * 899L)
    assert(row02._5 == 1000L * 1000L) // |v0|^2
    assert(row02._6 == 899L * 899L + 100L * 100L) // |v2|^2
    // every reported pair satisfies the exact rational threshold
    got.foreach { g =>
      assert(g._4 > 0 && g._4 * g._4 * 25 >= 4 * g._5 * g._6)
    }
  }

  test("project: deterministic sign projection, exact integer coordinates") {
    import spark.implicits._
    val emb = Seq((7L, Array(0.5f, -0.25f))).toDF("vec_id", "embedding")
    val got = graft.ops.Embeddings.project(emb, outDim = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // fx = [500000, -250000]; sign(i,j) = + iff (31i+17j) % 2 == 0
    // j=0: signs (+,-) -> 500000 + 250000 = 750000
    // j=1: signs (-,+) -> -500000 - 250000 = -750000
    assert(got == Seq((7L, 0, 750000L), (7L, 1, -750000L)))
  }
}
