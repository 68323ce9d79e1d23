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
}
