package graft

import graft.engine.Tables
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  private lazy val docs = Seq(
    doc(1, "the quick brown fox jumps over the lazy dog again and again today"),
    doc(2, "the quick brown fox jumps over the lazy dog again and again today"), // exact dup of 1
    doc(3, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near-dup of 1
    doc(4, "completely different content about spark query engines and distributed joins"),
    doc(5, "another unrelated document mentioning streams windows and watermarks only")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min doc_id") {
    val got = rowsOf(Dedup.exact(docs))
    assert(got.contains(Seq(1L, 2L))) // docs 1+2 collapse
    assert(got.size == 4)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashNearDups(docs, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists { case (a, b) => b == 4L || b == 5L || a == 4L })
  }

  test("LSH bucket cap bounds candidate volume on a duplicate flood, keeps results sound") {
    // an adversarial corpus: one document repeated 60×, plus the base
    // docs — every band bucket of the flood holds all 60 copies
    val flood = (100L until 160L).map(i =>
      doc(i, "the same flooded document body repeated verbatim across the corpus rows"))
    val corpus = (flood ++ Seq(
      doc(1, "the quick brown fox jumps over the lazy dog again and again today"),
      doc(2, "the quick brown fox jumps over the lazy dog again and again today"),
      doc(4, "completely different content about spark query engines and distributed joins"))
      ).toDF("doc_id", "text")

    val (nb, nover, uncapped, capped) = Dedup.lshBucketStats(corpus, bucketCap = 8)
    assert(nb > 0 && nover > 0, s"flood must oversize buckets (nb=$nb, nover=$nover)")
    assert(capped < uncapped,
      s"cap must shrink the candidate bound: capped=$capped uncapped=$uncapped")

    val pairs = Dedup.minhashNearDups(corpus, 0.8, bucketCap = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // soundness: every returned pair is still exact-verified ≥ threshold
    // (identical docs → jaccard 1000); the base near-pair survives
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
    // the flood still links: sub-bucketing keeps ~cap-sized groups per
    // band, so every copy pairs with SOMETHING in the flood
    val floodIds = (100L until 160L).toSet
    val linked = pairs.collect { case (a, b) if floodIds(a) || floodIds(b) => Set(a, b) }
      .flatten.intersect(floodIds)
    assert(linked.size == floodIds.size,
      s"every flood copy must keep at least one candidate partner; missing=${floodIds -- linked}")
    // determinism: a second run returns the same set
    val again = Dedup.minhashNearDups(corpus, 0.8, bucketCap = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(again == pairs)
  }

  test("bucket cap at the default leaves an honest corpus's pairs unchanged") {
    val capped = Dedup.minhashNearDups(docs, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.minhashNearDups(docs, 0.5, bucketCap = 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
  }

  test("exact jaccard values: identical pair scores 1000") {
    val j = Dedup.minhashNearDups(docs, 0.5)
      .where($"a" === 1L && $"b" === 2L)
      .select("jaccard_x1000").as[Long].collect()
    assert(j.sameElements(Array(1000L)))
  }

  test("simhash finds near-duplicates within hamming budget") {
    val pairs = Dedup.simhashNearDups(docs, 12)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((4L, 5L)))
  }

  test("simhash blocking covers radius >= 4 (pigeonhole chunks track maxHamming)") {
    // a pair at hamming 5 whose differing bits hit ALL four of the old
    // fixed 16-bit chunks: 4x16 blocking would never propose it, the
    // derived (maxHamming+1)-chunk blocking must
    val base = 0x123456789abcdef0L
    val flipped = base ^ 0x8000400020001001L // bits 63, 46, 29, 12, 0 → 5 flips
    assert(java.lang.Long.bitCount(base ^ flipped) == 5)
    val sigs = Seq((1L, base), (2L, flipped)).toDF("doc_id", "sig")
    val got = Dedup.simhashPairs(sigs, 5).select("a", "b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 5L)))
    // and below the radius it is correctly filtered out
    assert(Dedup.simhashPairs(sigs, 4).count() == 0)
    intercept[IllegalArgumentException] { Dedup.simhashPairs(sigs, 40) }
  }

  test("simhash of identical docs is identical (hamming 0)") {
    val h = Dedup.simhashNearDups(docs, 0).where($"a" === 1L && $"b" === 2L)
      .select("hamming").as[Long].collect()
    assert(h.sameElements(Array(0L)))
  }

  test("ngram jaccard threshold excludes sub-threshold pairs") {
    val hi = Dedup.ngramJaccardPairs(docs, 0.95)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(hi == Set((1L, 2L))) // only the exact dup survives 0.95
  }

  test("connected components: chains collapse to one cluster, min id wins") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("distributed and local connected-components strategies agree") {
    // chains (diameter > 1), a clique, and singleton-free pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (11L, 12L), (10L, 12L), (20L, 21L)).toDF("a", "b")
    val local = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    val distributed = Dedup.connectedComponents(pairs, localThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == distributed)
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedupClusters keep-list: one keeper per cluster") {
    val keep = Dedup.dedupClusters(docs, 0.5)
      .select("doc_id", "cluster_id", "keep").as[(Long, Long, Boolean)].collect()
    val byCluster = keep.groupBy(_._2)
    byCluster.foreach { case (cid, rows) =>
      assert(rows.count(_._3) == 1)
      assert(rows.find(_._3).get._1 == cid)
      assert(rows.map(_._1).min == cid)
    }
    // docs 1,2,3 are one near-dup cluster at 0.5
    assert(byCluster(1L).map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("embedding LSH pairs are a subset of the exact ground truth, with usable recall") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Dedup.embeddingNearDupsExact(embs, 0.35)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDups(embs, 0.35, tables = 16, bitsPerTable = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact)) // verify stage guarantees no false positives
    if (exact.nonEmpty) {
      val recall = (lsh & exact).size.toDouble / exact.size
      assert(recall >= 0.7, s"LSH recall $recall too low (exact=${exact.size}, lsh=${lsh.size})")
    }
  }

  test("embedding near-dups: duplicate vectors found at high threshold") {
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.5f, -0.25f)),
      (2L, Seq(1.0f, 0.0f, 0.5f, -0.25f)),  // exact dup of 1
      (3L, Seq(-1.0f, 0.2f, -0.5f, 0.25f))  // far away
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(embs, 0.99, tables = 4, bitsPerTable = 2, dims = 4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }
}
