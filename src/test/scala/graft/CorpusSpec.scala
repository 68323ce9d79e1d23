package graft

import graft.ops.Corpus

/** Sequence packing and chunking: the tokenizer-prep operators. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("pack: per-source concat order, seq boundaries at the token budget") {
    val docs = Seq(
      (1L, "A", doc(600)),
      (2L, "A", doc(600)),   // starts at 600, still seq 0
      (3L, "A", doc(300)),   // starts at 1200 -> seq 1
      (10L, "B", doc(999)),  // B packs independently: seq 0
      (11L, "B", doc(5))     // starts at 999 -> seq 0
    ).toDF("doc_id", "source", "text")
    val got = Corpus.pack(docs, budgetTokens = 1000L)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 600L, 0L), (2L, "A", 600L, 0L), (3L, "A", 300L, 1L),
      (10L, "B", 999L, 0L), (11L, "B", 5L, 0L)))
  }

  test("chunk: overlapping windows, clipped tail, short docs yield one chunk") {
    val docs = Seq((1L, doc(10)), (2L, doc(2))).toDF("doc_id", "text")
    val got = Corpus.chunk(docs, chunkTokens = 4, overlap = 1)
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1: stride 3 -> starts 0,3,6; ends 4,7,10
    assert(got == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 2L, "t1 t2")))
    // every token of every doc lands in at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
  }

  test("chunk with zero overlap tiles the document exactly") {
    val docs = Seq((1L, doc(9))).toDF("doc_id", "text")
    val got = Corpus.chunk(docs, chunkTokens = 4, overlap = 0)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._4).mkString(" ") == doc(9))
    assert(got.map(_._3) == Seq(4L, 4L, 1L))
  }

  test("epochShuffle: a permutation, reproducible, epoch-dependent, hash-ordered") {
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val e0 = Corpus.epochShuffle(docs, epoch = 0)
      .select("epoch_pos", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
    // a permutation: positions 1..n, every doc exactly once
    assert(e0.map(_._1).toSeq == (1L to 200L))
    assert(e0.map(_._2).toSet == (1L to 200L).toSet)
    // not the identity (the hash actually shuffles)
    assert(e0.map(_._2).toSeq != (1L to 200L))
    // reproducible run-to-run; a different epoch re-permutes
    val e0b = Corpus.epochShuffle(docs, epoch = 0)
      .select("epoch_pos", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(e0b.toSeq == e0.toSeq)
    val e1 = Corpus.epochShuffle(docs, epoch = 1)
      .select("epoch_pos", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(e1.map(_._2).toSeq != e0.map(_._2).toSeq)
    // the order is exactly md5-rank — the property any engine can replay
    val byHand = (1L to 200L).map { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shuffle:0:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (h, id)
    }.sorted.map(_._2)
    assert(e0.map(_._2).toSeq == byHand)
  }

  test("decontaminate: train docs sharing an n-gram with a test doc are flagged, broadcast join, no text shuffle") {
    // hand-built corpus: find doc_ids landing in train/test buckets,
    // then plant a shared 4-gram between one train and one test doc
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    val trainIds = (1L to 400L).filter(bucket(_) < 90)
    val testIds = (1L to 400L).filter(bucket(_) >= 95)
    val secret = "alpha beta gamma delta"
    val docs = (1L to 400L).map { id =>
      val base = s"filler${id}a filler${id}b filler${id}c filler${id}d filler${id}e"
      val text =
        if (id == trainIds.head || id == trainIds(1) || id == testIds.head)
          s"$base $secret" // two train docs + one test doc share the 4-gram
        else base
      (id, text)
    }.toDF("doc_id", "text")
    val hits = Corpus.decontaminate(docs, n = 4)
    val got = hits.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((trainIds.head, 1L), (trainIds(1), 1L)),
      s"expected exactly the two planted train docs, got $got")
    // scale shape: the test side broadcasts; document text never
    // enters an exchange (only doc_id + 32-char shingle hashes do)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("curatePipeline composes keep-list, decontamination, and splits exactly") {
    import graft.ops.Corpus
    // corpus where every stage has work: an exact duplicate pair
    // (dedup), a train/test doc sharing a 4-gram (decontamination)
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    val trainIds = (1L to 300L).filter(bucket(_) < 90)
    val testIds = (1L to 300L).filter(bucket(_) >= 95)
    val secret = "the alpha the beta"
    val docs = (1L to 300L).map { id =>
      val text =
        if (id == trainIds.head || id == testIds.head)
          s"the quick the lazy the dog over fence $id $secret" // shared 4-gram
        else if (id == trainIds(1) || id == trainIds(2))
          "the quick the lazy the dog duplicated exactly"       // exact dup pair
        else s"the quick the lazy the dog over fence $id"
      (id, text)
    }.toDF("doc_id", "text")
    // the composition must equal its components composed by hand
    val clean = Corpus.cleanCorpus(docs).select("doc_id").as[Long].collect().toSet
    val flagged = Corpus.decontaminate(docs, n = 4).select("doc_id").as[Long].collect().toSet
    assert(flagged.contains(trainIds.head), "planted contamination must flag")
    assert(clean.contains(trainIds(1)) && !clean.contains(trainIds(2)),
      "exact dup keeps the smaller doc_id only")
    val expect = (clean -- flagged).groupBy { id =>
      if (bucket(id) < 90) "train" else if (bucket(id) < 95) "val" else "test"
    }.view.mapValues(_.size.toLong).toMap
    val got = Corpus.curatePipeline(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect, s"pipeline $got != composed-by-hand $expect")
  }

  test("mixSample: per-source keep rates track the weights; stable under corpus growth") {
    val docs = (1L to 3000L).map(i => (i, s"src${i % 3}", s"d$i"))
      .toDF("doc_id", "source", "text")
    val kept = Corpus.mixSample(docs,
      weights = Map("src0" -> 1.0, "src1" -> 0.5), defaultWeight = 0.0)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq
    val bySrc = kept.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("src0", 0) == 1000, "weight 1.0 keeps everything")
    assert(bySrc.getOrElse("src2", 0) == 0, "default weight 0 drops everything")
    val r1 = bySrc.getOrElse("src1", 0) / 1000.0
    assert(r1 > 0.4 && r1 < 0.6, s"src1 keep rate $r1 should track weight 0.5")
    // growth stability: the same docs keep/drop identically in a larger corpus
    val grown = (1L to 6000L).map(i => (i, s"src${i % 3}", s"d$i"))
      .toDF("doc_id", "source", "text")
    val keptGrown = Corpus.mixSample(grown,
      weights = Map("src0" -> 1.0, "src1" -> 0.5), defaultWeight = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.map(_._1).toSet == keptGrown.filter(_ <= 3000L))
  }
}
