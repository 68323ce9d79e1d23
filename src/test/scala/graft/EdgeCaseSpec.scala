package graft

import java.nio.file.Files

import graft.engine.{EsdbWriter, EventStore}
import graft.ops.{Dedup, TextOps}

/** Edge cases mirroring the reference's (esdb_test.go:112-154 big
  * event spanning blocks; empty/missing lookups; plus unicode payloads
  * the byte-oriented reference stores opaquely).
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("big payload (~64 KB) roundtrips through write + scan") {
    val big = "x" * 65536
    val dir = { val d = Files.createTempDirectory("esdbbig").toFile; d.delete(); d.getAbsolutePath }
    val ev = Seq(("a", "g", 1L, 1L, 0.0, big))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    EsdbWriter.write(ev, dir)
    val back = EventStore.scan(EsdbWriter.read(spark, dir), "a", "g")
      .select("payload").as[String].collect()
    assert(back.length == 1 && back(0) == big)
  }

  test("BINARY payload: 8 KB+ non-UTF8 blobs roundtrip byte-exact (esdb_test.go:112-154)") {
    // deterministic pseudo-random bytes including invalid-UTF8 sequences
    def blob(seed: Int, n: Int): Array[Byte] = {
      val r = new scala.util.Random(seed)
      val b = new Array[Byte](n)
      r.nextBytes(b)
      b(0) = 0xFF.toByte; b(1) = 0xFE.toByte; b(2) = 0x80.toByte // never valid UTF-8
      b
    }
    val blobs = (1 to 6).map(i => (i, blob(i, 8192 + i * 512)))
    val dir = { val d = Files.createTempDirectory("esdbbin").toFile; d.delete(); d.getAbsolutePath }
    val ev = blobs.map { case (i, b) =>
      (if (i % 2 == 0) "a" else "b", s"g${i % 2}", i.toLong, i.toLong, 0.0, b, s"k${i % 3}")
    }.toDF("space", "grouping", "ts_us", "event_id", "value", "payload", "idx_k")
    EsdbWriter.write(ev.where($"event_id" <= 4L), dir)
    EsdbWriter.append(ev.where($"event_id" > 4L), dir) // append path too
    // vanilla read path
    val back = EventStore.scan(EsdbWriter.read(spark, dir), "a", "g0")
      .select("event_id", "payload").as[(Long, Array[Byte])].collect().toMap
    assert(back.keySet == Set(2L, 4L, 6L))
    blobs.filter(_._1 % 2 == 0).foreach { case (i, b) =>
      assert(java.util.Arrays.equals(back(i.toLong), b), s"payload $i corrupted")
    }
    // ordered (DSv2) read path handles BINARY too
    val backOrdered = EventStore.scan(EsdbWriter.readOrdered(spark, dir), "a", "g0")
      .select("event_id", "payload").as[(Long, Array[Byte])].collect().toMap
    blobs.filter(_._1 % 2 == 0).foreach { case (i, b) =>
      assert(java.util.Arrays.equals(backOrdered(i.toLong), b), s"ordered payload $i corrupted")
    }
    // index ops on an opaque-payload store go through the caller-declared
    // idx_* column (the reference indexes only writer-declared keys)
    val ixScan = EventStore.scanIndex(EsdbWriter.read(spark, dir), "a", "k", "k0")
      .select("event_id").as[Long].collect().toSeq
    assert(ixScan == Seq(6L))
    val tails = graft.engine.EventLog.tails(EsdbWriter.read(spark, dir), "k")
      .as[(String, Long)].collect().toMap
    assert(tails == Map("k0" -> 6L, "k1" -> 4L, "k2" -> 5L))
  }

  test("unicode payloads and text ops") {
    val docs = Seq((1L, "héllo wörld 你好 世界"), (2L, "ascii only text here"))
      .toDF("doc_id", "text")
    val counts = TextOps.tokenCounts(docs).select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 4L, 2L -> 4L)) // codepoint-aware split
    val fps = TextOps.fingerprint(docs).select("fp").as[String].collect()
    assert(fps.distinct.length == 2)
    // minhash kernel handles multi-byte chars deterministically
    val a = graft.ops.DedupKernels.shingleHashes("你好 世界 你好 世界 再见", 3)
    val b = graft.ops.DedupKernels.shingleHashes("你好 世界 你好 世界 再见", 3)
    assert(a.sameElements(b))
  }

  test("approx sketches stay within tolerance of their exact twins") {
    val dir = "/root/testdata/sf0.01"
    val q = Queries.queries
    val approxD = q("agg_approx_distinct")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactD = q("agg_space_stats")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap // n_groupings
    exactD.foreach { case (space, n) =>
      val a = approxD(space).toDouble
      assert(math.abs(a - n) / n <= 0.05, s"$space: approx $a vs exact $n")
    }
    val approxQ = q("agg_value_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exactQ = q("agg_value_quantiles_exact")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    exactQ.foreach { case (space, (p50, p95, p99)) =>
      val (a50, a95, a99) = approxQ(space)
      // percentile_approx picks a REAL value near the exact interpolated
      // one; tail quantiles sit in sparse territory where neighboring
      // values are far apart, so tolerance widens with the percentile
      assert(math.abs(a50 * 1e6 - p50) <= 0.10 * math.abs(p50).max(1L), s"$space p50")
      assert(math.abs(a95 * 1e6 - p95) <= 0.25 * math.abs(p95).max(1L), s"$space p95")
      assert(math.abs(a99 * 1e6 - p99) <= 0.60 * math.abs(p99).max(1L), s"$space p99")
    }
  }

  test("empty inputs: scans, tails, dedup on zero rows") {
    val empty = Seq.empty[(String, String, Long, Long, Double, String)]
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    assert(EventStore.scan(empty, "a", "g").isEmpty)
    assert(graft.engine.EventLog.tails(empty, "i").isEmpty)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.exact(emptyDocs).isEmpty)
    assert(Dedup.minhashNearDups(emptyDocs, 0.8).isEmpty)
  }

  test("uncommitted junk in a store directory is invisible to readers") {
    // the reference tolerates a torn trailing event on recovery
    // (open_stream_test.go:549-571); the parquet commit protocol's
    // analog is that only committed part-files are data — _temporary
    // task dirs and dot-prefixed in-progress files must be ignored
    val dir = { val d = Files.createTempDirectory("esdbjunk").toFile; d.delete(); d.getAbsolutePath }
    val ev = Seq(("a", "g", 1L, 1L, 0.0, "{}"), ("a", "g", 2L, 2L, 0.0, "{}"))
      .toDF("space", "grouping", "ts_us", "event_id", "value", "payload")
    EsdbWriter.write(ev, dir)
    val spaceDir = java.nio.file.Paths.get(dir, "space=a")
    Files.createDirectories(spaceDir.resolve("_temporary/0"))
    Files.write(spaceDir.resolve("_temporary/0/part-torn.parquet"), Array[Byte](1, 2, 3))
    Files.write(spaceDir.resolve(".part-inflight.parquet.crc"), Array[Byte](9))
    val back = EsdbWriter.read(spark, dir)
    assert(back.count() == 2)
    assert(EventStore.scan(back, "a", "g").select("event_id").as[Long].collect().toSeq == Seq(2L, 1L))
  }

  test("decontaminate edge cases: short docs, n longer than any doc, empty test split") {
    import graft.ops.Corpus
    // docs shorter than the window produce no shingles and cannot flag
    val tiny = Seq((1L, "a b"), (2L, "c"), (3L, "d e f")).toDF("doc_id", "text")
    assert(Corpus.decontaminate(tiny, n = 4).collect().isEmpty)
    // an empty test split (every doc lands in train/val buckets) flags
    // nothing rather than failing — bucket membership is hash luck, so
    // force it by keeping only ids whose bucket is < 95
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    val noTest = (1L to 200L).filter(bucket(_) < 95)
      .map(id => (id, "shared four gram text here")).toDF("doc_id", "text")
    assert(Corpus.decontaminate(noTest, n = 4).collect().isEmpty)
  }

  test("redactPii edge cases: pii at string edges, adjacent pii, unicode neighbors") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "a@b.co"),                               // entire text is the email
      (2L, "10.1.2.3 555-000-1111"),                // adjacent, space-separated
      (3L, "héllo wörld a@b.io ünïcode")            // unicode neighbors intact
    ).toDF("doc_id", "text")
    val got = TextOps.redactPii(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got(0) == ((1L, 1L, 0L, 0L, "<EMAIL>")))
    assert(got(1) == ((2L, 0L, 1L, 1L, "<IP> <PHONE>")))
    assert(got(2) == ((3L, 1L, 0L, 0L, "héllo wörld <EMAIL> ünïcode")))
  }

  test("single-token and single-char documents survive the dedup pipeline") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b c"), (4L, "")).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    val sims = Dedup.simhashNearDups(docs, 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(sims.contains((1L, 2L)))
  }
}
