package graft

import graft.ops.Multimodal

/** Real pure-JVM media decode (PPM P6 / 24bpp BMP / PCM16 WAV) plus
  * the binary-column plumbing around it.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world"), (2L, "spark")).toDF("doc_id", "text")

  private lazy val mediaDocs =
    (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("manifest exposes media as binary with type metadata") {
    val m = Multimodal.manifest(docs)
    assert(m.schema("media").dataType.typeName == "binary")
    val bytes = m.where($"doc_id" === 1L).select("media").as[Array[Byte]].collect().head
    assert(new String(bytes, "UTF-8") == "hello world")
  }

  test("ppm decode recovers header dims and exact pixel sum from real bytes") {
    val b = Multimodal.encodePpm(17, 9, 200)
    val d = Multimodal.decodeMedia(b)
    assert(d.format == "ppm" && d.width == 17 && d.height == 9 && d.channels == 3)
    assert(d.nValues == 17L * 9 * 3 && d.sumValues == 17L * 9 * 3 * 200)
    // comments in the header are part of the public format
    val commented = ("P6\n# a comment\n17 9\n255\n".getBytes("US-ASCII") ++
      Array.fill(17 * 9 * 3)(200.toByte))
    val dc = Multimodal.decodePpm(commented)
    assert(dc.width == 17 && dc.height == 9 && dc.sumValues == d.sumValues)
  }

  test("bmp decode honors row padding, offsets, and bottom-up layout") {
    // width 17 → row 51 bytes padded to 52: a parser that sums padding
    // or misreads the offset cannot produce this sum
    val b = Multimodal.encodeBmp(17, 9, 77)
    val d = Multimodal.decodeMedia(b)
    assert(d.format == "bmp" && d.width == 17 && d.height == 9)
    assert(d.sumValues == 17L * 9 * 3 * 77)
    // pixel decode normalizes bottom-up BGR to top-down RGB: paint the
    // BOTTOM-LEFT pixel (first stored) red and expect it at row h-1
    b(54) = 0; b(55) = 0; b(56) = 255.toByte // stored BGR: blue=0 green=0 red=255
    val (w, h, px) = Multimodal.decodePixels(b)
    assert(w == 17 && h == 9)
    val bottomLeft = ((h - 1) * w + 0) * 3
    assert((px(bottomLeft) & 0xff) == 255 && (px(bottomLeft + 1) & 0xff) == 0 &&
      (px(bottomLeft + 2) & 0xff) == 0)
  }

  test("wav decode walks RIFF chunks and sums signed 16-bit samples") {
    val b = Multimodal.encodeWav(8000, 160, (-300).toShort)
    val d = Multimodal.decodeMedia(b)
    assert(d.format == "wav" && d.sampleRate == 8000 && d.channels == 1)
    assert(d.nValues == 160L && d.sumValues == -300L * 160)
    // stereo: nValues counts interleaved samples, duration counts FRAMES
    val st = Multimodal.decodeMedia(Multimodal.encodeWav(8000, 160, 5, channels = 2))
    assert(st.channels == 2 && st.nValues == 320L && st.sumValues == 5L * 320)
    val sf = Multimodal.extractFeatures(spark,
      spark.createDataset(Seq(Multimodal.MediaRow(1L,
        Multimodal.encodeWav(8000, 8000, 5, channels = 2), "audio/wav")))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])).collect().head
    assert(sf.duration_ms.contains(1000L),
      s"stereo 8000 frames at 8 kHz is 1000 ms, got ${sf.duration_ms}")
    // an unknown chunk between fmt and data must be skipped, not choke
    val extra = java.nio.ByteBuffer.allocate(b.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(b, 0, 36) // RIFF..WAVE + fmt chunk
    extra.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
    extra.put(b, 36, b.length - 36) // data chunk
    val withList = extra.array()
    val dl = Multimodal.decodeWav(withList)
    assert(dl.nValues == 160L && dl.sumValues == -300L * 160)
  }

  test("malformed payloads fail loudly, never decode to zeros") {
    intercept[IllegalArgumentException](Multimodal.decodeMedia("not media".getBytes))
    intercept[IllegalArgumentException](
      Multimodal.decodeMedia(Multimodal.encodePpm(4, 4, 9).take(20))) // truncated pixels
    // a negative RIFF chunk size must throw, not stall the chunk walk
    // or return negative sample counts
    val wav = Multimodal.encodeWav(8000, 4, 7)
    val evil = java.nio.ByteBuffer.wrap(wav.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.putInt(16, -8) // fmt chunk size field
    intercept[IllegalArgumentException](Multimodal.decodeWav(evil.array()))
    // a huge positive size must not wrap the truncation check into
    // passing (int overflow) — named error, not IndexOutOfBounds
    val huge = java.nio.ByteBuffer.wrap(wav.clone()).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    huge.putInt(40, 0x7ffffff0) // data chunk size field
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(huge.array()))
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("ppm raster anchors after the header: trailing bytes don't shift pixel decode") {
    val b = Multimodal.encodePpm(5, 3, 42)
    val trailing = b :+ '\n'.toByte // P6 tolerates trailing whitespace
    val (w, h, px) = Multimodal.decodePixels(trailing)
    assert(w == 5 && h == 3)
    assert(px.forall(_ == 42.toByte), "pixels must come from the raster, not a shifted window")
    assert(Multimodal.decodeMedia(trailing).sumValues == 5L * 3 * 3 * 42)
  }

  test("synthesized corpus decodes end-to-end; features match construction arithmetic") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.synthesize(mediaDocs))
      .collect().sortBy(_.doc_id)
    assert(feats.length == 12)
    feats.foreach { f =>
      val id = f.doc_id
      (id % 3) match {
        case 0 | 1 =>
          assert(f.width.contains(16 + (id % 32).toInt) && f.height.contains(8 + (id % 16).toInt))
          assert(f.sum_values == (16 + id % 32) * (8 + id % 16) * 3 * (id % 251))
          assert(f.duration_ms.isEmpty)
        case _ =>
          assert(f.sample_rate.contains(8000))
          assert(f.duration_ms.contains(10L * (1 + id % 40)))
          assert(f.sum_values == 80L * (1 + id % 40) * (id % 997 - 498))
      }
    }
  }

  test("resize is a real decode→scale→re-encode round trip at target dims") {
    val images = Multimodal.synthesize(mediaDocs).filter($"doc_id" % 3 =!= 2)
    val resized = Multimodal.resize(spark, images, 32, 24)
    // the output is itself decodable and constant color survives
    // nearest-neighbor exactly
    val redecoded = Multimodal.extractFeatures(spark,
      resized.select($"doc_id", $"media", $"media_type").as[Multimodal.MediaRow])
      .collect().sortBy(_.doc_id)
    redecoded.foreach { f =>
      assert(f.width.contains(32) && f.height.contains(24))
      assert(f.sum_values == 32L * 24 * 3 * (f.doc_id % 251))
    }
    // deterministic bytes
    val r1 = resized.collect().sortBy(_.doc_id)
    val r2 = Multimodal.resize(spark, images, 32, 24).collect().sortBy(_.doc_id)
    assert(r1.zip(r2).forall { case (a, b) => a.media.sameElements(b.media) })
    // audio refuses to resize
    intercept[org.apache.spark.SparkException] {
      Multimodal.resize(spark,
        Multimodal.synthesize(mediaDocs).filter($"doc_id" % 3 === 2), 32, 24).collect()
    }
  }

  test("frame sampling explodes one row per sampled frame, no shuffle; wav windows skip the header") {
    val big = Seq((1L, "x" * 4096)).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(spark, Multimodal.manifest(big), everyN = 4)
    val rows = frames.collect()
    assert(rows.map(_.frame_no).toSeq == Seq(0, 4, 8, 12)) // 16 chunks, every 4th
    assert(rows.forall(_.frame.length == 256))
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // a WAV payload windows the PCM body: every byte of every window is
    // sample data (constant s → constant LE byte pairs), no RIFF header
    val wav = Multimodal.synthesize((5L to 5L).map(i => (i, "a")).toDF("doc_id", "text"))
      .select($"doc_id", $"media", $"media_type").toDF()
    val wrows = Multimodal.frameSample(spark, wav, everyN = 1, frameBytes = 64).collect()
    assert(wrows.nonEmpty)
    val s = ((5 % 997) - 498).toShort
    val lo = (s & 0xff).toByte
    val hi = ((s >> 8) & 0xff).toByte
    wrows.foreach { fr =>
      fr.frame.zipWithIndex.foreach { case (b, i) =>
        assert(b == (if (i % 2 == 0) lo else hi))
      }
    }
    // a chunk between fmt and data (LIST/INFO) must never be windowed
    // as audio: frames come from the chunk-walked data body only
    val plain = Multimodal.encodeWav(8000, 96, 11)
    val withList = {
      val buf = java.nio.ByteBuffer.allocate(plain.length + 12)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(plain, 0, 36)
      buf.put("LIST".getBytes("US-ASCII")).putInt(4).putInt(0)
      buf.put(plain, 36, plain.length - 36)
      buf.array()
    }
    val listed = Seq((9L, withList, "audio/wav")).toDF("doc_id", "media", "media_type")
    val lrows = Multimodal.frameSample(spark, listed, everyN = 1, frameBytes = 32).collect()
    assert(lrows.nonEmpty)
    val llo = (11 & 0xff).toByte
    lrows.foreach(fr => fr.frame.zipWithIndex.foreach { case (b, i) =>
      assert(b == (if (i % 2 == 0) llo else 0.toByte),
        "LIST chunk bytes leaked into audio windows")
    })
  }

  test("streaming append sink lands micro-batches as parquet") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("gsink").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamIngest.appendSink(
      mem.toDF().toDF("event_id", "payload"), s"$dir/data", s"$dir/ckpt")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/data").count() == 3)
    } finally q.stop()
  }

  test("text features are deterministic and byte-accurate") {
    val f1 = Multimodal.textFeatures(spark, Multimodal.manifest(docs)).collect().sortBy(_.doc_id)
    val f2 = Multimodal.textFeatures(spark, Multimodal.manifest(docs)).collect().sortBy(_.doc_id)
    assert(f1.sameElements(f2))
    assert(f1(0).n_bytes == 11L && f1(0).checksum == "hello world".getBytes.map(_ & 0xff).sum)
    assert(f1(1).n_bytes == 5L)
  }
}
