package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed per-partition
  * in batches.
  *
  * The container has no codec libraries, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decoder; everything around it —
  * schema, binary column handling, partition-batched execution shape,
  * metadata extraction — is the real Spark plumbing a production
  * pipeline would keep, swapping only the decoder body.
  */
object Multimodal {

  /** One media object: id + raw bytes + declared mime type. */
  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  /** Extracted features; width/height/duration are decoder outputs. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, media_type: String,
                           width: Int, height: Int, checksum: Long)

  /** Manifest: the binary-column view of a corpus. For testdata the
    * "media" is the UTF-8 text payload; in production this column holds
    * image/audio bytes (or object-store pointers resolved per batch).
    */
  def manifest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("media_type"))

  /** STUB DECODER — deterministic fake. A real deployment replaces this
    * with an image/audio codec call (per-partition, so codec init cost
    * amortizes over a whole batch, the same shape mapInPandas gives
    * Python pipelines). Fake dims derive from the md5 of the payload
    * bytes — deterministic AND reproducible outside the JVM, so the
    * whole feature row is cross-engine oracle-checkable.
    */
  private def decodeStub(md: java.security.MessageDigest, bytes: Array[Byte]): (Int, Int) = {
    val d = md.digest(bytes)
    def be32(off: Int): Long = // unsigned big-endian 32-bit = 8 hex digits of the md5
      ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
        ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)
    (64 + (be32(0) % 1024).toInt, 64 + (be32(4) % 1024).toInt)
  }

  /** Per-partition batched feature extraction over the binary column. */
  def extractFeatures(spark: SparkSession, mf: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    mf.as[MediaRow].mapPartitions { it =>
      // per-partition init (codec handles, model weights… here: digest)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h) = decodeStub(md, m.media)
        var cs = 0L
        var i = 0
        while (i < m.media.length) { cs += m.media(i) & 0xffL; i += 1 }
        MediaFeatures(m.doc_id, m.media.length.toLong, m.media_type, w, h, cs)
      }
    }
  }

  /** One resized media object; `media` holds the re-encoded bytes. */
  case class ResizedRow(doc_id: Long, media: Array[Byte], media_type: String,
                        width: Int, height: Int)

  /** STUB RESIZE — a real deployment decodes, scales to (w, h), and
    * re-encodes inside the partition loop. The stub keeps the byte
    * plumbing honest: output bytes are a deterministic function of the
    * input bytes and target dims, sized ∝ w×h (so downstream size
    * accounting is exercised).
    */
  def resize(spark: SparkSession, mf: DataFrame, w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    mf.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        val n = math.max(1, math.min(m.media.length, (w * h) / 64))
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) { out(i) = (m.media(i % m.media.length) ^ (w + h)).toByte; i += 1 }
        ResizedRow(m.doc_id, out, m.media_type, w, h)
      }
    }
  }

  /** One sampled frame of a (video) media object. */
  case class FrameRow(doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** STUB FRAME-SAMPLE — every `everyN`-th fixed-size chunk of the
    * payload stands in for a decoded video frame; real codecs replace
    * the chunking, the explode shape (one row per sampled frame,
    * partition-local, no shuffle) is the production plumbing.
    */
  def frameSample(spark: SparkSession, mf: DataFrame, everyN: Int = 10,
                  frameBytes: Int = 256): Dataset[FrameRow] = {
    import spark.implicits._
    mf.as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        val nFrames = math.max(1, m.media.length / frameBytes)
        (0 until nFrames by everyN).iterator.map { f =>
          val start = f * frameBytes
          val end = math.min(start + frameBytes, m.media.length)
          FrameRow(m.doc_id, f, java.util.Arrays.copyOfRange(m.media, start, end))
        }
      }
    }
  }
}
