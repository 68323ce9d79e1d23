package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column processing: image/audio payloads as opaque
  * `binary` columns with typed metadata, decoded per-partition in
  * batches (codec init amortizes over a partition, the same shape
  * `mapInPandas` gives Python pipelines).
  *
  * The decoders are REAL pure-JVM parsers for the public uncompressed
  * container formats — PPM P6 (netpbm), BMP (BITMAPINFOHEADER, 24bpp
  * uncompressed), WAV (RIFF PCM16) — header + pixel/sample level, no
  * codec library needed. Compressed formats (JPEG/MP4/...) would slot
  * into the same dispatch with a codec dependency; the Spark plumbing
  * (binary columns, partition-batched decode, explode shapes) is
  * identical.
  */
object Multimodal {

  /** One media object: id + raw bytes + declared mime type. */
  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)

  /** Manifest: the binary-column view of a corpus. For testdata the
    * "media" is the UTF-8 text payload; in production this column holds
    * image/audio bytes (or object-store pointers resolved per batch).
    */
  def manifest(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("media_type"))

  // ------------------------------------------------------------------
  // Deterministic real-format fixtures
  // ------------------------------------------------------------------

  /** Synthesize one REAL media object per document, parameters derived
    * from `doc_id` alone (doc_id % 3 cycles ppm/bmp/wav). Because the
    * construction parameters are pure doc_id arithmetic, an external
    * oracle can predict exactly what a correct decoder must recover
    * from the bytes — which is what makes the decode pipeline
    * end-to-end checkable without shipping binary fixtures.
    */
  def synthesize(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select("doc_id").as[Long].mapPartitions { it =>
      it.map { id =>
        (id % 3) match {
          case 0 =>
            MediaRow(id, encodePpm(imgW(id), imgH(id), imgV(id)), "image/x-portable-pixmap")
          case 1 =>
            MediaRow(id, encodeBmp(imgW(id), imgH(id), imgV(id)), "image/bmp")
          case _ =>
            MediaRow(id, encodeWav(WavRate, wavSamples(id), wavS(id)), "audio/wav")
        }
      }
    }
  }

  /** Construction parameters (shared with the oracle SQL). */
  private[graft] def imgW(id: Long): Int = 16 + (id % 32).toInt
  private[graft] def imgH(id: Long): Int = 8 + (id % 16).toInt
  private[graft] def imgV(id: Long): Int = (id % 251).toInt
  private[graft] val WavRate = 8000
  private[graft] def wavSamples(id: Long): Int = 80 * (1 + (id % 40).toInt)
  private[graft] def wavS(id: Long): Short = ((id % 997) - 498).toShort

  /** PPM P6: `P6\n<w> <h>\n255\n` + w*h*3 raw RGB bytes. */
  private[graft] def encodePpm(w: Int, h: Int, v: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    java.util.Arrays.fill(out, header.length, out.length, v.toByte)
    out
  }

  /** BMP: 14-byte file header + 40-byte BITMAPINFOHEADER, 24bpp
    * uncompressed bottom-up, rows padded to 4 bytes.
    */
  private[graft] def encodeBmp(w: Int, h: Int, v: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0)             // reserved
    buf.putInt(54)            // pixel data offset
    buf.putInt(40)            // info header size
    buf.putInt(w)
    buf.putInt(h)             // positive: bottom-up
    buf.putShort(1)           // planes
    buf.putShort(24)          // bpp
    buf.putInt(0)             // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 DPI
    buf.putInt(0).putInt(0)   // palette
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w * 3) { buf.put(v.toByte); c += 1 }
      var p = w * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      r += 1
    }
    buf.array()
  }

  /** WAV: RIFF/WAVE with a PCM `fmt ` chunk and a 16-bit `data` chunk
    * of `n` FRAMES (n × channels interleaved samples), every sample `s`.
    */
  private[graft] def encodeWav(rate: Int, n: Int, s: Short,
                               channels: Int = 1): Array[Byte] = {
    val dataSize = n * 2 * channels
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                      // PCM
    buf.putShort(channels.toShort)
    buf.putInt(rate)
    buf.putInt(rate * 2 * channels)      // byte rate
    buf.putShort((2 * channels).toShort) // block align
    buf.putShort(16)                     // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n * channels) { buf.putShort(s); i += 1 }
    buf.array()
  }

  // ------------------------------------------------------------------
  // Real decoders
  // ------------------------------------------------------------------

  /** What a decoder recovered from the bytes. Sums are exact longs (no
    * float drift), so decode output is hashable cross-engine: images
    * report sum over every pixel byte, audio over every PCM sample.
    */
  case class Decoded(format: String, width: Int, height: Int, channels: Int,
                     sampleRate: Int, nValues: Long, sumValues: Long)

  /** Sniff the container from magic bytes and parse. Throws on a
    * malformed or unsupported payload — silent zeros would poison
    * downstream feature stores.
    */
  def decodeMedia(b: Array[Byte]): Decoded = {
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodePpm(b)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE") decodeWav(b)
    else throw new IllegalArgumentException(
      s"unrecognized media container (${b.length} bytes, magic ${b.take(4).map("%02x".format(_)).mkString})")
  }

  /** PPM P6 header parse: (width, height, raster offset). The raster
    * starts exactly one whitespace byte after the maxval token — both
    * the feature pass and the pixel decoder anchor THERE (never at the
    * end of the buffer, which would mis-window a payload with trailing
    * bytes).
    */
  private[graft] def ppmHeader(b: Array[Byte]): (Int, Int, Int) = {
    var pos = 2 // past "P6"
    def nextInt(): Int = {
      // skip whitespace and '#' comments
      var inComment = false
      while (pos < b.length && (inComment || b(pos).toChar.isWhitespace || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        if (b(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(w > 0 && h > 0 && maxval == 255, s"unsupported PPM header w=$w h=$h maxval=$maxval")
    pos += 1 // the single whitespace after maxval
    // long math: hostile header dims must not wrap the bound check
    require(b.length.toLong - pos >= w.toLong * h * 3,
      s"PPM truncated: ${b.length - pos} < ${w.toLong * h * 3}")
    (w, h, pos)
  }

  /** PPM P6 parser: ASCII header (whitespace-separated tokens, `#`
    * comments) then raw big-endian RGB bytes.
    */
  private[graft] def decodePpm(b: Array[Byte]): Decoded = {
    val (w, h, pos) = ppmHeader(b)
    var sum = 0L
    var i = pos
    val end = pos + w * h * 3
    while (i < end) { sum += b(i) & 0xffL; i += 1 }
    Decoded("ppm", w, h, 3, 0, w.toLong * h * 3, sum)
  }

  /** BMP header parse shared by [[decodeBmp]] and [[decodePixels]]:
    * (width, height, dataOffset, topDown, rowSize). 24bpp uncompressed
    * only; truncation checked in long math so hostile dims can't wrap
    * the bound.
    */
  private[graft] def bmpHeader(b: Array[Byte]): (Int, Int, Int, Boolean, Int) = {
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val w = buf.getInt(18)
    val hRaw = buf.getInt(22)
    val h = math.abs(hRaw) // negative height = top-down row order
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(w > 0 && h > 0 && bpp == 24 && compression == 0,
      s"unsupported BMP w=$w h=$hRaw bpp=$bpp compression=$compression")
    val rowSize = ((w.toLong * 3 + 3) / 4 * 4)
    require(dataOffset >= 54 && dataOffset.toLong + rowSize * h <= b.length, "BMP truncated")
    (w, h, dataOffset, hRaw < 0, rowSize.toInt)
  }

  /** BMP parser: BITMAPFILEHEADER + BITMAPINFOHEADER, 24bpp
    * uncompressed; rows are 4-byte aligned, row padding excluded from
    * the pixel sum.
    */
  private[graft] def decodeBmp(b: Array[Byte]): Decoded = {
    val (w, h, dataOffset, _, rowSize) = bmpHeader(b)
    var sum = 0L
    var r = 0
    while (r < h) {
      var i = dataOffset + r * rowSize
      val end = i + w * 3
      while (i < end) { sum += b(i) & 0xffL; i += 1 }
      r += 1
    }
    Decoded("bmp", w, h, 3, 0, w.toLong * h * 3, sum)
  }

  /** RIFF chunk walk: (channels, sampleRate, dataOffset, dataSize).
    * Shared by [[decodeWav]] and [[frameSample]] so every consumer
    * agrees on where the PCM body starts (chunks before `data` —
    * LIST/INFO/fact — are skipped, never windowed as audio). Guards
    * are overflow-safe (a huge size field must not wrap the
    * truncation check) and every rejection names the defect.
    */
  private[graft] def wavLayout(b: Array[Byte]): (Int, Int, Int, Int) = {
    require(b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE payload")
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = 0; var channels = 0
    var dataOff = -1; var dataSize = 0
    while (pos + 8 <= b.length) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = buf.getInt(pos + 4)
      val body = pos + 8
      // a negative size would stall the walk (pos stops advancing);
      // long math so a huge positive size cannot wrap the bound check
      require(size >= 0, s"WAV chunk '$id' has negative size $size")
      require(body.toLong + size <= b.length, s"WAV truncated in chunk '$id'")
      id match {
        case "fmt " =>
          require(size >= 16, s"WAV fmt chunk too small ($size bytes)")
          val fmt = buf.getShort(body)
          require(fmt == 1, s"unsupported WAV format code $fmt (PCM only)")
          channels = buf.getShort(body + 2)
          require(channels >= 1, s"WAV has $channels channels")
          rate = buf.getInt(body + 4)
          val bits = buf.getShort(body + 14)
          require(bits == 16, s"unsupported WAV bit depth $bits")
        case "data" =>
          require(rate > 0, "WAV data chunk before fmt")
          dataOff = body; dataSize = size
        case _ => () // LIST/INFO/etc: skip
      }
      pos = body + size + (size & 1) // chunks are 2-byte aligned
    }
    require(dataOff >= 0, "WAV has no data chunk")
    (channels, rate, dataOff, dataSize)
  }

  private[graft] def decodeWav(b: Array[Byte]): Decoded = {
    val (channels, rate, off, dsize) = wavLayout(b)
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var sum = 0L
    var i = off
    while (i + 1 < off + dsize) { sum += buf.getShort(i).toLong; i += 2 }
    Decoded("wav", 0, 0, channels, rate, dsize / 2, sum)
  }

  // ------------------------------------------------------------------
  // Feature extraction
  // ------------------------------------------------------------------

  /** Decoded media features; image-only and audio-only fields are
    * null for the other modality. `duration_ms` is exact when the
    * sample count divides the rate (the synthesized fixtures do).
    */
  case class MediaFeatures(doc_id: Long, media_type: String, format: String,
                           n_bytes: Long,
                           width: Option[Int], height: Option[Int],
                           channels: Int,
                           sample_rate: Option[Int], duration_ms: Option[Long],
                           n_values: Long, sum_values: Long)

  /** Per-partition batched REAL decode over the binary column. */
  def extractFeatures(spark: SparkSession, mf: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    mf.mapPartitions { it =>
      it.map { m =>
        val d = decodeMedia(m.media)
        val isImage = d.format == "ppm" || d.format == "bmp"
        MediaFeatures(m.doc_id, m.media_type, d.format, m.media.length.toLong,
          width = if (isImage) Some(d.width) else None,
          height = if (isImage) Some(d.height) else None,
          channels = d.channels,
          sample_rate = if (isImage) None else Some(d.sampleRate),
          // nValues counts interleaved samples; duration is FRAMES
          // (samples per channel) over the rate
          duration_ms = if (isImage) None
            else Some(d.nValues / math.max(1, d.channels) * 1000L / d.sampleRate),
          n_values = d.nValues, sum_values = d.sumValues)
      }
    }
  }

  /** Text-payload feature pass (the manifest's text/plain rows):
    * byte length + exact byte sum — the degenerate "decode" for the
    * modality with no container to parse.
    */
  case class TextFeatures(doc_id: Long, n_bytes: Long, media_type: String, checksum: Long)

  def textFeatures(spark: SparkSession, mf: DataFrame): Dataset[TextFeatures] = {
    import spark.implicits._
    mf.as[MediaRow].mapPartitions { it =>
      it.map { m =>
        var cs = 0L
        var i = 0
        while (i < m.media.length) { cs += m.media(i) & 0xffL; i += 1 }
        TextFeatures(m.doc_id, m.media.length.toLong, m.media_type, cs)
      }
    }
  }

  /** One resized image; `media` holds the re-encoded PPM bytes. */
  case class ResizedRow(doc_id: Long, media: Array[Byte], media_type: String,
                        width: Int, height: Int)

  /** REAL image resize: decode (PPM or BMP), nearest-neighbor scale to
    * (w, h), re-encode as PPM P6 — pure JVM, partition-local, no
    * shuffle. Non-image payloads throw (resampling audio is a
    * different operator).
    */
  def resize(spark: SparkSession, mf: Dataset[MediaRow], w: Int, h: Int): Dataset[ResizedRow] = {
    import spark.implicits._
    mf.mapPartitions { it =>
      it.map { m =>
        val (sw, sh, pixels) = decodePixels(m.media)
        val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + w * h * 3)
        System.arraycopy(header, 0, out, 0, header.length)
        var y = 0
        while (y < h) {
          val sy = y * sh / h
          var x = 0
          while (x < w) {
            val sx = x * sw / w
            val src = (sy * sw + sx) * 3
            val dst = header.length + (y * w + x) * 3
            out(dst) = pixels(src); out(dst + 1) = pixels(src + 1); out(dst + 2) = pixels(src + 2)
            x += 1
          }
          y += 1
        }
        ResizedRow(m.doc_id, out, "image/x-portable-pixmap", w, h)
      }
    }
  }

  /** Decode an image payload to (width, height, packed RGB). BMP rows
    * are stored bottom-up and BGR — normalized to top-down RGB here so
    * resize/featurize see one layout.
    */
  private[graft] def decodePixels(b: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      val (w, h, pos) = ppmHeader(b)
      (w, h, java.util.Arrays.copyOfRange(b, pos, pos + w * h * 3))
    } else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
      val (w, h, dataOffset, topDown, rowSize) = bmpHeader(b)
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        var x = 0
        while (x < w) {
          val src = dataOffset + srcRow * rowSize + x * 3
          val dst = (y * w + x) * 3
          out(dst) = b(src + 2); out(dst + 1) = b(src + 1); out(dst + 2) = b(src) // BGR→RGB
          x += 1
        }
        y += 1
      }
      (w, h, out)
    } else throw new IllegalArgumentException("not a PPM/BMP image payload")
  }

  /** One sampled frame/window of a media object. */
  case class FrameRow(doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** Sample every `everyN`-th window of the payload — for WAV this is
    * REAL audio windowing (fixed sample-count windows of the decoded
    * PCM stream); for other payloads a format-agnostic byte chunking
    * (video codecs aren't pure-JVM-decodable; the explode shape — one
    * row per sampled window, partition-local, no shuffle — is the
    * production plumbing either way).
    */
  def frameSample(spark: SparkSession, mf: DataFrame, everyN: Int = 10,
                  frameBytes: Int = 256): Dataset[FrameRow] = {
    import spark.implicits._
    mf.as[MediaRow].mapPartitions { it =>
      it.flatMap { m =>
        // WAV: window exactly the PCM body located by the same chunk
        // walk the decoder uses (a chunk between fmt and data must
        // never be emitted as audio); anything else: raw byte chunks
        val (off, limit) =
          if (m.media.length >= 12 && new String(m.media, 0, 4, "US-ASCII") == "RIFF" &&
            new String(m.media, 8, 4, "US-ASCII") == "WAVE") {
            val (_, _, dataOff, dataSize) = wavLayout(m.media)
            (dataOff, dataOff + dataSize)
          } else (0, m.media.length)
        val nFrames = math.max(1, (limit - off) / frameBytes)
        (0 until nFrames by everyN).iterator.map { f =>
          val start = off + f * frameBytes
          val end = math.min(start + frameBytes, limit)
          FrameRow(m.doc_id, f, java.util.Arrays.copyOfRange(m.media, start, end))
        }
      }
    }
  }
}
