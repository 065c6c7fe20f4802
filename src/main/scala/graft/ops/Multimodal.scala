package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §7.2.8): media as opaque `binary`
  * payloads with typed metadata, processed by a batched per-partition
  * decode operator.
  *
  * The Spark-side plumbing — schema, encoders, partition-iterator batch
  * shape — is real and tested; the decode itself is a STUB (this
  * container has no image/audio codecs): a deterministic fake that
  * derives "features" from the raw bytes. Swapping in a real decoder
  * (JPEG → pixels, PCM → spectrogram) changes only [[decodeStub]].
  *
  * Scale posture: decode is the textbook `mapPartitions` case — genuinely
  * imperative per-record work (a codec) that no relational primitive
  * expresses. It runs scan-locally (no shuffle), streams the partition
  * iterator (no per-partition materialization), and keeps one codec
  * instance per partition rather than per row. Binary payloads stay
  * off the shuffle path: features are extracted first, and downstream
  * joins/aggregations carry only the narrow feature columns.
  */
object Multimodal {

  /** A media record: id + opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String)

  /** Stub "decoded" features — deterministic functions of the bytes. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, head_sum: Long,
      checksum: String)

  /** Wrap a text table as media records (payload = utf-8 bytes) — the
    * corpus has no true binary column, so documents stand in for blobs.
    */
  def asMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"),
        encode(col("text"), "utf-8").as("payload"),
        lit("txt").as("format"))
      .as[MediaRecord]
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** Unsigned byte sum — the stub "brightness" shared by every codec. */
  private def byteSum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  /** The per-record stub decode: byte count, sum of the first 16 bytes
    * (a fake "brightness"), md5 checksum. Deterministic, so the DuckDB
    * oracle can recompute it from the text column.
    */
  def decodeStub(r: MediaRecord, md: MessageDigest): MediaFeatures = {
    val payload = if (r.payload == null) Array.emptyByteArray else r.payload
    md.reset()
    MediaFeatures(r.doc_id, payload.length.toLong, byteSum(payload.take(16)),
      hex(md.digest(payload)))
  }

  /** Batched decode over partitions: one codec (here: one MessageDigest)
    * per partition, streaming the iterator.
    */
  def decodeFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map(decodeStub(_, md))
    }
  }

  /** A 60-bit blockhash-style perceptual fingerprint of the payload. */
  case class MediaHash(doc_id: Long, fp: Long, n_bytes: Long)

  /** Blockhash-style perceptual fingerprint (the public blockhash.io
    * idea applied to the byte signal): the payload splits into 60
    * equal chunks — byte i lands in chunk ⌊i·60/n⌋ — and bit b is set
    * iff chunk b's byte-sum exceeds the uniform share, compared
    * EXACTLY as sum·60 > total (no division, no doubles). Unlike the
    * avalanche digests ([[decodeStub]]'s md5), this is
    * LOCALITY-SENSITIVE: payloads sharing most of their content land
    * within a few bits, which is what makes Hamming-block dedup work
    * downstream. 60 bits, not 64, so no engine ever shifts into the
    * int64 sign bit. Scan-local like every codec here: one pass over
    * the bytes, payloads never shuffle, only (id, fp) flows on.
    */
  def blockHash(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaHash] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val p = if (r.payload == null) Array.emptyByteArray else r.payload
        val n = p.length
        val sums = new Array[Long](60)
        var total = 0L
        var i = 0
        while (i < n) {
          val v = p(i) & 0xff
          sums(((i.toLong * 60) / n).toInt) += v
          total += v
          i += 1
        }
        var fp = 0L
        var b = 0
        while (b < 60) {
          if (sums(b) * 60 > total) fp |= (1L << b)
          b += 1
        }
        MediaHash(r.doc_id, fp, n.toLong)
      }
    }
  }

  /** A sampled "frame" of a media payload: fixed-size byte window with
    * its byte-sum (a fake "brightness", byte-exact in any engine) and
    * checksum. The video-frame-extraction shape: one record expands to
    * O(payload/frameSize) rows.
    */
  case class Frame(doc_id: Long, frame_idx: Long, frame_len: Long,
      frame_sum: Long, frame_checksum: String)

  /** A resized payload's features: original and reduced sizes plus the
    * checksum of the reduced bytes (byte-exact — the oracle recomputes
    * the same stride over the text column).
    */
  case class Resized(doc_id: Long, orig_bytes: Long, resized_bytes: Long,
      resized_sum: Long, resized_checksum: String)

  /** Resize (stub: keep every `stride`-th byte, the nearest-neighbor
    * downsample shape — a real image resize changes only the inner
    * loop). Scan-local like decode: one "codec" per partition, payload
    * never shuffles, only the narrow resized features flow on. The N→1
    * reduction is the mirror of [[sampleFrames]]' 1→N expansion,
    * completing the decode / feature-extract / resize / frame-sample
    * quartet.
    */
  def resizeStub(media: Dataset[MediaRecord], stride: Int)(implicit spark: SparkSession): Dataset[Resized] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val reduced = Array.ofDim[Byte]((payload.length + stride - 1) / stride)
        var i = 0
        while (i < reduced.length) { reduced(i) = payload(i * stride); i += 1 }
        md.reset()
        Resized(r.doc_id, payload.length.toLong, reduced.length.toLong,
          byteSum(reduced), hex(md.digest(reduced)))
      }
    }
  }

  /** Frame sampling (stub: byte windows stand in for decoded frames) —
    * the 1→N expansion stays scan-local (flatMap inside mapPartitions,
    * no shuffle), and only fixed-size frame features flow downstream,
    * never the full payload.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int)(implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val payload = if (r.payload == null) Array.emptyByteArray else r.payload
        val n = (payload.length + frameSize - 1) / frameSize
        (0 until n).iterator.map { f =>
          val from = f * frameSize
          val frame = payload.slice(from,
            math.min(from + frameSize, payload.length))
          md.reset()
          Frame(r.doc_id, f.toLong, frame.length.toLong, byteSum(frame),
            hex(md.digest(frame)))
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Real codec: binary PPM (P6) — the one public image format whose
  // encoder AND decoder fit in dependency-free code (header + raster,
  // netpbm spec). This replaces the stub for one end-to-end path:
  // q208 generates genuine P6 files, parses them back with a real
  // header tokenizer (whitespace runs, '#' comments), and the oracle
  // recomputes every decoded number from the generation rule — so the
  // gate exercises actual decode, not byte bookkeeping.
  // ------------------------------------------------------------------

  /** Decoded P6 features: dims and maxval from the parsed header,
    * per-channel raster sums, and the whole-file byte-sum checksum
    * (header ASCII + raster) — all exact integers.
    */
  case class PpmFeatures(doc_id: Long, width: Long, height: Long,
      maxval: Long, r_sum: Long, g_sum: Long, b_sum: Long,
      checksum: Long)

  /** Encode a deterministic P6 image: `P6\n<w> <h>\n255\n` then a
    * w·h·3 raster with byte j = (seed·31 + j) mod 256 — arithmetic the
    * oracle replays in closed form.
    */
  def encodePpm(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims: ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val raster = new Array[Byte](width * height * 3)
    var j = 0
    while (j < raster.length) {
      raster(j) = ((seed * 31 + j) % 256).toByte
      j += 1
    }
    header ++ raster
  }

  /** Parsed P6 header: dims, maxval, and the raster's byte offset. */
  private def parsePpmHeader(docId: Long,
      bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      s"doc $docId: not a P6 ppm")
    var i = 2
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { // comment runs to end of line
          while (i < bytes.length && bytes(i) != '\n') i += 1
        } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else in = false
      }
    }
    def readInt(): Int = {
      skipWs()
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9',
        s"doc $docId: malformed ppm header int at byte $i")
      var v = 0
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0')
        i += 1
      }
      v
    }
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(maxval > 0 && maxval <= 255,
      s"doc $docId: unsupported maxval $maxval (1-byte samples only)")
    // exactly ONE whitespace byte separates header and raster
    require(i < bytes.length && (bytes(i) == ' ' || bytes(i) == '\t' ||
      bytes(i) == '\n' || bytes(i) == '\r'),
      s"doc $docId: missing header/raster separator")
    i += 1
    require(bytes.length - i == w * h * 3,
      s"doc $docId: raster is ${bytes.length - i} bytes, " +
        s"expected ${w * h * 3}")
    (w, h, maxval, i)
  }

  /** Parse a binary PPM (P6): magic, whitespace/comment-tolerant
    * header ints (width, height, maxval ≤ 255), the single whitespace
    * byte ending the header, then the raw raster. Throws on anything
    * malformed — a codec must fail loudly, not fabricate pixels.
    */
  def decodePpm(docId: Long, bytes: Array[Byte]): PpmFeatures = {
    val (w, h, maxval, off) = parsePpmHeader(docId, bytes)
    var (rs, gs, bs) = (0L, 0L, 0L)
    var p = off
    while (p < bytes.length) {
      rs += bytes(p) & 0xff
      gs += bytes(p + 1) & 0xff
      bs += bytes(p + 2) & 0xff
      p += 3
    }
    PpmFeatures(docId, w.toLong, h.toLong, maxval.toLong, rs, gs, bs,
      byteSumAll(bytes))
  }

  /** Real nearest-neighbor half-resize on the decoded raster grid:
    * out(x, y) = in(2x, 2y), output dims max(d/2, 1) — the actual
    * image operation the [[resizeStub]] byte-stride stands in for.
    * Decodes, samples the 2-D grid, and RE-ENCODES a valid P6, so the
    * output is itself decodable (q210 decodes it for its features).
    */
  def resizePpmHalf(docId: Long, bytes: Array[Byte]): Array[Byte] = {
    val (w, h, maxval, off) = parsePpmHeader(docId, bytes)
    val w2 = math.max(w / 2, 1)
    val h2 = math.max(h / 2, 1)
    val header = s"P6\n$w2 $h2\n$maxval\n".getBytes("US-ASCII")
    val raster = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = off + 3 * ((2 * y) * w + 2 * x)
        val dst = 3 * (y * w2 + x)
        raster(dst) = bytes(src)
        raster(dst + 1) = bytes(src + 1)
        raster(dst + 2) = bytes(src + 2)
        x += 1
      }
      y += 1
    }
    header ++ raster
  }

  private def byteSumAll(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  /** Batched real decode over partitions — the same seam as
    * [[decodeFeatures]], with the actual P6 parser in place of the
    * stub; payloads never shuffle, only the typed feature rows.
    */
  def decodePpmFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[PpmFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => decodePpm(r.doc_id,
      if (r.payload == null) Array.emptyByteArray else r.payload)))
  }

  // ------------------------------------------------------------------
  // Real PNG, second real raster format (E246/E247): decoded through
  // `javax.imageio` — JDK-bundled, zero new dependencies, a public
  // format real crawls actually carry. Unlike PPM, the ENCODED bytes
  // are not the contract (compression level and chunk layout are
  // encoder-private); PNG is lossless, so the DECODED raster is — the
  // features and the perceptual fingerprint run on decoded pixels and
  // replay closed-form from the generation rule, which is exactly the
  // discipline a real-image pHash needs (fingerprint the raster, never
  // the container bytes: two encoders of the same image differ in
  // every container byte and in zero raster bytes).
  // ------------------------------------------------------------------

  /** Decoded PNG features: dims and per-channel raster sums, exact
    * integers. No whole-file checksum on purpose — see above.
    */
  case class PngFeatures(doc_id: Long, width: Long, height: Long,
      r_sum: Long, g_sum: Long, b_sum: Long)

  /** Encode a deterministic RGB PNG: pixel (x, y) channel c holds
    * (seed·31 + 3·(y·w + x) + c) mod 256 — the SAME raster rule as
    * [[encodePpm]], so both real codecs share one closed-form oracle
    * arithmetic and the PNG path is provably decoding (not echoing
    * its input: the bytes on the wire are DEFLATE-compressed).
    */
  def encodePng(seed: Long, width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims: ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val j = 3 * (y * width + x)
        val r = ((seed * 31 + j) % 256).toInt
        val g = ((seed * 31 + j + 1) % 256).toInt
        val b = ((seed * 31 + j + 2) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "png", out),
      "no PNG writer available in this JVM")
    out.toByteArray
  }

  /** Decode any `javax.imageio`-supported image to its row-major RGB
    * raster (w·h·3 bytes) — the real-pixel signal [[blockHash]] and
    * every downstream perceptual op consume. Throws on undecodable
    * bytes (a codec must fail loudly, not fabricate pixels).
    */
  def imageRaster(docId: Long, bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $docId: not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val dst = 3 * (y * w + x)
        raster(dst) = ((rgb >> 16) & 0xff).toByte
        raster(dst + 1) = ((rgb >> 8) & 0xff).toByte
        raster(dst + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, raster)
  }

  /** Real PNG decode via `javax.imageio` → typed features. */
  def decodePng(docId: Long, bytes: Array[Byte]): PngFeatures = {
    val (w, h, raster) = imageRaster(docId, bytes)
    var (rs, gs, bs) = (0L, 0L, 0L)
    var p = 0
    while (p < raster.length) {
      rs += raster(p) & 0xff
      gs += raster(p + 1) & 0xff
      bs += raster(p + 2) & 0xff
      p += 3
    }
    PngFeatures(docId, w.toLong, h.toLong, rs, gs, bs)
  }

  /** Batched real PNG decode over partitions — same seam as
    * [[decodePpmFeatures]]; payloads never shuffle, only typed rows.
    */
  def decodePngFeatures(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[PngFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => decodePng(r.doc_id,
      if (r.payload == null) Array.emptyByteArray else r.payload)))
  }

  // ------------------------------------------------------------------
  // JPEG — the LOSSY flavor of the javax.imageio seam (q264/q265).
  // PNG proved the lossless path, where the decoded raster is the
  // cross-engine contract (closed-form oracles). JPEG is the format
  // crawls actually carry, and lossy codecs have NO cross-engine bit
  // contract: the DCT quantization is encoder-private and the IDCT
  // rounding decoder-private, so the only honest cross-engine claims
  // are (a) exact container STRUCTURE (dims — closed-form) and (b) a
  // spec-MEASURED per-channel decode tolerance against the source
  // raster. The queries therefore ship exact dims + tolerance
  // BOOLEANS (the q104 within_rank_eps discipline for approximate
  // ops); the tolerance magnitude itself is spec-verified, never
  // oracle'd. Rasters are SMOOTH gradients: JPEG's 8×8 DCT represents
  // low-frequency content within a few counts per channel at q≈0.9,
  // which is what makes a tight, meaningful tolerance claim possible
  // (per-pixel noise would decode with errors bounded only by the
  // quantization table — a vacuous claim).
  // ------------------------------------------------------------------

  /** Decoded-JPEG audit row: exact dims + the measured per-channel
    * tolerance claim against the closed-form source raster.
    */
  case class JpegFeatures(doc_id: Long, width: Long, height: Long,
      n_pixels: Long, within_tol: Boolean)

  /** The deterministic smooth source raster for doc `seed` at
    * (x, y): R ramps left→right, G ramps top→bottom, B is a per-doc
    * flat level — closed-form, so any engine can recompute it.
    */
  def gradientPixel(seed: Long, width: Int, height: Int, x: Int,
      y: Int): (Int, Int, Int) = (
    if (width == 1) 0 else (x * 255) / (width - 1),
    if (height == 1) 0 else (y * 255) / (height - 1),
    ((seed * 37) % 256).toInt)

  /** Row-major RGB gradient raster (the PNG/JPEG-shared source). */
  def gradientRaster(seed: Long, width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = gradientPixel(seed, width, height, x, y)
        val dst = 3 * (y * width + x)
        out(dst) = r.toByte; out(dst + 1) = g.toByte; out(dst + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def gradientImage(seed: Long, width: Int,
      height: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = gradientPixel(seed, width, height, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode the deterministic gradient raster as a real JPEG at an
    * explicit quality — through the JDK's actual DCT/quantize/Huffman
    * path, so decoding it exercises the real inflate-free lossy
    * pipeline (and provably does NOT echo input bytes).
    */
  def encodeJpeg(seed: Long, width: Int, height: Int,
      quality: Float = 0.92f): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bad dims: ${width}x$height")
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(
        gradientImage(seed, width, height), null, null), param)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Encode the SAME gradient raster losslessly (the q265 PNG leg). */
  def encodeGradientPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(
      gradientImage(seed, width, height), "png", out),
      "no PNG writer available in this JVM")
    out.toByteArray
  }

  /** Max per-channel absolute error of a decoded raster against the
    * closed-form gradient source — the number the tolerance claim is
    * made of. Package-visible so the spec can measure it directly.
    */
  private[graft] def gradientMaxAbsErr(seed: Long, width: Int,
      height: Int, raster: Array[Byte]): Int = {
    require(raster.length == width * height * 3,
      s"raster/dims mismatch: ${raster.length} vs ${width}x$height")
    var worst = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = gradientPixel(seed, width, height, x, y)
        val src = 3 * (y * width + x)
        worst = math.max(worst, math.max(
          math.abs((raster(src) & 0xff) - r), math.max(
            math.abs((raster(src + 1) & 0xff) - g),
            math.abs((raster(src + 2) & 0xff) - b))))
        x += 1
      }
      y += 1
    }
    worst
  }

  /** Real JPEG decode → audit row: exact dims plus the per-channel
    * tolerance claim (|decoded − source| ≤ `tol` everywhere).
    */
  def decodeJpeg(docId: Long, bytes: Array[Byte], tol: Int): JpegFeatures = {
    val (w, h, raster) = imageRaster(docId, bytes)
    JpegFeatures(docId, w.toLong, h.toLong, (w.toLong * h),
      gradientMaxAbsErr(docId, w, h, raster) <= tol)
  }

  /** Batched real JPEG decode over partitions — payloads never
    * shuffle, only typed audit rows.
    */
  def decodeJpegFeatures(media: Dataset[MediaRecord], tol: Int)(
      implicit spark: SparkSession): Dataset[JpegFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => decodeJpeg(r.doc_id,
      if (r.payload == null) Array.emptyByteArray else r.payload, tol)))
  }

  /** Content-type sniffing — the dispatcher a MIXED media crawl needs
    * before any codec runs (real crawls do not arrive sorted by
    * format; Content-Type headers lie): detect the container by its
    * magic bytes, exactly as `file(1)` does — P6 (netpbm), the 8-byte
    * PNG signature, the JPEG SOI marker, RIFF/WAVE, YUV4MPEG2 — and
    * return "unknown" (never a guess) otherwise. Scan-local, reads at
    * most 12 bytes.
    */
  def sniffFormat(bytes: Array[Byte]): String = {
    def at(off: Int, s: String): Boolean =
      bytes.length >= off + s.length &&
        s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    if (at(0, "P6")) "ppm"
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
      at(1, "PNG") && bytes(4) == 0x0d && bytes(5) == 0x0a &&
      bytes(6) == 0x1a && bytes(7) == 0x0a) "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else if (at(0, "RIFF") && at(8, "WAVE")) "wav"
    else if (at(0, "YUV4MPEG2")) "y4m"
    else "unknown"
  }

  /** Swap a media record's payload for its DECODED raster — the move
    * that points [[blockHash]]'s perceptual fingerprint at real pixels
    * (E187's "a real image pHash swaps in" claim, made runnable): the
    * container bytes are encoder-private, the raster is the image.
    */
  def toRaster(media: Dataset[MediaRecord])(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { r =>
      val (_, _, raster) = imageRaster(r.doc_id,
        if (r.payload == null) Array.emptyByteArray else r.payload)
      MediaRecord(r.doc_id, raster, "raster")
    })
  }
}
