package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** Real video codec: YUV4MPEG2 (Y4M) — the video-modality member of the
  * multimodal seam (images: PPM/PNG/JPEG; audio: `Audio` WAV). Y4M is
  * the public uncompressed interchange format (mjpegtools spec) whose
  * encoder AND decoder fit in dependency-free code: an ASCII stream
  * header (`YUV4MPEG2 W.. H.. F.. C444`), then per frame an ASCII
  * `FRAME` marker and the raw planar pixel data. Uncompressed means the
  * DECODED planes are the cross-engine contract (the PPM/PNG/WAV
  * lossless discipline on the frame axis).
  *
  * Two video-specific operations ride the decode, both reduced INSIDE
  * the scan so payloads never shuffle and a 2-hour clip emits one row:
  * per-frame luma screening (the frame-sample shape: per frame one
  * Y-plane sum, the brightness series every thumbnailer/silence-screen
  * reads) and scene-change detection — a cut between consecutive frames
  * when the mean-luma delta exceeds a threshold, compared division-free
  * as |ΔYsum| > thr·w·h.
  */
object Video {

  /** Decoded Y4M audit row — all exact integers. `y_total` sums every
    * byte of every plane (full-decode evidence), `max_y_frame` is the
    * brightest frame by Y-sum (ties → min index), `cut_frame` the first
    * detected scene cut (−1 when the clip is a single scene).
    */
  case class Y4mFeatures(doc_id: Long, width: Long, height: Long,
      n_frames: Long, y_total: Long, max_y_frame: Long, n_cuts: Long,
      cut_frame: Long)

  /** The deterministic plane byte: frame f, byte k of doc `seed` holds
    * (seed·31 + 5f + k) mod 96, lifted by +160 from the scene-cut frame
    * on — closed-form, so any engine recomputes every decoded byte.
    * The 96-range keeps within-scene frame-to-frame mean drift ≤ 35
    * while the +160 scene step is ≥ 125 — a clean margin either side
    * of the 48 threshold the queries use.
    */
  def planeByte(seed: Long, cutAt: Int, f: Int, k: Int): Int =
    (((seed * 31 + 5L * f + k) % 96) +
      (if (cutAt >= 0 && f >= cutAt) 160 else 0)).toInt

  /** Encode a genuine Y4M stream: the mjpegtools header (explicit C444
    * so plane sizes are unambiguous), then `FRAME\n` + 3·w·h plane
    * bytes per frame. `cutAt` < 0 encodes a single-scene clip.
    */
  def encodeY4m(seed: Long, width: Int, height: Int, nFrames: Int,
      cutAt: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 1,
      s"bad y4m params: ${width}x$height x$nFrames")
    val header =
      s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val planeLen = 3 * width * height
    val out = new Array[Byte](header.length +
      nFrames * (frameHdr.length + planeLen))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(frameHdr, 0, out, pos, frameHdr.length)
      pos += frameHdr.length
      var k = 0
      while (k < planeLen) {
        out(pos) = planeByte(seed, cutAt, f, k).toByte
        pos += 1
        k += 1
      }
      f += 1
    }
    out
  }

  /** Decode a Y4M stream — a REAL header parse: the `YUV4MPEG2` magic,
    * space-separated tagged parameters up to the newline (W/H required,
    * C must be 444 — a codec must fail loudly on plane layouts it does
    * not implement, never guess), then the frame loop (each frame's
    * own parameter tail is tolerated per spec) with every feature
    * reduced in the same pass. `cutMeanDelta` is the scene-cut
    * threshold on mean luma (applied division-free).
    */
  /** Parse the Y4M stream header: returns (width, height, offset of
    * the first FRAME marker). W/H required, C must be 444 — a codec
    * must fail loudly on plane layouts it does not implement.
    */
  private def parseY4mHeader(docId: Long,
      bytes: Array[Byte]): (Int, Int, Int) = {
    val magic = "YUV4MPEG2"
    require(bytes.length > magic.length &&
      new String(bytes, 0, magic.length, "US-ASCII") == magic,
      s"doc $docId: not a YUV4MPEG2 stream")
    var i = magic.length
    var w = -1
    var h = -1
    var chroma = "420" // the spec default when no C tag is present
    while (i < bytes.length && bytes(i) != '\n') {
      require(bytes(i) == ' ', s"doc $docId: malformed y4m header at $i")
      i += 1
      val tag = bytes(i).toChar
      i += 1
      val start = i
      while (i < bytes.length && bytes(i) != ' ' && bytes(i) != '\n') i += 1
      val value = new String(bytes, start, i - start, "US-ASCII")
      tag match {
        case 'W' => w = value.toInt
        case 'H' => h = value.toInt
        case 'C' => chroma = value
        case _ => // F/I/A/X parameters: parsed, not needed
      }
    }
    require(i < bytes.length, s"doc $docId: unterminated y4m header")
    i += 1 // consume the header newline
    require(w >= 1 && h >= 1, s"doc $docId: missing W/H in y4m header")
    // Header-supplied dimensions: 3·w·h must fit in Int, or the plane
    // length computed downstream overflows negative and the frame walk
    // runs backwards instead of failing loudly on the bad header.
    require(3L * w * h <= Int.MaxValue,
      s"doc $docId: y4m dimensions ${w}x$h overflow the plane size")
    require(chroma == "444",
      s"doc $docId: unsupported chroma C$chroma (C444 only)")
    (w, h, i)
  }

  def decodeY4m(docId: Long, bytes: Array[Byte],
      cutMeanDelta: Int): Y4mFeatures = {
    require(cutMeanDelta >= 1, s"cutMeanDelta must be >= 1: $cutMeanDelta")
    val (w, h, hdrEnd) = parseY4mHeader(docId, bytes)
    var i = hdrEnd
    val ySize = w * h
    val planeLen = 3 * ySize
    var (yTotal, nCuts) = (0L, 0L)
    var maxY = -1L
    var maxYFrame = -1L
    var cutFrame = -1L
    var prevYSum = -1L
    var f = 0L
    while (i < bytes.length) {
      val fm = "FRAME"
      require(i + fm.length <= bytes.length &&
        new String(bytes, i, fm.length, "US-ASCII") == fm,
        s"doc $docId: missing FRAME marker at byte $i")
      i += fm.length
      while (i < bytes.length && bytes(i) != '\n') i += 1 // frame params
      require(i < bytes.length, s"doc $docId: unterminated FRAME header")
      i += 1
      require(i + planeLen <= bytes.length,
        s"doc $docId: truncated frame $f")
      var ySum = 0L
      var k = 0
      while (k < planeLen) {
        val v = bytes(i + k) & 0xff
        yTotal += v
        if (k < ySize) ySum += v
        k += 1
      }
      i += planeLen
      if (ySum > maxY) { maxY = ySum; maxYFrame = f } // strict: ties min f
      if (f > 0 && math.abs(ySum - prevYSum) >
          cutMeanDelta.toLong * w * h) {
        nCuts += 1
        if (cutFrame < 0) cutFrame = f
      }
      prevYSum = ySum
      f += 1
    }
    require(f >= 1, s"doc $docId: y4m stream has no frames")
    Y4mFeatures(docId, w.toLong, h.toLong, f, yTotal, maxYFrame, nCuts,
      cutFrame)
  }

  /** Batched real Y4M decode over partitions — the shared codec seam:
    * payloads never shuffle, only typed feature rows.
    */
  def decodeY4mFeatures(media: Dataset[Multimodal.MediaRecord],
      cutMeanDelta: Int)(
      implicit spark: SparkSession): Dataset[Y4mFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => decodeY4m(r.doc_id,
      if (r.payload == null) Array.emptyByteArray else r.payload,
      cutMeanDelta)))
  }

  /** One row per frame: the decoded per-frame luma signal. */
  case class FrameLuma(doc_id: Long, width: Long, height: Long,
      frame: Long, y_sum: Long)

  /** Export the per-frame luma SERIES (the 1→N frame-sample expansion):
    * each clip expands to one narrow row per frame inside the scan
    * (flatMap in mapPartitions — payloads never shuffle, only
    * (id, frame, ysum) rows flow on), which is the input every
    * frame-level job reads: scene segmentation, keyframe selection,
    * silence/black-frame screens.
    */
  def frameLumas(media: Dataset[Multimodal.MediaRecord])(
      implicit spark: SparkSession): Dataset[FrameLuma] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { r =>
      val bytes =
        if (r.payload == null) Array.emptyByteArray else r.payload
      val (w, h, hdrEnd) = parseY4mHeader(r.doc_id, bytes)
      val ySize = w * h
      val planeLen = 3 * ySize
      var i = hdrEnd
      val out = scala.collection.mutable.ArrayBuffer.empty[FrameLuma]
      var f = 0L
      while (i < bytes.length) {
        val fm = "FRAME"
        require(i + fm.length <= bytes.length &&
          new String(bytes, i, fm.length, "US-ASCII") == fm,
          s"doc ${r.doc_id}: missing FRAME marker at byte $i")
        i += fm.length
        while (i < bytes.length && bytes(i) != '\n') i += 1
        require(i < bytes.length,
          s"doc ${r.doc_id}: unterminated FRAME header")
        i += 1
        require(i + planeLen <= bytes.length,
          s"doc ${r.doc_id}: truncated frame $f")
        var ySum = 0L
        var k = 0
        while (k < ySize) { ySum += bytes(i + k) & 0xff; k += 1 }
        i += planeLen
        out += FrameLuma(r.doc_id, w.toLong, h.toLong, f, ySum)
        f += 1
      }
      out.iterator
    })
  }
}
