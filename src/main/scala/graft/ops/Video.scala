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

  // ------------------------------------------------------------------
  // Cross-video near-dup (q300): per-scene keyframe BLOCKHASHES as the
  // clip fingerprint — the q252 raster discipline composed with the
  // q295 keyframe election, in ONE decode pass. A re-encoded duplicate
  // (here the exact closed form: a 2x pixel-duplication upscale — every
  // container byte and every plane byte count differs) keeps identical
  // blockhashes because blocks scale uniformly; a trimmed duplicate
  // keeps every surviving scene's keyframe hash. Payloads never
  // shuffle: only (doc, scene, keyframe, hash) rows leave the scan.
  // ------------------------------------------------------------------

  /** One row per scene: the elected keyframe and its 64-bit blockhash
    * (8x8 grid over the Y plane, bit = block mean > frame mean,
    * division-free as blockSum·64 > ySum — w,h multiples of 8 enforced
    * so blocks are exact).
    */
  case class KeyframeHash(doc_id: Long, scene: Long, keyframe: Long,
      kf_hash: Long)

  /** Decode a Y4M clip once, segmenting scenes at the |Δmean| >
    * `cutMeanDelta` rule (division-free), electing each scene's
    * brightest frame (ties → earliest), and emitting that keyframe's
    * Y-plane blockhash — all in the same frame walk, so a 2-hour clip
    * streams through without buffering more than one frame's 64 block
    * sums plus the current best.
    */
  def sceneKeyframeHashes(docId: Long, bytes: Array[Byte],
      cutMeanDelta: Int): Seq[KeyframeHash] = {
    require(cutMeanDelta >= 1, s"cutMeanDelta must be >= 1: $cutMeanDelta")
    val (w, h, hdrEnd) = parseY4mHeader(docId, bytes)
    require(w % 8 == 0 && h % 8 == 0,
      s"doc $docId: blockhash needs dims divisible by 8, got ${w}x$h")
    val ySize = w * h
    val planeLen = 3 * ySize
    val out = scala.collection.mutable.ArrayBuffer.empty[KeyframeHash]
    var i = hdrEnd
    var f = 0L
    var prevYSum = -1L
    var scene = 0L
    var bestYSum = -1L
    var bestFrame = -1L
    var bestBlocks: Array[Long] = null
    def hashOf(blocks: Array[Long], ySum: Long): Long = {
      var fp = 0L
      var b = 0
      while (b < 64) { // blockSum/npix > ySum/(64*npix) <=> sum*64 > ySum
        if (blocks(b) * 64 > ySum) fp |= (1L << b)
        b += 1
      }
      fp
    }
    while (i < bytes.length) {
      val fm = "FRAME"
      require(i + fm.length <= bytes.length &&
        new String(bytes, i, fm.length, "US-ASCII") == fm,
        s"doc $docId: missing FRAME marker at byte $i")
      i += fm.length
      while (i < bytes.length && bytes(i) != '\n') i += 1
      require(i < bytes.length, s"doc $docId: unterminated FRAME header")
      i += 1
      require(i + planeLen <= bytes.length, s"doc $docId: truncated frame $f")
      var ySum = 0L
      val blocks = new Array[Long](64)
      var k = 0
      while (k < ySize) {
        val v = (bytes(i + k) & 0xff).toLong
        ySum += v
        blocks(((k / w) * 8 / h) * 8 + (k % w) * 8 / w) += v
        k += 1
      }
      i += planeLen
      if (f > 0 && math.abs(ySum - prevYSum) >
          cutMeanDelta.toLong * w * h) { // scene closes: emit keyframe
        out += KeyframeHash(docId, scene, bestFrame,
          hashOf(bestBlocks, bestYSum))
        scene += 1
        bestYSum = -1L
      }
      if (ySum > bestYSum) { // strict: ties keep the earliest frame
        bestYSum = ySum
        bestFrame = f
        bestBlocks = blocks
      }
      prevYSum = ySum
      f += 1
    }
    require(f >= 1, s"doc $docId: y4m stream has no frames")
    out += KeyframeHash(docId, scene, bestFrame,
      hashOf(bestBlocks, bestYSum))
    out.toSeq
  }

  /** Batched scene-keyframe blockhashing — the shared codec seam. */
  def keyframeHashes(media: Dataset[Multimodal.MediaRecord],
      cutMeanDelta: Int)(
      implicit spark: SparkSession): Dataset[KeyframeHash] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(r => sceneKeyframeHashes(r.doc_id,
      if (r.payload == null) Array.emptyByteArray else r.payload,
      cutMeanDelta)))
  }

  /** The q300 fixture's per-(clip, scene, block) content bit — the
    * xor-shift mixer of [[graft.ops.Audio.modulatedSample]] (an affine
    * hash measurably collapses the pattern family), so each scene's
    * keyframe blockhash carries 64 iid bits and distinct clips never
    * collide by birthday at corpus scale.
    */
  def sceneBlockBit(seedKey: Long, scene: Long, block: Int): Boolean = {
    val x = seedKey * 512 + scene * 64 + block + 1
    val h0 = x * 2654435761L % 4294967296L
    val h1 = (h0 ^ (h0 >> 16)) * 40503 % 4294967296L
    val h2 = h1 ^ (h1 >> 13)
    h2 % 2 == 1
  }

  /** The q300 fixture's plane byte: scene parity lifts by 160 (the cut
    * signal), the per-(seedKey, scene, block) hashed bit selects 90 vs
    * 10 (the blockhash payload — exactly the bits the decoder's
    * block-vs-frame-mean rule recovers), and a +1-per-frame ramp makes
    * the scene's LAST frame its brightest (the election target) without
    * moving any block bit. Chroma planes repeat the Y pattern.
    */
  def blockScenePixel(seedKey: Long, scene: Long, fin: Long, w: Int,
      h: Int, k: Int): Int = {
    val ky = k % (w * h)
    val block = ((ky / w) * 8 / h) * 8 + (ky % w) * 8 / w
    (160 * (scene % 2) + (if (sceneBlockBit(seedKey, scene, block)) 90
      else 10) + fin).toInt
  }

  /** Encode the q300 fixture clip: `nScenes` scenes of `sceneLen`
    * frames whose content scene index starts at `sceneOffset` — a
    * trimmed duplicate is the SAME seedKey rendered at offset 1 with
    * one scene fewer, a re-encoded duplicate the same seedKey at
    * doubled dims (blocks scale uniformly, so it IS the
    * pixel-duplication upscale of the master).
    */
  def encodeY4mBlockScenes(seedKey: Long, w: Int, h: Int, nScenes: Int,
      sceneLen: Int, sceneOffset: Long): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0 && nScenes >= 1 && sceneLen >= 1 &&
      sceneLen <= 6, s"bad block-scene params: ${w}x$h $nScenes x$sceneLen")
    val header =
      s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n".getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val planeLen = 3 * w * h
    val nf = nScenes * sceneLen
    val out = new Array[Byte](header.length +
      nf * (frameHdr.length + planeLen))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    var f = 0
    while (f < nf) {
      System.arraycopy(frameHdr, 0, out, pos, frameHdr.length)
      pos += frameHdr.length
      val scene = sceneOffset + f / sceneLen
      val fin = (f % sceneLen).toLong
      var k = 0
      while (k < planeLen) {
        out(pos) = blockScenePixel(seedKey, scene, fin, w, h, k).toByte
        pos += 1
        k += 1
      }
      f += 1
    }
    out
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
