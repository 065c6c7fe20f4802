package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** Real audio codec: RIFF/WAVE PCM — the audio-modality member of the
  * multimodal seam (SURVEY §7.2.8; siblings: PPM `Multimodal.decodePpm`,
  * PNG/JPEG via `javax.imageio`). WAV is the one audio container whose
  * encoder AND decoder fit in dependency-free code (RIFF chunk walk +
  * little-endian PCM samples, per the public RIFF/WAVE spec), and PCM is
  * lossless — so like PPM/PNG the DECODED samples are the cross-engine
  * contract and every feature replays closed-form from the generation
  * rule.
  *
  * Scale posture (identical to the image codecs): decode is scan-local
  * `mapPartitions`, payloads never shuffle — only the fixed-width typed
  * feature row leaves the scan. Frame-level features (the audio form of
  * video frame-sampling) reduce inside the decoder, so a 10-minute clip
  * and a 1-second clip both emit ONE row.
  */
object Audio {

  /** Decoded WAV audit row — all exact integers.
    *
    * Signal features: `sum_abs`/`peak_abs` (amplitude mass and peak),
    * `zero_crossings` (sign(x) = x ≥ 0 transitions — the classic cheap
    * pitch/noisiness proxy), and the frame quartet: fixed `frame` sample
    * windows, per-frame energy Σs², peak frame by energy (ties → min
    * index) — the loudness hotspot a caption-alignment or silence screen
    * reads.
    */
  case class WavFeatures(doc_id: Long, sample_rate: Long, n_samples: Long,
      sum_abs: Long, peak_abs: Long, zero_crossings: Long,
      n_frames: Long, peak_frame_idx: Long, peak_frame_energy: Long)

  /** The deterministic integer sawtooth: sample j of doc `seed` is
    * ((seed·31 + 7j) mod 4096) − 2048 ∈ [−2048, 2047] — closed-form, so
    * any engine recomputes every decoded sample (the `gradientPixel`
    * discipline on the time axis).
    */
  def sawtoothSample(seed: Long, j: Long): Int =
    (((seed * 31 + 7 * j) % 4096) - 2048).toInt

  private def putLe32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putAscii(b: Array[Byte], off: Int, s: String): Unit = {
    var i = 0
    while (i < s.length) { b(off + i) = s.charAt(i).toByte; i += 1 }
  }

  /** Encode a genuine RIFF/WAVE file: 16-bit PCM mono little-endian
    * samples of the deterministic sawtooth. When `junkChunk` is set, a
    * `LIST` metadata chunk (with odd-size pad byte, as real encoders
    * emit) sits between `fmt ` and `data`, so the decoder's chunk walk
    * is actually exercised — a header-offset shortcut would misread
    * every such file.
    */
  def encodeWav(seed: Long, nSamples: Int, sampleRate: Int,
      junkChunk: Boolean = false): Array[Byte] = {
    require(nSamples >= 1 && sampleRate >= 1,
      s"bad wav params: n=$nSamples rate=$sampleRate")
    val junk = if (junkChunk) {
      val payload = s"INFOgraft seed $seed".getBytes("US-ASCII")
      val padded = payload.length + (payload.length & 1) // RIFF pads odd
      val c = new Array[Byte](8 + padded)
      putAscii(c, 0, "LIST")
      putLe32(c, 4, payload.length.toLong)
      System.arraycopy(payload, 0, c, 8, payload.length)
      c
    } else Array.emptyByteArray
    val dataBytes = nSamples * 2
    val out = new Array[Byte](12 + 24 + junk.length + 8 + dataBytes)
    putAscii(out, 0, "RIFF")
    putLe32(out, 4, (out.length - 8).toLong)
    putAscii(out, 8, "WAVE")
    putAscii(out, 12, "fmt ")
    putLe32(out, 16, 16L) // PCM fmt chunk body size
    putLe16(out, 20, 1) // audioFormat = PCM
    putLe16(out, 22, 1) // mono
    putLe32(out, 24, sampleRate.toLong)
    putLe32(out, 28, sampleRate.toLong * 2) // byteRate
    putLe16(out, 32, 2) // blockAlign
    putLe16(out, 34, 16) // bitsPerSample
    System.arraycopy(junk, 0, out, 36, junk.length)
    val dataOff = 36 + junk.length
    putAscii(out, dataOff, "data")
    putLe32(out, dataOff + 4, dataBytes.toLong)
    var j = 0
    while (j < nSamples) {
      putLe16(out, dataOff + 8 + 2 * j, sawtoothSample(seed, j.toLong) & 0xffff)
      j += 1
    }
    out
  }

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Parsed RIFF/WAVE layout: fmt fields + data chunk location. */
  private[graft] case class WavLayout(rate: Long, channels: Int,
      bits: Int, dataOff: Int, dataLen: Int)

  /** The REAL chunk walk shared by every WAV reader here: verify the
    * RIFF/WAVE container and size, iterate chunks (honoring the
    * odd-size pad byte), parse `fmt ` (PCM + 16-bit enforced — a codec
    * must not fabricate samples; channel-count policy is the
    * CALLER's), locate `data`.
    */
  private def parseWav(docId: Long, bytes: Array[Byte]): WavLayout = {
    require(bytes.length >= 12 && fourcc(bytes, 0) == "RIFF" &&
      fourcc(bytes, 8) == "WAVE", s"doc $docId: not a RIFF/WAVE file")
    require(le32(bytes, 4) == bytes.length - 8,
      s"doc $docId: RIFF size ${le32(bytes, 4)} != ${bytes.length - 8}")
    var rate = -1L
    var channels = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = fourcc(bytes, i)
      // Size stays Long until range-checked: a crafted 32-bit size
      // >= 2^31 (or 0xFFFFFFF8 ≈ -8 after toInt) would wrap negative,
      // slip past the overrun check, and stall the walk forever.
      val sizeL = le32(bytes, i + 4)
      require(sizeL >= 0 && i + 8 + sizeL <= bytes.length,
        s"doc $docId: chunk $id size $sizeL overruns the file")
      val size = sizeL.toInt
      if (id == "fmt ") {
        require(size >= 16, s"doc $docId: fmt chunk too short: $size")
        val audioFormat = le16(bytes, i + 8)
        channels = le16(bytes, i + 10)
        bits = le16(bytes, i + 22)
        require(audioFormat == 1 && bits == 16,
          s"doc $docId: unsupported wav (fmt=$audioFormat bits=$bits; " +
            "PCM 16-bit only)")
        rate = le32(bytes, i + 12)
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = size
      }
      i += 8 + size + (size & 1) // odd chunk sizes pad one byte
    }
    require(rate > 0, s"doc $docId: no fmt chunk")
    require(dataOff >= 0, s"doc $docId: no data chunk")
    require(dataLen % 2 == 0, s"doc $docId: odd PCM16 data size $dataLen")
    WavLayout(rate, channels, bits, dataOff, dataLen)
  }

  /** Decode a mono RIFF/WAVE file via the shared chunk walk (mono
    * enforced loudly — the stereo path is [[decodeWavStereo]]), then
    * one pass over the little-endian samples computing every feature.
    * `frame` is the frame-sample window size in samples (the last
    * frame may be short).
    */
  def decodeWav(docId: Long, bytes: Array[Byte], frame: Int): WavFeatures = {
    require(frame >= 1, s"frame must be >= 1: $frame")
    val lay = parseWav(docId, bytes)
    require(lay.channels == 1,
      s"doc $docId: expected mono, got ${lay.channels} channels")
    val (rate, dataOff, dataLen) = (lay.rate, lay.dataOff, lay.dataLen)
    val n = dataLen / 2
    var (sumAbs, zc) = (0L, 0L)
    var peakAbs = 0L
    var prevNonNeg = true
    var frameEnergy = 0L
    var peakFrameEnergy = -1L
    var peakFrameIdx = -1L
    var frameIdx = 0L
    var j = 0
    while (j < n) {
      val s = le16(bytes, dataOff + 2 * j).toShort.toInt
      val a = math.abs(s).toLong
      sumAbs += a
      if (a > peakAbs) peakAbs = a
      val nonNeg = s >= 0
      if (j > 0 && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg
      frameEnergy += s.toLong * s
      if (j % frame == frame - 1 || j == n - 1) { // frame boundary
        if (frameEnergy > peakFrameEnergy) { // strict: ties keep min idx
          peakFrameEnergy = frameEnergy
          peakFrameIdx = frameIdx
        }
        frameEnergy = 0L
        frameIdx += 1
      }
      j += 1
    }
    WavFeatures(docId, rate, n.toLong, sumAbs, peakAbs, zc,
      (n.toLong + frame - 1) / frame, peakFrameIdx, peakFrameEnergy)
  }

  /** Decoded STEREO audit row — per-channel amplitude mass and peaks
    * plus the left-share balance in exact truncated bp (the
    * channel-imbalance signal a broken capture pipeline shows).
    */
  case class StereoFeatures(doc_id: Long, sample_rate: Long,
      n_samples: Long, sum_abs_l: Long, sum_abs_r: Long,
      peak_abs_l: Long, peak_abs_r: Long, balance_bp: Long)

  /** Encode a genuine STEREO RIFF/WAVE file: 16-bit PCM, 2 channels,
    * L/R samples INTERLEAVED per frame with blockAlign 4 and byteRate
    * rate·4 — the layout details a mono-only reader gets wrong
    * silently, which is why the stereo path earns its own gate. The
    * left channel carries the sawtooth; the right carries it phase-
    * shifted by half the period (+2048 before the mod) — closed-form
    * both.
    */
  def encodeWavStereo(seed: Long, nSamples: Int,
      sampleRate: Int): Array[Byte] = {
    require(nSamples >= 1 && sampleRate >= 1,
      s"bad wav params: n=$nSamples rate=$sampleRate")
    val dataBytes = nSamples * 4
    val out = new Array[Byte](12 + 24 + 8 + dataBytes)
    putAscii(out, 0, "RIFF")
    putLe32(out, 4, (out.length - 8).toLong)
    putAscii(out, 8, "WAVE")
    putAscii(out, 12, "fmt ")
    putLe32(out, 16, 16L)
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, 2) // stereo
    putLe32(out, 24, sampleRate.toLong)
    putLe32(out, 28, sampleRate.toLong * 4) // byteRate = rate * blockAlign
    putLe16(out, 32, 4) // blockAlign = channels * 2
    putLe16(out, 34, 16)
    putAscii(out, 36, "data")
    putLe32(out, 40, dataBytes.toLong)
    var j = 0
    while (j < nSamples) {
      putLe16(out, 44 + 4 * j, sawtoothSample(seed, j.toLong) & 0xffff)
      putLe16(out, 44 + 4 * j + 2,
        stereoRightSample(seed, j.toLong) & 0xffff)
      j += 1
    }
    out
  }

  /** The right channel's closed-form rule: the sawtooth phase-shifted
    * by half the 4096 period.
    */
  def stereoRightSample(seed: Long, j: Long): Int =
    (((seed * 31 + 7 * j + 2048) % 4096) - 2048).toInt

  /** Encode arbitrary PCM16 L/R channels as a stereo RIFF/WAVE file
    * (interleaved frames — the generic seam [[encodeWavStereo]]'s
    * fixture rides; q299 feeds it a fake-stereo render).
    */
  def encodeWavStereoSamples(left: Array[Int], right: Array[Int],
      sampleRate: Int): Array[Byte] = {
    require(left.length == right.length && left.nonEmpty &&
      sampleRate >= 1,
      s"bad stereo params: l=${left.length} r=${right.length} " +
        s"rate=$sampleRate")
    val n = left.length
    val dataBytes = n * 4
    val out = new Array[Byte](12 + 24 + 8 + dataBytes)
    putAscii(out, 0, "RIFF")
    putLe32(out, 4, (out.length - 8).toLong)
    putAscii(out, 8, "WAVE")
    putAscii(out, 12, "fmt ")
    putLe32(out, 16, 16L)
    putLe16(out, 20, 1)
    putLe16(out, 22, 2)
    putLe32(out, 24, sampleRate.toLong)
    putLe32(out, 28, sampleRate.toLong * 4)
    putLe16(out, 32, 4)
    putLe16(out, 34, 16)
    putAscii(out, 36, "data")
    putLe32(out, 40, dataBytes.toLong)
    var j = 0
    while (j < n) {
      putLe16(out, 44 + 4 * j, left(j) & 0xffff)
      putLe16(out, 44 + 4 * j + 2, right(j) & 0xffff)
      j += 1
    }
    out
  }

  /** Decode a stereo RIFF/WAVE file via the shared chunk walk (2
    * channels enforced loudly), de-interleaving L/R frames in one
    * pass. `balance_bp` = sum|L|·10⁴ div (sum|L| + sum|R|), truncated
    * — exact in any engine.
    */
  def decodeWavStereo(docId: Long, bytes: Array[Byte]): StereoFeatures = {
    val lay = parseWav(docId, bytes)
    require(lay.channels == 2,
      s"doc $docId: expected stereo, got ${lay.channels} channels")
    require(lay.dataLen % 4 == 0,
      s"doc $docId: stereo data not frame-aligned: ${lay.dataLen}")
    val n = lay.dataLen / 4
    var (sl, sr, pl, pr) = (0L, 0L, 0L, 0L)
    var j = 0
    while (j < n) {
      val l = math.abs(le16(bytes, lay.dataOff + 4 * j).toShort.toInt)
        .toLong
      val r = math.abs(le16(bytes, lay.dataOff + 4 * j + 2).toShort.toInt)
        .toLong
      sl += l; sr += r
      if (l > pl) pl = l
      if (r > pr) pr = r
      j += 1
    }
    val balance = if (sl + sr == 0) 5000L else sl * 10000 / (sl + sr)
    StereoFeatures(docId, lay.rate, n.toLong, sl, sr, pl, pr, balance)
  }

  /** Downmix a stereo RIFF/WAVE file to mono — the operation
    * [[envelopeHash]]'s mono-only contract points at: per frame the
    * truncating channel average (L + R) / 2 (toward zero, exact in any
    * engine), re-encoded as a valid mono wav at the same rate so the
    * result feeds any mono reader — which is how a stereo distribution
    * of a mono master re-enters the envelope-fingerprint dedup chain
    * (q299). Scan-local like every codec here.
    */
  def downmixToMono(docId: Long, bytes: Array[Byte]): Array[Byte] = {
    val lay = parseWav(docId, bytes)
    require(lay.channels == 2,
      s"doc $docId: downmix expects stereo, got ${lay.channels} channels")
    require(lay.dataLen % 4 == 0,
      s"doc $docId: stereo data not frame-aligned: ${lay.dataLen}")
    val n = lay.dataLen / 4
    val mono = new Array[Int](n)
    var j = 0
    while (j < n) {
      val l = le16(bytes, lay.dataOff + 4 * j).toShort.toInt
      val r = le16(bytes, lay.dataOff + 4 * j + 2).toShort.toInt
      mono(j) = (l + r) / 2 // Java division: truncates toward zero
      j += 1
    }
    encodeWavSamples(mono, lay.rate.toInt)
  }

  /** Batched real WAV decode over partitions — the shared codec seam:
    * payloads never shuffle, only typed feature rows.
    */
  def decodeWavFeatures(media: Dataset[Multimodal.MediaRecord], frame: Int)(
      implicit spark: SparkSession): Dataset[WavFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(r => decodeWav(r.doc_id,
      if (r.payload == null) Array.emptyByteArray else r.payload, frame)))
  }

  // ------------------------------------------------------------------
  // Resample-robust near-dup fingerprinting (the E187/E246 raster
  // discipline on the time axis): container bytes and even SAMPLES are
  // encoder-private across resamplings — the amplitude ENVELOPE is the
  // audio. Fingerprint the envelope of the DECODED samples, never the
  // bytes, and the same recording at a different sample rate lands a
  // few bits away while a different recording lands far.
  // ------------------------------------------------------------------

  /** The amplitude-modulated "recording" of the q290/q294/q299 fixture
    * family: a fast-sweep base wave scaled by a per-(seed, segment)
    * hashed gain — closed-form, so any engine recomputes every sample,
    * and segment index j·60/n is POSITION-relative, so a resample maps
    * each sample into the same segment.
    *
    * Three properties were MEASURED in (not assumed of) this design,
    * each fixing a collapse an earlier form had at the 50 k-seed scale:
    *
    *  1. The base wave sweeps with stride 997, so one envelope bin
    *     (~n/60 samples) averages the whole ±2048 amplitude range and
    *     the per-bin base mass is FLAT. The original stride-7 sawtooth
    *     had ~50× bin-mass swings from its slow phase, which dominated
    *     the envelope bits and left only ~12 effective bits — birthday
    *     near-collisions by the thousands at 50 k seeds.
    *  2. The gain is a XOR-SHIFT-mixed hash of (seed, seg), never a
    *     linear form: an arithmetic progression mod 8 collapses to
    *     ~4 k distinct patterns (the r13 rule was 56-periodic — the
    *     q294 sf1 giant-cluster artifact), and even a plain
    *     multiplicative hash is affine — 1/8 of seed pairs landed
    *     within a carry of the same pattern.
    *  3. Gains come from the GAPPED alphabet {1,2,3,8,9,10}: the
    *     envelope bit rule compares bin mass × 60 against the total,
    *     i.e. gain against the per-recording mean gain (~5.5 ± 0.45),
    *     and a gain adjacent to the mean makes that bin flip under
    *     resample noise. The gap guarantees every bin sits ≥ 20 % from
    *     the threshold: measured over ALL 50 k sf1 seeds, 2× resample
    *     moves 0 bits and the closest cross-seed pair sits 9 bits
    *     apart (2×10⁸ pairs) — clean on both sides of the 8-bit gate.
    */
  def modulatedSample(seed: Long, j: Long, n: Long): Int = {
    // Scala % keeps the dividend's sign: a negative seed would turn
    // every hash residue negative (gapped-alphabet gains silently
    // wrong, and the click/burst siblings would index s(p) at p < 0)
    // AND diverge from DuckDB's % in the oracles — fail loudly.
    require(seed >= 0, s"fixture seed must be >= 0: $seed")
    val seg = j * 60 / n
    val h0 = (seed * 60 + seg + 1) * 2654435761L % 4294967296L
    val h1 = (h0 ^ (h0 >> 16)) * 40503 % 4294967296L
    val h2 = h1 ^ (h1 >> 13)
    val m = h2 % 6
    val gain = 1 + m + (if (m >= 3) 5 else 0)
    (((seed * 31 + 997 * j) % 4096 - 2048) * gain / 8).toInt
  }

  /** Encode arbitrary PCM16 samples as a RIFF/WAVE file (the generic
    * seam [[encodeWav]]'s sawtooth path rides; q290 uses it for the
    * half-rate resample leg).
    */
  def encodeWavSamples(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    require(samples.nonEmpty && sampleRate >= 1,
      s"bad wav params: n=${samples.length} rate=$sampleRate")
    val dataBytes = samples.length * 2
    val out = new Array[Byte](12 + 24 + 8 + dataBytes)
    putAscii(out, 0, "RIFF")
    putLe32(out, 4, (out.length - 8).toLong)
    putAscii(out, 8, "WAVE")
    putAscii(out, 12, "fmt ")
    putLe32(out, 16, 16L)
    putLe16(out, 20, 1)
    putLe16(out, 22, 1)
    putLe32(out, 24, sampleRate.toLong)
    putLe32(out, 28, sampleRate.toLong * 2)
    putLe16(out, 32, 2)
    putLe16(out, 34, 16)
    putAscii(out, 36, "data")
    putLe32(out, 40, dataBytes.toLong)
    var j = 0
    while (j < samples.length) {
      putLe16(out, 44 + 2 * j, samples(j) & 0xffff)
      j += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // Shift-robust landmark fingerprint (q301/q302): the envelope
  // fingerprint is position-RELATIVE — robust to resampling, blind to
  // time SHIFTS (a leading-silence pad or a content trim moves every
  // bin). The public Shazam-style fix is landmark-PAIR hashing: anchor
  // on signal events, hash their relative geometry. Here in exact
  // integers with zero quantization jitter: landmarks are onset edges
  // (|s| crossing a threshold upward) in the DECODED samples, and each
  // hash packs two consecutive inter-onset deltas plus two quantized
  // amplitude ratios — a pad or trim shifts every onset equally, so
  // every interior hash survives bit-for-bit.
  // ------------------------------------------------------------------

  /** One onset landmark: exact sample position + its amplitude. */
  private[graft] case class Onset(pos: Long, amp: Long)

  /** The xor-shift mixer shared by the closed-form fixtures (the
    * [[modulatedSample]] discipline — affine hashes measurably
    * collapse); public so oracles' SQL replicas can be spot-checked
    * against it.
    */
  def mix32(x: Long): Long = {
    val h0 = x * 2654435761L % 4294967296L
    val h1 = (h0 ^ (h0 >> 16)) * 40503 % 4294967296L
    h1 ^ (h1 >> 13)
  }

  /** Detect onset landmarks in a decoded mono wav: sample j is an
    * onset iff |s_j| ≥ `threshold` and |s_(j−1)| < threshold (j = 0
    * counts when loud). Exact — no windows, no spectral estimate — so
    * a silence pad or an arbitrary-offset trim shifts every onset by
    * exactly the pad/trim length.
    */
  def onsets(docId: Long, bytes: Array[Byte],
      threshold: Int): Seq[Onset] = {
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    val lay = parseWav(docId, bytes)
    require(lay.channels == 1,
      s"doc $docId: onset landmarks are mono-only, " +
        s"got ${lay.channels} channels (downmix first)")
    val n = lay.dataLen / 2
    val out = scala.collection.mutable.ArrayBuffer.empty[Onset]
    var prevLoud = false
    var j = 0
    while (j < n) {
      val a = math.abs(le16(bytes, lay.dataOff + 2 * j).toShort.toInt)
        .toLong
      val loud = a >= threshold
      if (loud && !prevLoud) out += Onset(j.toLong, a)
      prevLoud = loud
      j += 1
    }
    out.toSeq
  }

  /** Landmark-pair hashes of a decoded wav: for each run of three
    * consecutive onsets (p₁,a₁)(p₂,a₂)(p₃,a₃) one 64-bit hash packing
    * the two exact deltas (Δ₁ = p₂−p₁, Δ₂ = p₃−p₂, each capped into
    * 20 bits) and the two truncated amplitude ratios r = a₂·8/a₁ and
    * a₃·8/a₂ (4 bits each, capped 15). Time-shift invariant by
    * construction: a leading pad shifts every pᵢ equally and a trim
    * that removes the first k onsets removes exactly the k leading
    * hashes — every interior hash survives bit-for-bit, which is what
    * lets a ≥ k-shared-hashes vote verify a padded/trimmed copy the
    * position-relative envelope provably misses (q301 carries the
    * envelope-miss proof in-data).
    */
  def landmarkHashes(docId: Long, bytes: Array[Byte],
      threshold: Int = 256, deltaShift: Int = 0): Seq[Long] = {
    require(deltaShift >= 0 && deltaShift < 20,
      s"deltaShift must be in [0, 20): $deltaShift")
    val on = onsets(docId, bytes, threshold)
    (0 until on.length - 2).map { i =>
      // deltaShift coarsens the delta fields — the "delta range"
      // knob of the q314 tuning table: a wider match range trades
      // chance-merge precision for jitter tolerance, and the STORED
      // operating point (ModelStore.loadLandmarkPoint) carries the
      // measured choice (0 for this zero-jitter codec)
      val d1 = math.min((on(i + 1).pos - on(i).pos) >> deltaShift,
        (1L << 20) - 1)
      val d2 = math.min((on(i + 2).pos - on(i + 1).pos) >> deltaShift,
        (1L << 20) - 1)
      val r1 = math.min(on(i + 1).amp * 8 / on(i).amp, 15L)
      val r2 = math.min(on(i + 2).amp * 8 / on(i + 1).amp, 15L)
      (((d1 << 20) | d2) << 8) | (r1 << 4) | r2
    }
  }

  /** The q301/q302 fixture "recording": a click train over a quiet
    * noise floor — the transient-rich signal landmark systems are
    * built for, closed-form so any engine recomputes every sample.
    * Background |b| ≤ 40 (stride-997 fast sweep over [−40, 40]); m
    * clicks of 3 samples each at hashed gaps gᵢ = 150 + mix(…) mod 250
    * and hashed 8-level amplitudes Aᵢ = 1500 + (mix(…) mod 8)·64 —
    * far above any onset threshold in (40, 1500]. Samples fit PCM16.
    */
  def clickTrainSample(seed: Long, j: Long, n: Long): Int = {
    require(seed >= 0, s"fixture seed must be >= 0: $seed")
    // closed-form membership: click i starts at p_i; p_0 = 200 +
    // mix(seed*1024+1000) mod 200, p_{i+1} = p_i + 3 + g_i
    var p = 200 + mix32(seed * 1024 + 1000) % 200
    var i = 0L
    while (p + 3 <= n - 100) {
      if (j >= p && j < p + 3)
        return (1500 + mix32(seed * 1024 + 2 * i + 2) % 8 * 64).toInt
      p += 3 + 150 + mix32(seed * 1024 + 2 * i + 1) % 250
      i += 1
    }
    (((seed * 31 + 997 * j) % 81) - 40).toInt
  }

  /** The ONE generator for the click-train rendition family shared by
    * the q302 cluster fixture, the q314 calibration sample, and the
    * q319 takedown arrivals: form 0 = the master recording, 1 = a
    * leading-silence pad of n/3 zeros (every landmark hash survives),
    * 2 = a content trim at first-onset+5 (every interior hash
    * survives). The q314 operating point is tuned on EXACTLY these
    * renditions, so the generators must never drift apart — hence one
    * definition, three callers.
    */
  def clickRendition(seed: Long, n: Int, form: Long): Array[Int] = {
    require(form >= 0 && form <= 2, s"unknown rendition form: $form")
    val master = clickTrain(seed, n)
    form match {
      case 1L => Array.fill(n / 3)(0) ++ master
      case 2L =>
        val mw = encodeWavSamples(master, 16000)
        master.drop(onsets(seed, mw, 256).head.pos.toInt + 5)
      case _ => master
    }
  }

  /** Materialize a click-train recording (the loop form of
    * [[clickTrainSample]] — O(n) instead of O(n·m)).
    */
  def clickTrain(seed: Long, n: Int): Array[Int] = {
    require(seed >= 0, s"fixture seed must be >= 0: $seed")
    val s = new Array[Int](n)
    var j = 0
    while (j < n) {
      s(j) = (((seed * 31 + 997 * j) % 81) - 40).toInt
      j += 1
    }
    var p = 200 + mix32(seed * 1024 + 1000) % 200
    var i = 0L
    while (p + 3 <= n - 100) {
      val a = (1500 + mix32(seed * 1024 + 2 * i + 2) % 8 * 64).toInt
      s(p.toInt) = a; s(p.toInt + 1) = a; s(p.toInt + 2) = a
      p += 3 + 150 + mix32(seed * 1024 + 2 * i + 1) % 250
      i += 1
    }
    s
  }

  // ------------------------------------------------------------------
  // Utterance segmentation / VAD (q308/q309): speech corpora are
  // curated at the UTTERANCE level — silence-trimming, speech-ratio
  // quality gates, per-utterance transcripts. The exact-integer form:
  // an utterance is a maximal run of samples at |s| >= threshold in
  // the DECODED signal (the energy-gate VAD every pipeline starts
  // from), reduced in one pass.
  // ------------------------------------------------------------------

  /** One utterance: start sample, length, peak amplitude. */
  case class Utterance(start: Long, len: Long, peak: Long)

  /** Segment a decoded mono wav into utterances: maximal runs of
    * |s| ≥ `threshold`. One pass, exact.
    */
  def utterances(docId: Long, bytes: Array[Byte],
      threshold: Int): Seq[Utterance] = {
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    val lay = parseWav(docId, bytes)
    require(lay.channels == 1,
      s"doc $docId: utterance segmentation is mono-only, " +
        s"got ${lay.channels} channels (downmix first)")
    val n = lay.dataLen / 2
    val out = scala.collection.mutable.ArrayBuffer.empty[Utterance]
    var start = -1L
    var peak = 0L
    var j = 0
    while (j < n) {
      val a = math.abs(le16(bytes, lay.dataOff + 2 * j).toShort.toInt)
        .toLong
      if (a >= threshold) {
        if (start < 0) { start = j.toLong; peak = 0L }
        if (a > peak) peak = a
      } else if (start >= 0) {
        out += Utterance(start, j - start, peak)
        start = -1L
      }
      j += 1
    }
    if (start >= 0) out += Utterance(start, n - start, peak)
    out.toSeq
  }

  /** One channel-attributed utterance: bounds plus which channel
    * carried it (0 = left, 1 = right) — decided by amplitude mass, the
    * two-speaker interview convention where each party sits on one
    * channel.
    */
  case class ChannelUtterance(start: Long, len: Long, channel: Int)

  /** Channel-turn diarization over a STEREO wav — the interview/
    * call-center convention made an operator: each speaker sits on one
    * channel, so speaker turns are CHANNEL turns. One pass through the
    * interleaved frames: an utterance is a maximal run of frames at
    * max(|L|, |R|) ≥ `threshold` (the q308 VAD rule lifted to stereo),
    * attributed to the channel with the larger amplitude mass over the
    * run (ties → left — with real per-channel speech vs a noise floor
    * the masses are never close). Exact integers throughout.
    */
  def channelTurns(docId: Long, bytes: Array[Byte],
      threshold: Int): Seq[ChannelUtterance] = {
    require(threshold >= 1, s"threshold must be >= 1: $threshold")
    val lay = parseWav(docId, bytes)
    require(lay.channels == 2,
      s"doc $docId: channel diarization expects stereo, " +
        s"got ${lay.channels} channels")
    require(lay.dataLen % 4 == 0,
      s"doc $docId: stereo data not frame-aligned: ${lay.dataLen}")
    val n = lay.dataLen / 4
    val out = scala.collection.mutable.ArrayBuffer.empty[ChannelUtterance]
    var start = -1L
    var (sl, sr) = (0L, 0L)
    var j = 0
    while (j < n) {
      val l = math.abs(le16(bytes, lay.dataOff + 4 * j).toShort.toInt)
        .toLong
      val r = math.abs(le16(bytes, lay.dataOff + 4 * j + 2).toShort.toInt)
        .toLong
      if (math.max(l, r) >= threshold) {
        if (start < 0) { start = j.toLong; sl = 0L; sr = 0L }
        sl += l; sr += r
      } else if (start >= 0) {
        out += ChannelUtterance(start, j - start,
          if (sl >= sr) 0 else 1)
        start = -1L
      }
      j += 1
    }
    if (start >= 0)
      out += ChannelUtterance(start, n - start, if (sl >= sr) 0 else 1)
    out.toSeq
  }

  /** The q312 fixture: a STEREO burst train — hashed bursts each
    * carried on a hashed channel (the other channel keeps its noise
    * floor), the two floors phase-shifted copies of the stride-997
    * sweep. Closed-form per burst: position (cumulative), duration
    * 100 + mix mod 300, amplitude 800 + mix mod 8 · 128, channel
    * mix mod 2.
    */
  def stereoBurstTrain(seed: Long, n: Int): (Array[Int], Array[Int]) = {
    require(seed >= 0, s"fixture seed must be >= 0: $seed")
    val l = new Array[Int](n)
    val r = new Array[Int](n)
    var j = 0
    while (j < n) {
      l(j) = (((seed * 31 + 997 * j) % 81) - 40).toInt
      r(j) = (((seed * 31 + 997 * j + 40) % 81) - 40).toInt
      j += 1
    }
    var p = 150 + mix32(seed * 4096 + 4000) % 150
    var i = 0L
    var fits = true
    while (fits) {
      val d = 100 + mix32(seed * 4096 + 4 * i + 1) % 300
      if (p + d > n - 100) fits = false
      else {
        val a = (800 + mix32(seed * 4096 + 4 * i + 2) % 8 * 128).toInt
        val ch = mix32(seed * 4096 + 4 * i) % 2
        val tgt = if (ch == 0) l else r
        var k = p
        while (k < p + d) {
          tgt(k.toInt) = if (k % 2 == 0) a else -a
          k += 1
        }
        p += d + 120 + mix32(seed * 4096 + 4 * i + 3) % 300
        i += 1
      }
    }
    (l, r)
  }

  /** The q308/q309 fixture "recording": hashed speech BURSTS over the
    * quiet floor — burst i holds |level| Aᵢ = 800 + mix(…) mod 8 · 128
    * for dᵢ = 100 + mix(…) mod 400 samples, then gᵢ = 120 + mix(…)
    * mod 300 quiet samples (the stride-997 floor, |b| ≤ 40) — all
    * closed-form, so the oracle replays utterances from ~15 burst
    * rows per doc, never samples. Burst samples alternate sign with j
    * so the signal is audio-shaped, not DC.
    */
  def burstTrain(seed: Long, n: Int): Array[Int] = {
    require(seed >= 0, s"fixture seed must be >= 0: $seed")
    val s = new Array[Int](n)
    var j = 0
    while (j < n) {
      s(j) = (((seed * 31 + 997 * j) % 81) - 40).toInt
      j += 1
    }
    var p = 150 + mix32(seed * 2048 + 3000) % 150
    var i = 0L
    var fits = true
    while (fits) {
      val d = 100 + mix32(seed * 2048 + 3 * i + 1) % 400
      if (p + d > n - 100) fits = false
      else {
        val a = (800 + mix32(seed * 2048 + 3 * i + 2) % 8 * 128).toInt
        var k = p
        while (k < p + d) {
          s(k.toInt) = if (k % 2 == 0) a else -a
          k += 1
        }
        p += d + 120 + mix32(seed * 2048 + 3 * i + 3) % 300
        i += 1
      }
    }
    s
  }

  /** The q306 fixture "recording": the gapped-gain modulated signal
    * scaled to 1/16 (|s| ≤ 160 — under any onset threshold, so the
    * ENVELOPE bits stay purely gain-driven with the measured q290
    * margins) plus SINGLE-SAMPLE clicks at hashed gaps with hashed
    * amplitudes 256–480 — loud enough to be onsets, small enough
    * (≤ 13 % of a bin's gain mass vs the ≥ 34 % gain margin) never to
    * flip an envelope bit. Measured over all 12,500 sf1 groups:
    * envelope 2×-resample drift ≤ 1 bit, content-trim distance ≥ 11
    * (past the 4-bit union gate), ZERO cross-group pairs within 4 bits
    * across 2×10⁸ pairs; landmark sets ≥ 10 hashes, resample-shared 0,
    * trim-shared ≥ 9. Wider or louder clicks measurably fail: width-4
    * amp-1500 clicks dominated bins and straddled boundaries
    * differently per leg (drift 10–16 bits).
    */
  def hybridTrain(seed: Long, n: Int): Array[Int] = {
    require(seed >= 0, s"fixture seed must be >= 0: $seed")
    val s = new Array[Int](n)
    var j = 0
    while (j < n) {
      s(j) = modulatedSample(seed, j.toLong, n.toLong) / 16
      j += 1
    }
    var p = 200 + mix32(seed * 1024 + 1000) % 200
    var i = 0L
    while (p + 1 <= n - 100) {
      s(p.toInt) = (256 + mix32(seed * 1024 + 2 * i + 2) % 8 * 32).toInt
      p += 1 + 150 + mix32(seed * 1024 + 2 * i + 1) % 250
      i += 1
    }
    s
  }

  /** [[envelopeHash]] with SILENCE-TRIM NORMALIZATION — the production
    * answer to padded copies: the envelope is computed over the signal
    * SUPPORT [first, last] sample at |s| ≥ `floor`, so leading/trailing
    * silence (digital zeros or a sub-floor noise bed) moves nothing.
    * Measured on the q306 hybrid family over 2,000 seeds: a copy
    * padded with n/3 leading + n/5 trailing zeros lands 0 bits from
    * its master (the RAW envelope moves ≥ 15 — q290's documented
    * shift-blindness), controls stay ≥ 18. Complements the landmark
    * path: silence pads fall to trim normalization, content trims to
    * landmark voting (q301/q306). Fails loudly on an all-silent
    * payload — a fingerprint of nothing identifies nothing.
    */
  def envelopeHashTrimmed(docId: Long, bytes: Array[Byte],
      floor: Int = 16): Long = {
    require(floor >= 1, s"floor must be >= 1: $floor")
    val lay = parseWav(docId, bytes)
    require(lay.channels == 1,
      s"doc $docId: envelope fingerprint is mono-only, " +
        s"got ${lay.channels} channels (downmix first)")
    val n = lay.dataLen / 2
    var lo = -1L
    var hi = -1L
    var j = 0
    while (j < n) {
      val a = math.abs(le16(bytes, lay.dataOff + 2 * j).toShort.toInt)
      if (a >= floor) { if (lo < 0) lo = j.toLong; hi = j.toLong }
      j += 1
    }
    require(lo >= 0,
      s"doc $docId: all-silent wav (floor $floor), nothing to fingerprint")
    val len = hi - lo + 1
    val bins = new Array[Long](60)
    var total = 0L
    j = lo.toInt
    while (j <= hi) {
      val a = math.abs(le16(bytes, lay.dataOff + 2 * j).toShort.toInt)
        .toLong
      bins((((j - lo) * 60) / len).toInt) += a
      total += a
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (bins(b) * 60 > total) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** 60-bit amplitude-envelope fingerprint of a DECODED wav: |sample j|
    * lands in bin ⌊j·60/n⌋, bit b set iff bin_b·60 > total (the
    * division-free blockhash rule on the time axis). Bins are
    * POSITION-relative, so a resampled copy of the same recording
    * produces near-identical bins (each bin just holds every k-th
    * sample of the same envelope region) — measured on the q290
    * fixture over ALL 50,000 sf1 seeds: 0 bits across a 2× resample,
    * ≥ 14 bits between adjacent-seed recordings and ≥ 9 across the
    * full 2×10⁸ cross-seed pair space, gates at 8
    * (`AudioFingerprintSpec`).
    * Scan-local one-pass like every codec here.
    */
  def envelopeHash(docId: Long, bytes: Array[Byte]): Long = {
    val lay = parseWav(docId, bytes) // shared real chunk walk
    require(lay.channels == 1,
      s"doc $docId: envelope fingerprint is mono-only, " +
        s"got ${lay.channels} channels (downmix first)")
    val (dataOff, dataLen) = (lay.dataOff, lay.dataLen)
    val n = dataLen / 2
    require(n >= 1, s"doc $docId: empty wav")
    val bins = new Array[Long](60)
    var total = 0L
    var j = 0
    while (j < n) {
      val a = math.abs(le16(bytes, dataOff + 2 * j).toShort.toInt).toLong
      bins(((j.toLong * 60) / n).toInt) += a
      total += a
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 60) {
      if (bins(b) * 60 > total) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
