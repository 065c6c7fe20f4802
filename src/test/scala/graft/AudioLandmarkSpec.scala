package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** Shift-robust landmark fingerprint (q301/q302,
  * [[Audio.landmarkHashes]]): onset detection through the real codec,
  * the closed-form click replay, exact invariance under pad/trim, the
  * control margin, and the measured proof that the position-relative
  * envelope path MISSES the padded twin the landmark path catches.
  */
class AudioLandmarkSpec extends AnyFunSuite {

  private def wav(samples: Array[Int]) =
    Audio.encodeWavSamples(samples, 16000)

  private def closedFormClicks(seed: Long, n: Int): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var p = 200 + Audio.mix32(seed * 1024 + 1000) % 200
    var i = 0L
    while (p + 3 <= n - 100) {
      out += ((p, 1500 + Audio.mix32(seed * 1024 + 2 * i + 2) % 8 * 64))
      p += 3 + 150 + Audio.mix32(seed * 1024 + 2 * i + 1) % 250
      i += 1
    }
    out.toSeq
  }

  test("onsets through the real codec are exactly the planted clicks") {
    for (seed <- Seq(0L, 7L, 123L)) {
      val n = 4000 + (seed % 7).toInt * 500 + (seed % 53).toInt
      val got = Audio.onsets(seed, wav(Audio.clickTrain(seed, n)), 256)
      assert(got.map(o => (o.pos, o.amp)) === closedFormClicks(seed, n))
    }
  }

  test("landmark hashes are bit-exact against the closed-form packing") {
    val seed = 42L
    val n = 4200
    val clicks = closedFormClicks(seed, n)
    val want = clicks.sliding(3).map { case Seq((p1, a1), (p2, a2),
        (p3, a3)) =>
      (((p2 - p1) << 20 | (p3 - p2)) << 8) |
        (math.min(a2 * 8 / a1, 15L) << 4) | math.min(a3 * 8 / a2, 15L)
    }.toSeq
    assert(Audio.landmarkHashes(seed,
      wav(Audio.clickTrain(seed, n))) === want)
  }

  test("pad keeps EVERY hash, trim keeps every interior hash, a " +
      "control shares none — and the envelope path provably misses " +
      "the padded twin the landmark path catches (150 seeds)") {
    for (sd <- 0L until 150L) {
      val n = 4000 + (sd % 7).toInt * 500 + (sd % 53).toInt
      val master = Audio.clickTrain(2 * sd, n)
      val mw = wav(master)
      val mh = Audio.landmarkHashes(sd, mw).toSet
      assert(mh.size >= 3, s"seed $sd: too few hashes")
      val padded = Array.fill(n / 3)(0) ++ master
      assert(Audio.landmarkHashes(sd, wav(padded)).toSet === mh,
        s"seed $sd: pad changed the hash set")
      // ...while the position-relative envelope moved far past its
      // 8-bit dup gate: the shift-blindness the landmark path fixes
      // (measured min 14 over this range)
      val envHam = java.lang.Long.bitCount(
        Audio.envelopeHash(sd, mw) ^ Audio.envelopeHash(sd, wav(padded)))
      assert(envHam > 8, s"seed $sd: envelope did NOT miss ($envHam)")
      val first = Audio.onsets(sd, mw, 256).head.pos.toInt
      val th = Audio.landmarkHashes(sd,
        wav(master.drop(first + 5))).toSet
      assert((mh & th).size >= mh.size - 1 && (mh & th).size >= 3,
        s"seed $sd: trim lost interior hashes")
      val ch = Audio.landmarkHashes(sd,
        wav(Audio.clickTrain(2 * sd + 1, n))).toSet
      assert((mh & ch).isEmpty, s"seed $sd: control collision")
    }
  }

  test("onsets reject stereo and empty payloads loudly") {
    intercept[IllegalArgumentException] {
      Audio.onsets(1L, Audio.encodeWavStereo(1L, 10, 8000), 256)
    }
    intercept[IllegalArgumentException] {
      Audio.onsets(1L, Array.emptyByteArray, 256)
    }
  }

  test("end-to-end clusters at sf0.001: each id/4 group resolves to " +
      "{master, padded, trimmed} plus a control singleton") {
    val s = TestSpark.spark
    val rows = SparkEntry.queries("q302_landmark_clusters")(
      s, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getLong(1)).sum === 500L)
    assert(rows.length === 250)
    val byRep = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (g <- 0 until 125) {
      assert(byRep(4L * g) === 3L, s"group $g trio")
      assert(byRep(4L * g + 3) === 1L, s"group $g control")
    }
  }
}
