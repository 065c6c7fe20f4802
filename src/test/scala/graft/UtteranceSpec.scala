package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** Utterance segmentation / VAD (q308/q309): exact run semantics
  * through the real codec, the closed-form burst replay, degenerate
  * classes, and the screen's keep/drop reasons.
  */
class UtteranceSpec extends AnyFunSuite {

  test("utterances are exact maximal loud runs, boundaries included") {
    val s = Array(10, 300, 300, 10, -400, 500, -400, 10, 10, 999)
    val us = Audio.utterances(1L, Audio.encodeWavSamples(s, 8000), 256)
    assert(us.map(u => (u.start, u.len, u.peak)) ===
      Seq((1L, 2L, 300L), (4L, 3L, 500L), (9L, 1L, 999L)))
    // all-quiet: no utterances; mono-only enforced
    assert(Audio.utterances(1L,
      Audio.encodeWavSamples(Array(1, -2, 3), 8000), 256).isEmpty)
    intercept[IllegalArgumentException] {
      Audio.utterances(1L, Audio.encodeWavStereo(1L, 10, 8000), 256)
    }
  }

  test("burst trains segment into exactly the planted bursts " +
      "(closed-form replay, 100 seeds)") {
    for (seed <- 0L until 100L) {
      val n = (4000 + (seed % 7) * 500 + seed % 53).toInt
      val us = Audio.utterances(seed,
        Audio.encodeWavSamples(Audio.burstTrain(seed, n), 16000), 256)
      // closed-form bursts
      val want = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)]
      var p = 150 + Audio.mix32(seed * 2048 + 3000) % 150
      var i = 0L
      var fits = true
      while (fits) {
        val d = 100 + Audio.mix32(seed * 2048 + 3 * i + 1) % 400
        if (p + d > n - 100) fits = false
        else {
          want += ((p, d,
            800 + Audio.mix32(seed * 2048 + 3 * i + 2) % 8 * 128))
          p += d + 120 + Audio.mix32(seed * 2048 + 3 * i + 3) % 300
          i += 1
        }
      }
      assert(us.map(u => (u.start, u.len, u.peak)) === want.toSeq,
        s"seed $seed")
      assert(us.length >= 3, s"seed $seed: too few utterances")
    }
  }

  test("end-to-end q309 at sf0.001: silence docs drop for utterance " +
      "count, wall-of-sound docs for ratio and segmentability, burst " +
      "docs keep") {
    val s = TestSpark.spark
    val rows = SparkEntry.queries("q309_speech_quality")(
      s, "/root/testdata/sf0.001").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 7 == 0) {
        assert(!r.getBoolean(4) && !r.getBoolean(7), s"doc $id silence")
      } else if (id % 11 == 0) {
        assert(!r.getBoolean(5) && !r.getBoolean(6) && !r.getBoolean(7),
          s"doc $id wall-of-sound")
      } else {
        assert(r.getBoolean(7), s"doc $id burst doc dropped")
      }
    }
  }
}
