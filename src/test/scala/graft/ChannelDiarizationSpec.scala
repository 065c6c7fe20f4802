package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** Channel-turn diarization (q312, [[Audio.channelTurns]]): exact run
  * + attribution semantics through the real stereo parse, the
  * closed-form burst replay, and the monologue/two-speaker split.
  */
class ChannelDiarizationSpec extends AnyFunSuite {

  test("utterances attribute to the dominant channel; turns are " +
      "channel changes") {
    val l = Array(10, 900, 900, 5, 0, 0, 20, 30, 0, 800)
    val r = Array(0, 20, 10, 0, 0, 700, 700, 700, 0, 10)
    val us = Audio.channelTurns(1L,
      Audio.encodeWavStereoSamples(l, r, 8000), 256)
    assert(us.map(u => (u.start, u.len, u.channel)) ===
      Seq((1L, 2L, 0), (5L, 3L, 1), (9L, 1L, 0)))
    intercept[IllegalArgumentException] { // mono rejected loudly
      Audio.channelTurns(1L, Audio.encodeWavSamples(l, 8000), 256)
    }
  }

  test("stereo burst trains replay closed-form: channels, turns, " +
      "counts (100 seeds)") {
    for (id <- 0L until 100L) {
      val n = (4000 + (id % 7) * 500 + id % 53).toInt
      val (l, r) = Audio.stereoBurstTrain(id, n)
      val us2 = Audio.channelTurns(id,
        Audio.encodeWavStereoSamples(l, r, 16000), 256)
      assert(us2.length >= 5, s"seed $id: too few utterances")
      // closed-form replay
      val want = scala.collection.mutable.ArrayBuffer.empty[Int]
      var p = 150 + Audio.mix32(id * 4096 + 4000) % 150
      var i = 0L
      var fits = true
      while (fits) {
        val d = 100 + Audio.mix32(id * 4096 + 4 * i + 1) % 300
        if (p + d > n - 100) fits = false
        else {
          want += (Audio.mix32(id * 4096 + 4 * i) % 2).toInt
          p += d + 120 + Audio.mix32(id * 4096 + 4 * i + 3) % 300
          i += 1
        }
      }
      assert(us2.map(_.channel) === want.toSeq, s"seed $id channels")
    }
  }

  test("end-to-end at sf0.001: monologues (id % 13 == 0) report zero " +
      "turns and one speaker; everyone else two speakers with turns") {
    val s = TestSpark.spark
    val rows = SparkEntry.queries("q312_channel_diarization")(
      s, "/root/testdata/sf0.001").collect()
    assert(rows.length === 500)
    rows.foreach { row =>
      val id = row.getLong(0)
      if (id % 13 == 0) {
        assert(row.getLong(2) === 0L, s"doc $id: monologue turned")
        assert(!row.getBoolean(5), s"doc $id: monologue two speakers")
        assert(row.getLong(4) === 0L)
      }
      assert(row.getLong(3) + row.getLong(4) === row.getLong(1))
    }
    // the fixture yields two-speaker docs in the non-monologue class
    assert(rows.count(r => r.getBoolean(5)) > 400)
  }
}
