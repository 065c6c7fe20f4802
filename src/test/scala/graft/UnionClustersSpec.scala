package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** Union dedup clusters (q306): each fingerprint family alone provably
  * misses one planted twin — the envelope misses the content trim, the
  * landmarks miss the resample — and their union clusters the trio.
  * The hybrid recording carries BOTH signals: gapped-gain envelope
  * entropy plus single-sample onset clicks too small to move a bin.
  */
class UnionClustersSpec extends AnyFunSuite {

  private def wav(samples: Array[Int], rate: Int = 16000) =
    Audio.encodeWavSamples(samples, rate)

  test("blindness is complementary: envelope catches the resample the " +
      "landmarks miss, landmarks catch the trim the envelope misses " +
      "(50 seeds)") {
    for (g <- 0L until 50L) {
      val n = (4000 + (g % 7) * 500 + g % 53).toInt
      val master = Audio.hybridTrain(2 * g, n)
      val res = Array.tabulate(n / 2)(k => master(2 * k))
      val mw = wav(master)
      val trim = master.drop(Audio.onsets(g, mw, 256).head.pos.toInt + 3)
      val (rw, tw) = (wav(res, 8000), wav(trim))
      val envMR = java.lang.Long.bitCount(
        Audio.envelopeHash(g, mw) ^ Audio.envelopeHash(g, rw))
      assert(envMR <= 4, s"seed $g: envelope missed the resample")
      val lmM = Audio.landmarkHashes(g, mw).toSet
      assert((lmM & Audio.landmarkHashes(g, rw).toSet).size < 3,
        s"seed $g: landmarks unexpectedly caught the resample")
      val envMT = java.lang.Long.bitCount(
        Audio.envelopeHash(g, mw) ^ Audio.envelopeHash(g, tw))
      assert(envMT > 4, s"seed $g: envelope unexpectedly caught the trim")
      assert((lmM & Audio.landmarkHashes(g, tw).toSet).size >= 3,
        s"seed $g: landmarks missed the trim")
    }
  }

  test("end-to-end at sf0.001: every id/4 group unions into one " +
      "{master, resample, trim} trio plus a control singleton") {
    val s = TestSpark.spark
    val rows = SparkEntry.queries("q306_union_clusters")(
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
