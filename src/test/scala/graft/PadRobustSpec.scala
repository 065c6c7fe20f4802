package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** Silence-trim normalization (q310, [[Audio.envelopeHashTrimmed]]):
  * padded copies land exactly on their master, the raw envelope's
  * shift-blindness is carried beside it, and degenerate inputs fail
  * loudly.
  */
class PadRobustSpec extends AnyFunSuite {

  test("leading+trailing pads move the trimmed envelope 0 bits while " +
      "the raw envelope misses (100 seeds)") {
    for (id <- 0L until 100L) {
      val n = (4000 + (id % 7) * 500 + id % 53).toInt
      val master = Audio.hybridTrain(2 * id, n)
      val padded =
        Array.fill(n / 3)(0) ++ master ++ Array.fill(n / 5)(0)
      val (mw, pw) = (Audio.encodeWavSamples(master, 16000),
        Audio.encodeWavSamples(padded, 16000))
      assert(Audio.envelopeHashTrimmed(id, mw) ===
        Audio.envelopeHashTrimmed(id, pw), s"seed $id: trim moved")
      val raw = java.lang.Long.bitCount(
        Audio.envelopeHash(id, mw) ^ Audio.envelopeHash(id, pw))
      assert(raw > 8, s"seed $id: raw envelope did NOT miss ($raw)")
      val ctrl = Audio.envelopeHashTrimmed(id,
        Audio.encodeWavSamples(Audio.hybridTrain(2 * id + 1, n), 16000))
      assert(java.lang.Long.bitCount(
        Audio.envelopeHashTrimmed(id, mw) ^ ctrl) > 8,
        s"seed $id: control not separated")
    }
  }

  test("a sub-floor noise bed trims away; an all-silent wav fails " +
      "loudly") {
    val sig = Array.fill(50)(8) ++ Array(500, 500, -400) ++
      Array.fill(70)(-9)
    val bare = Array(500, 500, -400)
    assert(Audio.envelopeHashTrimmed(1L,
        Audio.encodeWavSamples(sig, 8000)) ===
      Audio.envelopeHashTrimmed(1L, Audio.encodeWavSamples(bare, 8000)))
    intercept[IllegalArgumentException] {
      Audio.envelopeHashTrimmed(1L,
        Audio.encodeWavSamples(Array.fill(100)(3), 8000))
    }
  }
}
