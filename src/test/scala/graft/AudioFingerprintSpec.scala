package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** The resample-robust envelope fingerprint ([[Audio.envelopeHash]]):
  * bit-exact against the closed-form rule, the measured margin claims
  * behind the q290 8-bit gate, and the generic sample encoder.
  */
class AudioFingerprintSpec extends AnyFunSuite {

  private def recording(seed: Long, n: Int, step: Int): Array[Int] =
    Array.tabulate(if (step == 1) n else n / step)(k =>
      Audio.modulatedSample(seed, step.toLong * k, n.toLong))

  private def fpOf(seed: Long, n: Int, step: Int): Long =
    Audio.envelopeHash(seed,
      Audio.encodeWavSamples(recording(seed, n, step), 16000 / step))

  private def closedFormFp(samples: Array[Int]): Long = {
    val n = samples.length
    val bins = new Array[Long](60)
    var total = 0L
    samples.zipWithIndex.foreach { case (s, j) =>
      val a = math.abs(s).toLong
      bins(((j.toLong * 60) / n).toInt) += a
      total += a
    }
    (0 until 60).map(b => if (bins(b) * 60 > total) 1L << b else 0L).sum
  }

  test("envelope fingerprint is bit-exact against the closed form") {
    for (seed <- Seq(0L, 7L, 123L)) {
      val n = (2000 + (seed % 7) * 500 + (seed % 53)).toInt
      assert(fpOf(seed, n, 1) === closedFormFp(recording(seed, n, 1)))
    }
  }

  test("measured margins behind the 8-bit gate: a 2x resample stays " +
      "<= 1 bit, a different recording sits >= 15") {
    // the gapped gain alphabet keeps every bin >= 20% from the bit
    // threshold, so resample drift measured 0 over all 50k sf1 seeds
    // (asserted <= 1 for slack) and the min ALL-pairs control within
    // this range measured 15 (adjacent-seed controls 22)
    for (seed <- 0L until 150L) {
      val n = (2000 + (seed % 7) * 500 + (seed % 53)).toInt
      val full = fpOf(seed, n, 1)
      val half = fpOf(seed, n, 2)
      val sameHam = java.lang.Long.bitCount(full ^ half)
      assert(sameHam <= 1, s"seed $seed: resample hamming $sameHam > 1")
      val n2 = (2000 + ((seed + 1) % 7) * 500 + ((seed + 1) % 53)).toInt
      val other = fpOf(seed + 1, n2, 1)
      val ctrlHam = java.lang.Long.bitCount(full ^ other)
      assert(ctrlHam >= 15, s"seed $seed: control hamming $ctrlHam < 15")
    }
  }

  test("downmix: a fake-stereo render re-enters the mono chain and " +
      "lands <= 1 envelope bit from its master") {
    for (seed <- 0L until 100L) {
      val n = (2000 + (seed % 7) * 500 + (seed % 53)).toInt
      val master = Array.tabulate(n)(j =>
        Audio.modulatedSample(seed, j.toLong, n.toLong))
      val stereo = Audio.encodeWavStereoSamples(master,
        master.map(_ / 2), 16000)
      val mono = Audio.downmixToMono(seed, stereo)
      // the downmix is a genuine mono wav: the mono reader accepts it
      assert(Audio.decodeWav(seed, mono, 100).n_samples === n.toLong)
      val h = java.lang.Long.bitCount(
        Audio.envelopeHash(seed, Audio.encodeWavSamples(master, 16000)) ^
          Audio.envelopeHash(seed, mono))
      assert(h <= 1, s"seed $seed: downmix hamming $h > 1")
    }
    intercept[IllegalArgumentException] { // mono input rejected loudly
      Audio.downmixToMono(1L, Audio.encodeWav(1L, 10, 8000))
    }
  }

  test("encodeWavSamples roundtrips through the real decoder") {
    val samples = Array(-2048, -1, 0, 1, 2047, 100)
    val f = Audio.decodeWav(1L, Audio.encodeWavSamples(samples, 8000), 4)
    assert(f.n_samples === 6L)
    assert(f.sample_rate === 8000L)
    assert(f.peak_abs === 2048L)
    assert(f.sum_abs === samples.map(s => math.abs(s).toLong).sum)
  }

  test("envelope hash rejects payloads without a data chunk") {
    intercept[IllegalArgumentException] {
      Audio.envelopeHash(1L, "RIFF\u0004\u0000\u0000\u0000WAVE"
        .getBytes("ISO-8859-1"))
    }
  }
}
