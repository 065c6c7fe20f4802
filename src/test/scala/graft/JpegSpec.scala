package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** The lossy flavor of the javax.imageio seam (q264/q265): JPEG has
  * no cross-engine bit contract, so the honest claims are MEASURED
  * here — decode tolerance against the closed-form source raster
  * (with a nonzero lower bound proving the decode is genuinely lossy,
  * not an input echo), and blockhash stability across a PNG-vs-JPEG
  * re-encode of the same raster (the end-to-end "re-encoded media
  * deduplicates" property q252 set up).
  */
class JpegSpec extends AnyFunSuite {

  private def dims(id: Long): (Int, Int) =
    ((16 + ((id / 3) % 3) * 8).toInt, (16 + (id % 2) * 8).toInt)

  test("the decode tolerance claim is measured: every doc within 16, " +
      "none at zero (the decode is real and lossy), across the full " +
      "dim/level parameter space") {
    // (id/3) % 3, id % 2, and (id*37) % 256 cycle with period
    // lcm(9, 2, 256·3) | 6912 — ids to 7000 step 3 cover every
    // (width, height, blue-level) combination the queries can produce
    val errs = (0L to 7000L by 3).map { id =>
      val (w, h) = dims(id)
      val (dw, dh, raster) =
        Multimodal.imageRaster(id, Multimodal.encodeJpeg(id, w, h))
      assert((dw, dh) === ((w, h)), s"doc $id: dims must survive")
      Multimodal.gradientMaxAbsErr(id, dw, dh, raster)
    }
    // This JDK measures max 14 / min 7. q264's CONTRACT uses tol = 24:
    // measured max + ~10 levels of headroom, because JPEG quantization
    // and IDCT rounding are implementation-private — a different JDK
    // vendor/version may land a few levels above 14, and the oracle
    // hardcodes within_tol = TRUE. The gate therefore asserts the
    // CONTRACT bound (24), not this JDK's measurement (16) — a build
    // on a vendor at 17–23 is exactly what the headroom exists to
    // allow, and must not fail here while q264 passes its oracle.
    info(s"measured per-channel error: max ${errs.max}, min ${errs.min}")
    assert(errs.max <= 24,
      s"tolerance CONTRACT violated: max per-channel error ${errs.max}")
    assert(errs.min >= 1,
      "zero error would mean the codec path is not actually lossy — " +
        "the tolerance contract would be vacuous")
  }

  test("PNG is lossless on the same raster: the gradient decodes " +
      "bit-exactly (the contract that anchors q265's PNG leg)") {
    for (id <- Seq(0L, 3L, 9L, 21L)) {
      val (w, h) = dims(id)
      val (_, _, raster) =
        Multimodal.imageRaster(id, Multimodal.encodeGradientPng(id, w, h))
      assert(Multimodal.gradientMaxAbsErr(id, w, h, raster) === 0)
    }
  }

  test("re-encoded media deduplicates: PNG-vs-JPEG blockhashes of the " +
      "same raster within 8/60 bits for every doc, while the container " +
      "bytes share nothing") {
    val dists = (0L to 600L by 3).map { id =>
      val (w, h) = dims(id)
      val png = Multimodal.encodeGradientPng(id, w, h)
      val jpg = Multimodal.encodeJpeg(id, w, h)
      // container bytes are incomparable across codecs (different
      // magic, structure, and body) — the raster is the only contract
      assert(!java.util.Arrays.equals(png, jpg))
      def fp(bytes: Array[Byte]): Long = {
        val (dw, dh, raster) = Multimodal.imageRaster(id, bytes)
        assert((dw, dh) === ((w, h)))
        // the blockHash bit rule, computed directly on the raster
        val n = raster.length
        val sums = new Array[Long](60)
        var total = 0L
        var i = 0
        while (i < n) {
          val v = raster(i) & 0xff
          sums(((i.toLong * 60) / n).toInt) += v
          total += v
          i += 1
        }
        (0 until 60).foldLeft(0L)((acc, b) =>
          if (sums(b) * 60 > total) acc | (1L << b) else acc)
      }
      java.lang.Long.bitCount(fp(png) ^ fp(jpg))
    }
    assert(dists.max <= 8,
      s"re-encode blockhash drift exceeded the dedup band: ${dists.max}")
  }
}
