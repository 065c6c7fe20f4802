package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** The real PNG path ([[Multimodal.encodePng]] through `javax.imageio`):
  * the DECODED raster — not the encoder-private container bytes — is
  * the contract, and it must agree bit-for-bit with the closed-form
  * generation rule and with the PPM codec fed the same rule.
  */
class PngCodecSpec extends AnyFunSuite {

  test("decode recovers the closed-form pixel sums (real inflate path)") {
    val (seed, w, h) = (7L, 5, 4)
    val png = Multimodal.encodePng(seed, w, h)
    // sanity: this is a genuine PNG container, not raw bytes
    assert(png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val f = Multimodal.decodePng(seed, png)
    assert((f.width, f.height) === ((w.toLong, h.toLong)))
    val vals = (0 until w * h * 3).map(j => (seed * 31 + j) % 256)
    assert(f.r_sum === vals.zipWithIndex.filter(_._2 % 3 == 0).map(_._1).sum)
    assert(f.g_sum === vals.zipWithIndex.filter(_._2 % 3 == 1).map(_._1).sum)
    assert(f.b_sum === vals.zipWithIndex.filter(_._2 % 3 == 2).map(_._1).sum)
  }

  test("PNG and PPM codecs agree on the shared generation rule") {
    val (seed, w, h) = (11L, 6, 5)
    val png = Multimodal.decodePng(seed, Multimodal.encodePng(seed, w, h))
    val ppm = Multimodal.decodePpm(seed, Multimodal.encodePpm(seed, w, h))
    assert((png.r_sum, png.g_sum, png.b_sum) ===
      ((ppm.r_sum, ppm.g_sum, ppm.b_sum)))
  }

  test("raster extraction is row-major RGB of the decoded pixels") {
    val (seed, w, h) = (3L, 4, 3)
    val (rw, rh, raster) =
      Multimodal.imageRaster(seed, Multimodal.encodePng(seed, w, h))
    assert((rw, rh) === ((w, h)))
    assert(raster.length === w * h * 3)
    (0 until raster.length).foreach { j =>
      assert((raster(j) & 0xff) === ((seed * 31 + j) % 256).toInt,
        s"raster byte $j")
    }
  }

  test("undecodable bytes fail loudly") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePng(9L, "not a png at all".getBytes("US-ASCII"))
    }
    assert(e.getMessage.contains("not a decodable image"))
  }
}
