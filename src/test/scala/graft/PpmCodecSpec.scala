package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** The real P6 codec ([[Multimodal.encodePpm]]/[[Multimodal.decodePpm]]):
  * byte-exact roundtrip against closed-form sums, netpbm header
  * tolerance (comments, whitespace runs), and loud failure on
  * malformed input.
  */
class PpmCodecSpec extends AnyFunSuite {

  test("roundtrip matches the closed-form generation sums") {
    val (seed, w, h) = (7L, 5, 4)
    val f = Multimodal.decodePpm(seed, Multimodal.encodePpm(seed, w, h))
    assert((f.width, f.height, f.maxval) === ((w.toLong, h.toLong, 255L)))
    val vals = (0 until w * h * 3).map(j => (seed * 31 + j) % 256)
    assert(f.r_sum === vals.zipWithIndex.filter(_._2 % 3 == 0).map(_._1).sum)
    assert(f.g_sum === vals.zipWithIndex.filter(_._2 % 3 == 1).map(_._1).sum)
    assert(f.b_sum === vals.zipWithIndex.filter(_._2 % 3 == 2).map(_._1).sum)
    val headerSum = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      .map(_ & 0xff).sum.toLong
    assert(f.checksum === headerSum + vals.sum)
  }

  test("header tolerance: comments and whitespace runs parse") {
    val raster = Array.tabulate[Byte](2 * 1 * 3)(j => (j + 1).toByte)
    val bytes = "P6\n# a netpbm comment\n 2\t1\n255\n".getBytes("US-ASCII") ++
      raster
    val f = Multimodal.decodePpm(1L, bytes)
    assert((f.width, f.height) === ((2L, 1L)))
    assert(f.r_sum + f.g_sum + f.b_sum === (1 + 2 + 3 + 4 + 5 + 6).toLong)
  }

  test("half-resize samples the 2-D grid and re-encodes a valid P6") {
    val (seed, w, h) = (3L, 6, 4)
    val resized = Multimodal.resizePpmHalf(seed,
      Multimodal.encodePpm(seed, w, h))
    val f = Multimodal.decodePpm(seed, resized)
    assert((f.width, f.height) === ((3L, 2L)))
    // out(x,y) = in(2x,2y): source byte for (x,y,c) is 3*(2y*w+2x)+c
    val expect = for {
      y <- 0 until 2; x <- 0 until 3; c <- 0 until 3
    } yield (c, (seed * 31 + 3 * (2 * y * w + 2 * x) + c) % 256)
    assert(f.r_sum === expect.filter(_._1 == 0).map(_._2).sum)
    assert(f.g_sum === expect.filter(_._1 == 1).map(_._2).sum)
    assert(f.b_sum === expect.filter(_._1 == 2).map(_._2).sum)
  }

  test("malformed inputs fail loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.decodePpm(1L, "P5\n1 1\n255\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated raster
      Multimodal.decodePpm(1L,
        "P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3))
    }
    intercept[IllegalArgumentException] { // 2-byte samples unsupported
      Multimodal.decodePpm(1L,
        "P6\n1 1\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](6))
    }
  }
}
