package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Video

/** The real YUV4MPEG2 codec ([[Video.encodeY4m]]/[[Video.decodeY4m]]):
  * decoded features against the closed-form plane rule, scene-cut
  * detection margins, header tolerance (extra parameters, frame-level
  * parameter tails), and loud failure on malformed streams.
  */
class Y4mCodecSpec extends AnyFunSuite {

  private def expected(seed: Long, w: Int, h: Int, nf: Int,
      cut: Int): Video.Y4mFeatures = {
    val ySums = (0 until nf).map(f =>
      (0 until w * h).map(k => Video.planeByte(seed, cut, f, k).toLong).sum)
    val total = (0 until nf).flatMap(f => (0 until 3 * w * h)
      .map(k => Video.planeByte(seed, cut, f, k).toLong)).sum
    val cuts = (1 until nf).filter(f =>
      math.abs(ySums(f) - ySums(f - 1)) > 48L * w * h)
    val maxF = ySums.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2
    Video.Y4mFeatures(seed, w.toLong, h.toLong, nf.toLong, total,
      maxF.toLong, cuts.length.toLong,
      cuts.headOption.map(_.toLong).getOrElse(-1L))
  }

  test("roundtrip matches the closed-form plane rule, cut detected") {
    val (seed, w, h, nf, cut) = (7L, 4, 3, 8, 4)
    val f = Video.decodeY4m(seed, Video.encodeY4m(seed, w, h, nf, cut), 48)
    assert(f === expected(seed, w, h, nf, cut))
    assert(f.n_cuts === 1L)
    assert(f.cut_frame === cut.toLong)
  }

  test("single-scene clip detects no cut") {
    val (seed, w, h, nf) = (12L, 5, 4, 7)
    val f = Video.decodeY4m(seed, Video.encodeY4m(seed, w, h, nf, -1), 48)
    assert(f === expected(seed, w, h, nf, -1))
    assert((f.n_cuts, f.cut_frame) === ((0L, -1L)))
  }

  test("within-scene drift never crosses the threshold at any seed") {
    // the margin claim behind the 48 threshold: exhaustive over seeds
    for (seed <- 0L until 96L) {
      val f = Video.decodeY4m(seed, Video.encodeY4m(seed, 4, 3, 10, -1), 48)
      assert(f.n_cuts === 0L, s"false cut at seed $seed")
      val g = Video.decodeY4m(seed, Video.encodeY4m(seed, 4, 3, 10, 5), 48)
      assert((g.n_cuts, g.cut_frame) === ((1L, 5L)), s"missed cut at $seed")
    }
  }

  test("header tolerance: frame parameter tails and X tags parse") {
    val base = Video.encodeY4m(3L, 2, 2, 2, -1)
    // rebuild with an X metadata tag and a frame parameter
    val s = new String(base, "ISO-8859-1")
      .replaceFirst(" C444\n", " C444 XYSCSS=444\n")
      .replaceFirst("FRAME\n", "FRAME Ixyz\n")
    val f = Video.decodeY4m(3L, s.getBytes("ISO-8859-1"), 48)
    assert(f === expected(3L, 2, 2, 2, -1))
  }

  test("malformed streams fail loudly") {
    intercept[IllegalArgumentException] { // wrong magic
      Video.decodeY4m(1L, "YUV4MPEG1 W2 H2 C444\n".getBytes("US-ASCII"), 48)
    }
    intercept[IllegalArgumentException] { // default C420 unsupported
      Video.decodeY4m(1L,
        ("YUV4MPEG2 W2 H2\nFRAME\n" + "x" * 12).getBytes("US-ASCII"), 48)
    }
    intercept[IllegalArgumentException] { // truncated frame
      Video.decodeY4m(1L, Video.encodeY4m(1L, 2, 2, 2, -1).dropRight(3), 48)
    }
    intercept[IllegalArgumentException] { // garbage between frames
      val b = Video.encodeY4m(1L, 2, 2, 1, -1) ++
        "JUNK\n".getBytes("US-ASCII")
      Video.decodeY4m(1L, b, 48)
    }
    intercept[IllegalArgumentException] { // header dims that overflow
      // 3·w·h past Int.MaxValue must die on the header, not walk the
      // frame loop backwards with a negative plane length
      Video.decodeY4m(1L,
        "YUV4MPEG2 W50000 H50000 C444\nFRAME\n".getBytes("US-ASCII"), 48)
    }
  }

  test("frameLumas exports the per-frame Y series the features reduce") {
    implicit val s = TestSpark.spark
    import s.implicits._
    val (seed, w, h, nf, cut) = (7L, 4, 3, 8, 4)
    val media = Seq(seed).toDS().map(id =>
      graft.ops.Multimodal.MediaRecord(id,
        Video.encodeY4m(id, w, h, nf, cut), "y4m"))
    val rows = Video.frameLumas(media).collect().sortBy(_.frame)
    assert(rows.length === nf)
    val want = (0 until nf).map(f =>
      (0 until w * h).map(k => Video.planeByte(seed, cut, f, k).toLong).sum)
    assert(rows.map(_.y_sum).toSeq === want)
    assert(rows.forall(r => r.width == w.toLong && r.height == h.toLong))
  }

  test("distributed decode: payloads decode scan-locally per partition") {
    implicit val s = TestSpark.spark
    import s.implicits._
    val media = Seq(1L, 2L, 3L).toDS().repartition(2).map(id =>
      graft.ops.Multimodal.MediaRecord(id,
        Video.encodeY4m(id, 4, 3, 6, 3), "y4m"))
    val rows = Video.decodeY4mFeatures(media, 48).collect()
      .map(f => f.doc_id -> (f.n_frames, f.cut_frame)).toMap
    assert(rows === Map(1L -> ((6L, 3L)), 2L -> ((6L, 3L)),
      3L -> ((6L, 3L))))
  }
}
