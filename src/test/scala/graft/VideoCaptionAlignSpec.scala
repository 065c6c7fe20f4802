package graft

import org.scalatest.funsuite.AnyFunSuite

/** Video-caption alignment (q305): the best-frame CLIP rule — aligned
  * captions keep with the elected scene named, planted swaps drop, and
  * the election picks exactly the scene the caption describes.
  */
class VideoCaptionAlignSpec extends AnyFunSuite {

  test("end-to-end at sf0.001: aligned videos keep on their own scene, " +
      "every 13th caption swap drops") {
    val s = TestSpark.spark
    val rows = SparkEntry.queries("q305_video_caption_align")(
      s, "/root/testdata/sf0.001").collect()
    // 500 embeddings -> (499 - 6) / 7 + 1 = 71 videos
    assert(rows.length === 71)
    rows.foreach { r =>
      val (u, nScenes) = (r.getLong(0), r.getLong(1))
      assert(nScenes === 3 + u % 3, s"video $u scene count")
      val swapped = r.getBoolean(3)
      assert(swapped === (u % 13 == 0))
      if (swapped) {
        assert(!r.getBoolean(7), s"video $u: swap kept")
        assert(r.getDouble(6) < 0.9)
      } else {
        assert(r.getBoolean(7), s"video $u: aligned dropped")
        assert(r.getDouble(6) > 0.99, s"video $u: self-cosine")
        // the elected scene is the one whose embedding IS the caption
        assert(r.getLong(4) === u % nScenes, s"video $u best scene")
        assert(r.getLong(5) === 4 * (u % nScenes) + 3,
          s"video $u best keyframe")
      }
    }
  }
}
