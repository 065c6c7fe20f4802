package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q277 image–caption pair curation contract on the planted
  * fixtures: every pair is a genuine re-encoded-image (PNG vs JPEG of
  * the same raster — the measured q265 band+hamming claim holds for
  * all of them) with a genuinely reworded caption (canonical
  * fingerprints differ — a formatting-only tweak would collapse under
  * NFC), and the quality-max keep policy is exercised in BOTH
  * directions (appended variants win, truncated variants lose).
  */
class PairCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted re-encoded-image / reworded-caption pairs: raster " +
      "matches, captions differ, keep policy runs both directions") {
    val rows = SparkEntry.queries("q277_pair_curation")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val base = r.getAs[Long]("base_id")
      val twin = r.getAs[Long]("twin_id")
      assert(twin === base + 1000000L)
      // the JPEG re-encode must band+hamming-match its PNG sibling —
      // this is the real-decode leg (no closed form), measured here
      assert(r.getAs[Boolean]("raster_match"),
        s"pair $base: re-encoded raster failed the near-match")
      // a REWORDED caption must not collapse canonically
      assert(r.getAs[Boolean]("caption_differs"), s"pair $base")
      val kept = r.getAs[Long]("kept_id")
      val dropped = r.getAs[Long]("dropped_id")
      assert(Set(kept, dropped) === Set(base, twin), s"pair $base")
      // even media: appended variant (twin) wins; odd: truncation loses
      if ((base / 3) % 2 == 0)
        assert(kept === twin, s"pair $base: appended variant must win")
      else assert(kept === base, s"pair $base: truncated variant must lose")
    }
    // both directions genuinely present
    assert(rows.exists(r => r.getAs[Long]("kept_id") < 1000000L))
    assert(rows.exists(r => r.getAs[Long]("kept_id") >= 1000000L))
  }
}
