package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GapFill

/** Gap-fill semantics on hand-checkable series: interior gaps
  * linearly interpolated, tails forward-filled to the corpus-wide
  * last bucket (the common grid end), observed rows flagged, and a
  * single-observation key degenerating to its own point plus ffill
  * tail. Interpolated doubles are exact where the arithmetic is.
  */
class GapFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(String, Long, Long)])
      : Seq[(String, Long, Double, String)] = {
    import spark.implicits._
    GapFill.fill(rows.toDF("k", "h", "v"), "k", "h", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3)))
      .toSeq.sortBy(t => (t._1, t._2))
  }

  test("interior gap interpolates linearly; tail forward-fills to " +
      "the corpus max bucket") {
    // A observed at 1 and 4; B observed at 6 → corpus max 6. A's
    // grid is 1..6: interp at 2,3; ffill at 5,6.
    val out = run(Seq(("A", 1L, 1000L), ("A", 4L, 4000L),
      ("B", 6L, 70L)))
    assert(out === Seq(
      ("A", 1L, 1000.0, "observed"),
      ("A", 2L, 2000.0, "interp"),
      ("A", 3L, 3000.0, "interp"),
      ("A", 4L, 4000.0, "observed"),
      ("A", 5L, 4000.0, "ffill"),
      ("A", 6L, 4000.0, "ffill"),
      ("B", 6L, 70.0, "observed")))
  }

  test("uneven gap: interpolation weights by grid distance") {
    // observed 0→v=0 and 3→v=900: grid 1 gets 300, grid 2 gets 600
    val out = run(Seq(("A", 0L, 0L), ("A", 3L, 900L)))
    assert(out.map(t => (t._2, t._3)) ===
      Seq((0L, 0.0), (1L, 300.0), (2L, 600.0), (3L, 900.0)))
  }

  test("negative values interpolate exactly (signed integers in " +
      "double arithmetic)") {
    val out = run(Seq(("A", 1L, -100L), ("A", 3L, 100L)))
    assert(out.map(t => (t._2, t._3, t._4)) === Seq(
      (1L, -100.0, "observed"), (2L, 0.0, "interp"),
      (3L, 100.0, "observed")))
  }

  test("a key starting after the corpus min only fills ITS span " +
      "(no backfill before the first observation)") {
    val out = run(Seq(("A", 0L, 5L), ("B", 2L, 7L), ("A", 2L, 9L)))
    assert(out.filter(_._1 == "B") === Seq(("B", 2L, 7.0, "observed")))
    assert(out.filter(_._1 == "A").map(_._2) === Seq(0L, 1L, 2L))
  }
}
