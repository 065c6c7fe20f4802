package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.{KCenter, Similarity}

/** Greedy k-center selection on hand-checkable point sets: the
  * farthest-point order, the max-norm seed rule, argmax tie-breaks by
  * minimal id, the coverage-reporter row, and the duplicate-corpus
  * degenerate case.
  */
class KCenterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(points: Seq[(Long, Seq[Float])],
      k: Int): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val df = points.toDF("vec_id", "embedding")
      .withColumn("embedding",
        col("embedding").cast("array<float>"))
    KCenter.select(Similarity.prepare(df, "embedding"), "vec_id", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
  }

  // 1-D points at 0, 1, 10 (quantized ×10⁴): seed = max norm (id 3
  // at 10), next farthest is 0 (d²=10⁸), then 1... with k=2 the
  // reporter row carries the radius to the nearest selected center.
  test("farthest-point order on a 1-D line, with coverage reporter") {
    val out = run(Seq((1L, Seq(0f)), (2L, Seq(1f)), (3L, Seq(10f))),
      k = 2)
    assert(out(0) === ((0L, 3L, 0L)))            // seed: max norm
    assert(out(1) === ((1L, 1L, 100000L * 100000L))) // 0 vs 10
    // reporter: point 2 (at 1) is nearest to center 1 (at 0): d²=10⁸/100
    assert(out(2) === ((2L, 2L, 10000L * 10000L)))
  }

  test("seed tie-break: equal norms pick the minimal id") {
    val out = run(Seq((7L, Seq(1f)), (3L, Seq(-1f)), (5L, Seq(0f))),
      k = 1)
    assert(out(0)._2 === 3L)
  }

  test("argmax tie-break mid-sweep picks the minimal id") {
    // seed = 3 (max norm); 5 at (4,8) and 2 at (4,−8) are both at
    // d² = 10⁸ quantized² from it AND have equal norms below the
    // seed's — the round-1 argmax ties and must pick the minimal id.
    val out = run(Seq((3L, Seq(10f, 0f)), (5L, Seq(4f, 8f)),
      (2L, Seq(4f, -8f))), k = 1)
    assert(out(0)._2 === 3L)
    assert(out(1)._2 === 2L)
  }

  test("duplicate corpus: sweep stops at radius zero") {
    // 3 identical points, k=2: seed = min id (norm tie), round 1's
    // farthest distance is already 0 → that row is the reporter and
    // the sweep stops (no duplicate selections for the unreachable
    // round 2). The reporter may repeat a selected id — it reports.
    val out = run(Seq((1L, Seq(2f, 2f)), (2L, Seq(2f, 2f)),
      (3L, Seq(2f, 2f))), k = 2)
    assert(out === Seq((0L, 1L, 0L), (1L, 1L, 0L)))
  }

  test("empty input fails with a clear message") {
    val e = intercept[IllegalArgumentException] {
      run(Seq.empty, k = 1)
    }
    assert(e.getMessage.contains("no rows"))
  }

  test("selection d2 is non-increasing and bounds the radius") {
    val pts = (1L to 20L).map(i =>
      (i, Seq((i % 7).toFloat, (i % 5).toFloat)))
    val out = run(pts, k = 4)
    val d2s = out.map(_._3).drop(1) // rounds 1..k + reporter
    assert(d2s === d2s.sorted.reverse)
    assert(out.last._3 <= d2s.head)
  }
}
