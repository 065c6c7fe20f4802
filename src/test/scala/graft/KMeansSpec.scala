package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.KMeans

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  // already-quantized 2-D vectors: qv + exact squared norm
  private def prepared(rows: Seq[(Long, Seq[Long])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "qv")
      .withColumn("qn", expr("aggregate(qv, 0L, (a, x) -> a + x * x)"))
  }

  test("two well-separated blobs are recovered in one round") {
    // blob A around (0, 0): ids 0-2; blob B around (100, 100): ids 10-12.
    // seeds (k=2) are ids 0 and 1 — both in blob A — so recovery REQUIRES
    // the update step to move centroid 1 toward blob B.
    val df = prepared(Seq(
      0L -> Seq(0L, 0L), 1L -> Seq(2L, 0L), 2L -> Seq(0L, 2L),
      10L -> Seq(100L, 100L), 11L -> Seq(102L, 100L), 12L -> Seq(100L, 102L)))
    val got = KMeans.fit(df, "vec_id", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = Set(0L, 1L, 2L).map(got)
    val b = Set(10L, 11L, 12L).map(got)
    assert(a.size === 1 && b.size === 1 && a != b,
      s"blobs not separated: $got")
  }

  test("distances are exact integers and ties pick the smaller cluster") {
    // seeds: id 0 -> (0,0) is centroid 0, id 1 -> (4,0) is centroid 1.
    // with iters=0 (pure assignment), id 2 at (2,0) is equidistant
    // (d=4 both ways) -> must land in cluster 0
    val df = prepared(Seq(
      0L -> Seq(0L, 0L), 1L -> Seq(4L, 0L), 2L -> Seq(2L, 0L)))
    val got = KMeans.fit(df, "vec_id", 2, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got === Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 4L)))
  }

  test("an emptied cluster keeps its previous centroid") {
    // k=3 over two tight blobs: after round 1 some centroid must own
    // zero points; the fit must not crash and every vector stays assigned
    val df = prepared(Seq(
      0L -> Seq(0L, 0L), 1L -> Seq(1L, 0L), 2L -> Seq(0L, 1L),
      10L -> Seq(50L, 50L), 11L -> Seq(51L, 50L)))
    val out = KMeans.fit(df, "vec_id", 3, 2).collect()
    assert(out.length === 5)
    assert(out.forall(_.getLong(1) < 3L))
  }

  test("truncating centroid division matches Java semantics on negatives") {
    // one cluster of (-3) and (-4): sum -7, n 2 -> centroid -3 (trunc),
    // not -4 (floor). Final dists from c=(-3): 0 and 1.
    val df = prepared(Seq(0L -> Seq(-3L), 1L -> Seq(-4L)))
    val got = KMeans.fit(df, "vec_id", 1, 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(got === Seq((0L, 0L), (1L, 1L)))
  }

  test("requires at least k vectors") {
    intercept[IllegalArgumentException] {
      KMeans.fit(prepared(Seq(0L -> Seq(1L, 1L))), "vec_id", 2, 1)
    }
  }
}
