package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Triangles

/** Exact triangle counts + clustering coefficients on graphs whose
  * answers are checkable by hand, including the inputs the degree-
  * ordered orientation exists for (a hub star: zero triangles, zero
  * wedge explosion) and dirty edge lists (self-loops, duplicates,
  * reversed duplicates).
  */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    Triangles.perNode(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3))))
      .toMap
  }

  test("a 4-clique has 3 triangles per node and coefficient 1") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)
    val out = run(edges)
    assert(out === nodes.map(_ -> ((3L, 3L, 1.0))).toMap)
  }

  test("a star has zero triangles; leaves have coefficient 0") {
    val out = run((2L to 6L).map(v => (1L, v)))
    assert(out(1L) === ((5L, 0L, 0.0)))
    (2L to 6L).foreach(v => assert(out(v) === ((1L, 0L, 0.0))))
  }

  test("one triangle with a pendant: corner degrees and coefficients") {
    // triangle 1-2-3 plus pendant edge 3-4
    val out = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(out(1L) === ((2L, 1L, 1.0)))
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L) === ((3L, 1L, 1.0 / 3.0)))
    assert(out(4L) === ((1L, 0L, 0.0)))
  }

  test("self-loops, duplicates, and reversed duplicates do not distort") {
    val clean = run(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val dirty = run(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L),
      (3L, 1L), (1L, 3L), (2L, 2L)))
    assert(dirty === clean)
  }

  test("matches a brute-force count on a random-ish graph") {
    // deterministic pseudo-random edges (no Random in tests: same
    // graph every run)
    val edges = (0 until 60).map { i =>
      val a = (i * 7919) % 13; val b = (i * 104729 + 3) % 13
      (a.toLong, b.toLong)
    }.filter { case (a, b) => a != b }
    val canon = edges.map { case (a, b) => (a min b, a max b) }.toSet
    def isTri(a: Long, b: Long, c: Long) =
      canon((a, b)) && canon((b, c)) && canon((a, c))
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val degPer = nodes.map(v =>
      v -> canon.count(e => e._1 == v || e._2 == v).toLong).toMap
    val allTris = for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if isTri(a, b, c)
    } yield (a, b, c)
    val triPer = allTris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = run(edges)
    nodes.foreach { v =>
      assert(out(v)._1 === degPer(v), s"degree of $v")
      assert(out(v)._2 === triPer.getOrElse(v, 0L), s"triangles of $v")
    }
  }
}
