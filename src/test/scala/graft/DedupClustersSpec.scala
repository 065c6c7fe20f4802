package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupClusters

class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("components resolve across multi-hop paths, not just direct edges") {
    import spark.implicits._
    // component {1..5} is a PATH (5-4-3-2-1): the min label needs 4
    // propagation rounds to reach node 5 — exercises the fixpoint loop,
    // not just one join. {10,11} is a separate pair; {20,21,22} a clique.
    val edges = Seq(
      (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("id_a", "id_b")
    val got = DedupClusters.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("clusters reports the component size on every member row") {
    import spark.implicits._
    val edges = Seq((2L, 1L), (3L, 1L), (10L, 11L)).toDF("id_a", "id_b")
    val got = DedupClusters.clusters(edges, "id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("non-convergence within maxIter throws instead of returning wrong labels") {
    import spark.implicits._
    // a 5-path needs 4 rounds; cap at 2 → must refuse
    val edges = Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L))
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      DedupClusters.connectedComponents(edges, "id_a", "id_b", maxIter = 2)
        .count()
    }
  }
}
