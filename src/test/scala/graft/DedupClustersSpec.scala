package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DedupClusters

class DedupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("components resolve across multi-hop paths, not just direct edges") {
    import spark.implicits._
    // component {1..5} is a PATH (5-4-3-2-1): the min label needs to
    // cross 4 hops — exercises the iteration, not just one join.
    // {10,11} is a separate pair; {20,21,22} a clique.
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

  test("adversarial 50-node path converges in <= ceil(log2 n) rounds") {
    import spark.implicits._
    // Diameter-49 chain: min-label propagation would need 49 rounds;
    // large-star/small-star must contract it in O(log n). n = 50 →
    // ceil(log2 50) = 6.
    val n = 50
    val edges = (2 to n).map(i => (i.toLong, i.toLong - 1))
      .toDF("id_a", "id_b")
    val (labels, rounds) =
      DedupClusters.connectedComponentsWithRounds(edges, "id_a", "id_b")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1 to n).map(i => i.toLong -> 1L).toMap)
    assert(rounds <= 6,
      s"50-node path took $rounds rounds; O(log n) bound is 6")
  }

  test("two components with the bridge removed stay separate") {
    import spark.implicits._
    // Two paths {1,2,3} and {7,8,9}; the bridge (3,7) is deliberately
    // absent. A label must never leak across — the shape that catches
    // over-merging bugs in the star contraction.
    val edges = Seq((2L, 1L), (3L, 2L), (8L, 7L), (9L, 8L))
      .toDF("id_a", "id_b")
    val got = DedupClusters.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
    // …and with the bridge PRESENT the same graph is one component.
    val bridged = edges.union(Seq((7L, 3L)).toDF("id_a", "id_b"))
    val merged = DedupClusters.connectedComponents(bridged, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 1L, 8L -> 1L, 9L -> 1L))
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
    // a 50-path cannot contract to a star forest in a single round;
    // cap at 1 → the structural check must refuse
    val edges = (2 to 50).map(i => (i.toLong, i.toLong - 1))
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      DedupClusters.connectedComponents(edges, "id_a", "id_b", maxIter = 1)
        .count()
    }
  }

  test("a multi-parent terminal state is refused — child/parent " +
      "disjointness alone is not star-forest") {
    import spark.implicits._
    // {(5,1),(5,3),(6,2),(6,3)} is ONE component (bridged by 3); a
    // single round can leave node 3 with parents {1,2} — children and
    // parents are then disjoint sets, so a disjointness-only check
    // would return two labels for one component instead of throwing
    val edges = Seq((5L, 1L), (5L, 3L), (6L, 2L), (6L, 3L))
      .toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      DedupClusters.connectedComponents(edges, "id_a", "id_b", maxIter = 1)
        .count()
    }
    // with room to converge, the same graph resolves to one component
    val full = DedupClusters
      .connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(1)).toSet
    assert(full === Set(1L))
  }

  test("incremental components: batch edges merge, extend, and create " +
      "components; result equals full recompute") {
    import spark.implicits._
    // history: {1,2} and {3,4}; batch: 2-3 bridges them, 4-7 extends,
    // 5-6 is brand new, 1-2 is redundant (collapses in the quotient)
    val hist = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val batch = Seq((2L, 3L), (4L, 7L), (5L, 6L), (1L, 2L))
      .toDF("id_a", "id_b")
    val labels = DedupClusters.connectedComponents(hist, "id_a", "id_b")
    val got = DedupClusters
      .incrementalComponents(labels, batch, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = DedupClusters
      .connectedComponents(hist.union(batch), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === full)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("incremental components: an all-redundant batch passes the " +
      "labeling through unchanged (empty quotient)") {
    import spark.implicits._
    val hist = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = DedupClusters.connectedComponents(hist, "id_a", "id_b")
    val got = DedupClusters
      .incrementalComponents(labels,
        Seq((1L, 3L), (2L, 2L)).toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("incremental components: a node whose only batch edge is a " +
      "self-loop still appears, as a singleton — full-recompute parity") {
    import spark.implicits._
    // connectedComponents builds its node inventory before the
    // self-loop filter, so a full recompute returns 7 -> 7; the
    // incremental path must too
    val hist = Seq((1L, 2L)).toDF("id_a", "id_b")
    val batch = Seq((7L, 7L)).toDF("id_a", "id_b")
    val labels = DedupClusters.connectedComponents(hist, "id_a", "id_b")
    val got = DedupClusters
      .incrementalComponents(labels, batch, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = DedupClusters
      .connectedComponents(hist.union(batch), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === full)
    assert(got === Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }
}
