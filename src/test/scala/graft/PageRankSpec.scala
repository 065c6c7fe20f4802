package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PageRank

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Driver-side exact replay of the op's integer contract. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      total: Long): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = out.keySet
    val n = nodes.size
    var r = nodes.map(v => v -> total / n).toMap
    val base = (15L * (total / n)) / 100
    for (_ <- 1 to iters) {
      val in = edges
        .filter(e => nodes.contains(e._1))
        .groupBy(_._2).view
        .mapValues(_.map(e => r(e._1) / out(e._1)).sum).toMap
      r = nodes.map(v => v -> (base + (85L * in.getOrElse(v, 0L)) / 100)).toMap
    }
    r
  }

  test("matches the exact integer reference on an asymmetric graph") {
    import spark.implicits._
    // 1→2, 2→{1,3}, 3→2, 4→1: node 4 has no inbound edge (keeps base
    // mass via the left join), node 2 is the hub.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 1L))
    val got = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === reference(edges, 3, 1000000000000L))
  }

  test("hub ordering on a star graph and mass conservation bound") {
    import spark.implicits._
    // star: leaves 2..6 ↔ hub 1; the hub must outrank every leaf and
    // truncation must only ever LOSE mass (Σr ≤ total).
    val half = (2L to 6L).map(v => (1L, v))
    val edges = half ++ half.map(_.swap)
    val rows = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byNode = rows.map(r => r._1 -> r._3).toMap
    assert((2L to 6L).forall(v => byNode(1L) > byNode(v)))
    assert(rows.map(_._3).sum <= 1000000000000L)
    assert(rows.map(r => r._1 -> r._2).toMap === Map(1L -> 5L) ++
      (2L to 6L).map(_ -> 1L).toMap)
  }
}
