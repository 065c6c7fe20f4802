package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop weighted shortest distances (SURVEY §2.11 extension) —
  * the min-plus member of the iterative graph family: [[Bfs]] answers
  * "how many hops?", this answers "how CHEAP is the best route of at
  * most k edges?" — the shape behind trust-weighted link distance,
  * cost-bounded crawl expansion, and "affinity within budget"
  * curation filters. Exact integer weights, so min-plus is
  * order-free and the result is deterministic on any cluster.
  *
  * Level-synchronous Bellman–Ford with delta relaxation: round r
  * relaxes only edges out of nodes whose distance IMPROVED in round
  * r−1 (the frontier), yet after r rounds the labels equal full
  * Bellman–Ford's — min cost over paths of ≤ r edges — because a
  * node whose label settled at round j had its out-edges relaxed at
  * round j+1 ≤ r. Each round is ONE frontier⋈edges equi-join, one
  * per-node min partial-agg shuffle, and one full-outer merge
  * against node-sized state; cost is frontier×degree, never
  * corpus-sized. The edge list is pinned once (`localCheckpoint`),
  * superseded state checkpoints are unpersisted as soon as the next
  * round materializes (the [[DedupClusters]] discipline), and an
  * empty frontier exits early, so `maxRounds` is a cap, not a cost.
  */
object Paths {

  /** (node, dist) = min total weight over directed paths of at most
    * `maxRounds` edges from `seeds` (dist 0) over `edges(src, dst,
    * w)`; symmetrize upstream for undirected semantics. Nodes
    * unreachable within the cap are absent. Weights must be
    * non-negative longs (enforced — negative weights would make the
    * bounded prefix non-monotone across rounds).
    */
  def boundedDistances(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, seeds: DataFrame, seedCol: String,
      maxRounds: Int): DataFrame = {
    require(maxRounds >= 0, s"maxRounds must be >= 0: $maxRounds")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"))
      .localCheckpoint()
    // the edge list is already pinned, so this precondition scan is one
    // cheap agg over checkpointed blocks, not a source rescan
    val mw = e.agg(min(col("w"))).head()
    require(mw.isNullAt(0) || mw.getLong(0) >= 0L,
      s"edge weights must be non-negative; min(w) = ${mw.getLong(0)}")
    var cur = Snap.pin(seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L)))
    var dist = cur._1
    var frontier = cur._1
    var r = 0
    var exhausted = false
    while (r < maxRounds && !exhausted) {
      val cand = e
        .join(frontier
            .withColumnRenamed("node", "src")
            .withColumnRenamed("dist", "fd"),
          "src")
        .select(col("dst").as("node"), (col("fd") + col("w")).as("cand"))
        .groupBy("node").agg(min("cand").as("cand"))
      val merged = Snap.pin(dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("dist"), lit(Long.MaxValue)),
            coalesce(col("cand"), lit(Long.MaxValue))).as("dist"),
          (col("dist").isNull ||
            (col("cand").isNotNull && col("cand") < col("dist")))
            .as("__improved")))
      val next = merged._1.filter(col("__improved"))
        .select(col("node"), col("dist"))
      // the isEmpty job materializes `merged`'s checkpoint; only then
      // is the superseded round's handle released (Snap discipline)
      if (next.isEmpty) {
        exhausted = true
        Snap.release(merged._2)
      } else {
        Snap.release(cur._2)
        cur = merged
        dist = merged._1.select("node", "dist")
        frontier = next
      }
      r += 1
    }
    dist
  }
}
