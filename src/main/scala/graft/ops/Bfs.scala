package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS shortest-path levels (SURVEY §2.11 extension) —
  * the unweighted graph-distance staple completing the iterative
  * graph family ([[DedupClusters]] CC answers "same component?",
  * [[PageRank]] "how central?", [[Triangles]]/[[KCore]] "how dense?";
  * this answers "how FAR?"): hop distance from a seed set, the shape
  * behind link-distance crawl frontiers, influence radii, and
  * "within-k-hops of a trusted node" curation filters.
  *
  * Level-synchronous BSP frontier expansion, exactly the Pregel
  * pattern: round d joins the current frontier against the edge list
  * (one equi-join on `src`), dedups the neighbor set (one partial-
  * aggregated shuffle), and anti-joins the already-labeled set so a
  * node is labeled at its FIRST (= minimal) hop count. All integer,
  * no tie-breaking needed — min-level is well-defined regardless of
  * visit order, so the result is deterministic on any cluster.
  *
  * Scale shape: per-round cost is sized by the FRONTIER × degree, not
  * the corpus — the labeled set is node-sized state that never leaves
  * the cluster, the edge list is pinned once with `localCheckpoint`
  * and rescanned from block storage each round, and each superseded
  * labeled-set checkpoint is unpersisted as soon as the next round
  * materializes (the [[DedupClusters]] pin/unpersist discipline).
  * Early exit when a frontier empties, so `maxDepth` is a cap, not a
  * cost.
  */
object Bfs {

  /** (node, level) for every node reachable from `seeds` within
    * `maxDepth` hops over directed `edges` (symmetrize upstream for
    * undirected semantics). Level 0 = the seeds themselves (deduped);
    * seeds need not appear in the edge list.
    */
  def levels(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0: $maxDepth")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    var known = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct()
      .withColumn("level", lit(0L))
      .localCheckpoint()
    var frontier = known.select("node")
    var d = 1
    var exhausted = false
    while (d <= maxDepth && !exhausted) {
      val next = e
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(known.select("node"), Seq("node"), "left_anti")
        .withColumn("level", lit(d.toLong))
        .localCheckpoint()
      if (next.isEmpty) {
        exhausted = true
      } else {
        val grown = known.unionByName(next).localCheckpoint()
        known.rdd.unpersist(blocking = false)
        known = grown
        frontier = next.select("node")
      }
      d += 1
    }
    known
  }
}
