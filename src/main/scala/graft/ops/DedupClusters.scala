package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: connected components over a near-dup
  * pair list (SURVEY §2.11 E57) — the step that turns pairwise edges
  * (MinHash q25 / SimHash q27 / exact Jaccard q64) into "keep one
  * representative per duplicate group", i.e. an actually deduplicated
  * corpus.
  *
  * Algorithm: iterative min-label propagation — every node repeatedly
  * takes the minimum label among itself and its neighbors until a
  * fixpoint. Converges in O(graph diameter) rounds; duplicate clusters
  * are near-cliques (diameter ≤ 2–3), so 3–4 rounds in practice, each
  * round one equi-join + one partial-aggregated min — all hash
  * shuffles on ids, never text. `localCheckpoint` truncates the
  * per-round lineage so the plan doesn't grow with iterations.
  *
  * At 100 TB the same loop holds (rounds are data-parallel and the
  * edge list for near-dup graphs is ≪ corpus size); for adversarial
  * long-path graphs the two-phase large-star/small-star variant
  * (O(log n) rounds) is the drop-in upgrade — the per-round plan shape
  * is identical.
  */
object DedupClusters {

  /** (node, cluster_rep) for every node in `edges`, where cluster_rep
    * is the minimum node id of its connected component — deterministic
    * regardless of partitioning or iteration order.
    *
    * @throws IllegalStateException if no fixpoint within `maxIter`
    *         rounds (duplicate graphs converge in a handful; hitting
    *         the cap means the input is not a near-dup pair list)
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val sym = edges
      .select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy("src").agg(min("label").as("__nl"))
        .withColumnRenamed("src", "node")
      // the change flag rides the same checkpointed pass — one join and
      // one materialization per round; the convergence count then reads
      // materialized blocks instead of re-joining old vs new labels
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("__nl"), col("label")))
            .as("label"),
          (col("__nl").isNotNull && col("__nl") < col("label"))
            .as("__chg"))
        .localCheckpoint()
      changed = next.filter(col("__chg")).count()
      labels = next.drop("__chg")
      i += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("node"), col("label").as("cluster_rep"))
  }

  /** Convenience: cluster membership with component sizes, ordered —
    * the review surface ("which documents collapse together").
    */
  def clusters(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(edges, aCol, bCol)
    val sizes = cc.groupBy("cluster_rep").agg(count(lit(1)).as("n_members"))
    cc.join(sizes, "cluster_rep")
      .select(col("node").as("doc_id"), col("cluster_rep"), col("n_members"))
  }
}
