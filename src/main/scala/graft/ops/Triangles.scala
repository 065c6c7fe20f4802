package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting with local clustering coefficients — the
  * graph-cohesion profile of a pairwise-similarity graph (how clique-
  * like are the near-dup neighborhoods a MinHash pass produces?), and
  * the third member of the graph family next to E57's connected
  * components (no per-edge structure beyond reachability) and E112's
  * PageRank (per-edge mass, no closure structure).
  *
  * Algorithm: the degree-ordered node-iterator (Schank–Wagner / the
  * standard MapReduce formulation). Every undirected edge is oriented
  * from the endpoint EARLIER in the (degree, node) total order to the
  * later one; a triangle {u,v,w} with u < v < w in that order then
  * materializes exactly once, as the wedge (v ← u → w) closed by the
  * oriented edge (v → w). The orientation is the whole scale story:
  * out-degrees are bounded by O(√m), so the wedge stream is O(m^{3/2})
  * REGARDLESS of skew — a hub with a million neighbors is oriented
  * mostly INBOUND and generates almost no wedges, where the naive
  * node-iterator would explode quadratically on exactly that node.
  * Both the wedge build and the closing check are plain equi-joins
  * (src, then (dst₁,dst₂)), so the plan is two shuffles over id pairs
  * — no text, no adjacency lists buffered in memory.
  *
  * Output: one row per node of the graph — (node, degree, triangles,
  * clustering_coeff) with coeff = 2·T(v) / (deg(v)·(deg(v)−1)), 0 for
  * degree-1 nodes. Exact (no sampling), so the DuckDB oracle replays
  * it as three self-joins over the a<b edge list.
  */
object Triangles {

  /** Per-node triangle counts and clustering coefficients over an
    * undirected edge list (self-loops dropped, duplicate/reversed
    * edges collapsed).
    */
  def perNode(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // canonical undirected form: a<b, no self-loops, no duplicates.
    // Pinned: fans out into the degree aggregate and the orientation
    // join (self-joins never reuse exchanges)
    val e = edges
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint()
    val deg = e.select(col("lo").as("node"))
      .unionAll(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient lo→hi in the (degree, node) total order; carry the dst
    // endpoint's degree so the wedge join can order out-neighbors
    // without a rank shuffle. Pinned: three consumers (both wedge
    // sides + the closing-edge probe)
    val withDeg = e
      .join(deg.select(col("node").as("lo"), col("degree").as("__dl")), "lo")
      .join(deg.select(col("node").as("hi"), col("degree").as("__dh")), "hi")
    val loFirst = (col("__dl") < col("__dh")) ||
      (col("__dl") === col("__dh") && col("lo") < col("hi"))
    val dir = withDeg.select(
        when(loFirst, col("lo")).otherwise(col("hi")).as("src"),
        when(loFirst, col("hi")).otherwise(col("lo")).as("dst"),
        when(loFirst, col("__dh")).otherwise(col("__dl")).as("__dd"))
      .localCheckpoint()
    // wedges (v ← u → w) with v before w in the order; closing probe
    // is the oriented edge (v → w) — each triangle exactly once
    val wedges = dir.select(col("src"), col("dst").as("__v"),
        col("__dd").as("__vd"))
      .join(dir.select(col("src"), col("dst").as("__w"),
        col("__dd").as("__wd")), "src")
      .filter((col("__vd") < col("__wd")) ||
        (col("__vd") === col("__wd") && col("__v") < col("__w")))
    val tri = wedges
      .join(dir.select(col("src").as("__v"), col("dst").as("__w")),
        Seq("__v", "__w"))
    // every closed triangle credits all three corners
    val perNodeTri = tri
      .select(explode(array(col("src"), col("__v"), col("__w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg
      .join(perNodeTri, Seq("node"), "left")
      .withColumn("triangles", coalesce(col("triangles"), lit(0L)))
      .withColumn("clustering_coeff",
        when(col("degree") >= 2,
          lit(2.0) * col("triangles").cast("double") /
            (col("degree").cast("double") *
              (col("degree").cast("double") - 1.0)))
          .otherwise(lit(0.0)))
      .select("node", "degree", "triangles", "clustering_coeff")
  }
}
