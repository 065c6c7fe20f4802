package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.LongDot

/** Product quantization (PQ) for ANN — the memory-side compression
  * completing the engine's similarity-search family: brute force
  * (exact baseline, q28), hyperplane LSH (q29/q56), IVF (q37/q59) cut
  * the CANDIDATE COUNT; PQ cuts the BYTES PER CANDIDATE. A `dim`-long
  * vector becomes `m` codebook indices (here 4 bytes total vs 64
  * dims × 8 B quantized), and query-to-candidate distance is
  * approximated from per-query lookup tables (ADC — asymmetric
  * distance computation) in O(m) per pair instead of O(dim). IVF+PQ
  * is the standard billion-vector layout; this implements the PQ half
  * against the same deterministic integer substrate as the rest of
  * the family (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011).
  *
  * Determinism: sub-codebooks are [[KMeans]] runs (lowest-id seeding,
  * exact integer distances, truncating-division updates) on the m
  * disjoint dimension slices; encoding and ADC are integer argmin /
  * sums with index tie-breaks — every step reproducible in portable
  * SQL, so PQ recall is oracle-CHECKED, not just measured.
  *
  * Scale shape: codebooks are metadata (m·k·subDim longs) folded into
  * plans as literals — training shuffles only (cluster, dim) partial
  * sums, encoding is SCAN-LOCAL (m argmins over literal centroids,
  * no join), and ADC scoring broadcasts the per-query tables (m·k
  * longs per query) so the base side never shuffles; the only
  * exchange is the final per-query top-k. Codes for a 100 TB corpus
  * are the PERSISTED artifact: re-scoring a new query set touches
  * only the m-byte codes, never the raw vectors.
  */
object ProductQuant {

  /** Train per-subspace codebooks on `prepared` ([[Similarity.prepare]]
    * columns): `codebooks(s)(j)` = centroid `j` of dimension slice
    * `s`. `m` must divide the vector width; callers wanting the
    * cosine-family convention should pre-filter `qn > 0`.
    */
  def trainCodebooks(prepared: DataFrame, idCol: String, m: Int, k: Int,
      iters: Int): Array[Array[Array[Long]]] = {
    val subDim = subWidth(prepared, m)
    (0 until m).map { s =>
      val sub = prepared
        .select(col(idCol), slice(col("qv"), s * subDim + 1, subDim).as("qv"))
        .withColumn("qn", LongDot.dot(col("qv"), col("qv")))
      KMeans.fitCentroids(sub, idCol, k, iters)
    }.toArray
  }

  /** Scan-local PQ encoding: append `out` = array of `m` codebook
    * indices (long, each in [0, k)), nearest centroid per slice with
    * ties to the smaller index — no join, no shuffle; the codebooks
    * ride the plan as literals.
    */
  def withCodes(prepared: DataFrame, codebooks: Array[Array[Array[Long]]],
      out: String = "codes"): DataFrame = {
    val m = codebooks.length
    val subDim = subWidth(prepared, m)
    // name the slice + its norm once per subspace so the k candidate
    // expressions share them (and codegen CSE sees one slice, not k)
    val staged = codebooks.indices.foldLeft(prepared) { (df, s) =>
      df.withColumn(s"__sub$s", slice(col("qv"), s * subDim + 1, subDim))
        .withColumn(s"__subn$s",
          LongDot.dot(col(s"__sub$s"), col(s"__sub$s")))
    }
    val codeCols: Seq[Column] = codebooks.zipWithIndex.map { case (cb, s) =>
      val cands = cb.zipWithIndex.map { case (c, j) =>
        val cn = c.map(x => x * x).sum
        struct(
          (col(s"__subn$s") -
            lit(2L) * LongDot.dot(typedLit(c.toSeq), col(s"__sub$s")) +
            lit(cn)).as("d"),
          lit(j.toLong).as("c"))
      }.toSeq
      (if (cands.length == 1) cands.head else least(cands: _*))
        .getField("c")
    }.toSeq
    staged.withColumn(out, array(codeCols: _*))
      .drop(codebooks.indices.flatMap(s =>
        Seq(s"__sub$s", s"__subn$s")): _*)
  }

  /** ADC top-k: approximate L2² of every query against every coded
    * base vector (self excluded) from per-query lookup tables, k
    * nearest per query with (distance, id) tie order. The base side
    * carries only its `codes`; per-pair cost is m table lookups.
    * Returns (query_id, rank, neighbor_id, approx_d).
    */
  def adcTopK(codedBase: DataFrame, queries: DataFrame, idCol: String,
      codebooks: Array[Array[Array[Long]]], k: Int): DataFrame =
    topKPerQuery(
      codedBase.select(col(idCol).as("id_b"), col("codes"))
        .crossJoin(broadcast(queryTables(queries, idCol, codebooks)))
        .filter(col("query_id") =!= col("id_b"))
        .withColumn("approx_d", adcDistance(codebooks)),
      "approx_d", k)

  /** IVF+PQ — the canonical billion-vector composition: the coarse
    * quantizer (IVF cells, [[KMeans]]) cuts CANDIDATES to the probed
    * cells' lists, PQ cuts BYTES per candidate to m codes; a query
    * touches nprobe inverted lists of 4-byte codes instead of the
    * corpus. `codedBase` carries a `cell` column ([[KMeans.assignTo]]
    * against the same `coarse` centroids — scan-local) next to its
    * `codes`; queries rank cells against the centroid LITERALS
    * (scan-local), explode to their nprobe best, and candidates come
    * from a broadcast cell equi-join — the base side still never
    * shuffles before the two-phase top-k.
    */
  def ivfAdcTopK(codedBase: DataFrame, queries: DataFrame, idCol: String,
      codebooks: Array[Array[Array[Long]]], coarse: Array[Array[Long]],
      nprobe: Int, k: Int): DataFrame = {
    val probed = probeCells(queries, idCol, coarse, nprobe)
    topKPerQuery(
      codedBase.select(col(idCol).as("id_b"), col("codes"), col("cell"))
        .join(broadcast(probed), Seq("cell"))
        .filter(col("query_id") =!= col("id_b"))
        .join(broadcast(queryTables(queries, idCol, codebooks)),
          Seq("query_id"))
        .withColumn("approx_d", adcDistance(codebooks)),
      "approx_d", k)
  }

  /** (query_id, cell) for each query's `nprobe` nearest coarse
    * centroids by exact L2² — scan-local (centroids as literals, the
    * KMeans.assign construction generalized from argmin to top-n via
    * sort_array+slice), ties to the smaller cell index.
    */
  def probeCells(queries: DataFrame, idCol: String,
      coarse: Array[Array[Long]], nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= coarse.length,
      s"nprobe=$nprobe out of range for ${coarse.length} cells")
    val cands = array(coarse.zipWithIndex.map { case (c, j) =>
      val cn = c.map(x => x * x).sum
      struct(
        (col("qn") - lit(2L) * LongDot.dot(typedLit(c.toSeq), col("qv"))
          + lit(cn)).as("d"),
        lit(j.toLong).as("c"))
    }.toIndexedSeq: _*)
    queries.select(col(idCol).as("query_id"), col("qv"), col("qn"))
      .withColumn("__probe", slice(sort_array(cands), 1, nprobe))
      .select(col("query_id"), explode(col("__probe")).as("__pc"))
      .select(col("query_id"), col("__pc.c").as("cell"))
  }

  /** Per-query ADC lookup table: tab[s·ksub + j] = ‖sub_s(q) −
    * cb[s][j]‖² — m·ksub integer dots against literal centroids,
    * scan-local on the (bounded, broadcast) query side.
    */
  private def queryTables(queries: DataFrame, idCol: String,
      codebooks: Array[Array[Array[Long]]]): DataFrame = {
    val m = codebooks.length
    val subDim = subWidth(queries, m)
    val stagedQ = codebooks.indices.foldLeft(
      queries.select(col(idCol).as("query_id"), col("qv"))) { (df, s) =>
      df.withColumn(s"__sub$s", slice(col("qv"), s * subDim + 1, subDim))
        .withColumn(s"__subn$s",
          LongDot.dot(col(s"__sub$s"), col(s"__sub$s")))
    }
    val tab = array(codebooks.zipWithIndex.flatMap { case (cb, s) =>
      cb.map { c =>
        val cn = c.map(x => x * x).sum
        col(s"__subn$s") -
          lit(2L) * LongDot.dot(typedLit(c.toSeq), col(s"__sub$s")) +
          lit(cn)
      }
    }.toIndexedSeq: _*)
    stagedQ.select(col("query_id"), tab.as("__tab"))
  }

  /** O(m) per-pair ADC distance: m table lookups indexed by the base
    * row's codes.
    */
  private def adcDistance(codebooks: Array[Array[Array[Long]]]): Column = {
    val ksub = codebooks.head.length
    codebooks.indices.map { s =>
      element_at(col("__tab"),
        (col("codes").getItem(s) + lit(s.toLong * ksub) + lit(1L))
          .cast("int"))
    }.reduce(_ + _)
  }

  /** Two-phase per-query top-k: each scan partition first keeps its own
    * k best (a window keyed by (query, partition) — parallelism scales
    * with the DATA, and the global winners are always a subset of the
    * local winners), then the k×partitions survivors take the final
    * per-query ranking. A single `partitionBy(query_id)` window would
    * pull EVERY base row for a query through one task — the q06-class
    * single-task stage this engine bans. Result is identical for any
    * partitioning (the partitioning-independence spec pins it).
    */
  private def topKPerQuery(scored: DataFrame, dCol: String,
      k: Int): DataFrame = {
    val local = Window.partitionBy(col("query_id"), col("__pid"))
      .orderBy(col(dCol).asc, col("id_b").asc)
    val global = Window.partitionBy("query_id")
      .orderBy(col(dCol).asc, col("id_b").asc)
    scored.withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(global).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id_b").as("neighbor_id"),
        col(dCol))
  }

  /** Exact L2² top-k (the recall baseline PQ is judged against):
    * ‖a−b‖² = qn_a − 2·a·b + qn_b in exact int64, queries broadcast,
    * base never shuffled — the L2 twin of
    * [[Similarity.bruteForceTopK]].
    */
  def exactL2TopK(base: DataFrame, queries: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val b = base.select(col(idCol).as("id_b"), col("qv").as("__qvb"),
      col("qn").as("__qnb"))
    val q = queries.select(col(idCol).as("query_id"), col("qv").as("__qva"),
      col("qn").as("__qna"))
    topKPerQuery(
      b.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("id_b"))
        .withColumn("d", col("__qna") -
          lit(2L) * LongDot.dot(col("__qva"), col("__qvb")) + col("__qnb")),
      "d", k)
  }

  private def subWidth(df: DataFrame, m: Int): Int = {
    require(m >= 1, s"m must be positive: $m")
    val dim = df.select(size(col("qv"))).first().getInt(0)
    require(dim % m == 0, s"m=$m must divide the vector width $dim")
    dim / m
  }
}
