package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §7.2.8):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH bucketing as the scale path.
  *
  * Determinism contract (what makes ANN oracle-checkable): float
  * embeddings are quantized to integers — q = floor(x·10⁴ + 0.5) — so
  * dot products and norms are exact 64-bit integer arithmetic
  * (order-independent), and cosine is a single double division at the
  * end, bit-identical in any IEEE-754 engine. |x| ≤ ~1 ⇒ |q| ≤ ~10⁴ ⇒
  * a 4096-dim dot product stays < 2^39, far from overflow.
  *
  * Scale posture:
  *  - Brute force is O(n·q): fine when the query set is bounded (it is
  *    broadcast, so the big side never shuffles); it is the correctness
  *    baseline and the re-ranker.
  *  - Hyperplane LSH assigns each vector a small bucket id scan-locally
  *    (the planes are derived from md5, not stored); search joins only
  *    within buckets — one hash shuffle on the bucket id instead of a
  *    cartesian product. More planes ⇒ smaller buckets ⇒ higher recall
  *    loss: the standard multi-probe / repetition tricks apply
  *    orthogonally.
  *  - All expressions are codegen'd built-ins; at 100 TB the natural
  *    upgrade is a custom Catalyst Expression for the inner dot product,
  *    which this API shape (Column-in, Column-out) admits without
  *    changing callers.
  */
object Similarity {

  /** Quantize an array<float> column to array<bigint>. */
  def quantized(embCol: String, scale: Int = 10000): org.apache.spark.sql.Column =
    expr(
      s"""transform($embCol,
         |  x -> cast(floor(cast(x as double) * ${scale}.0d + 0.5d) as bigint))"""
        .stripMargin)

  /** Exact squared norm of a quantized vector (integer arithmetic). */
  def sqNorm(qvCol: String): org.apache.spark.sql.Column =
    expr(s"aggregate($qvCol, cast(0 as bigint), (a, x) -> a + x * x)")

  /** Cosine similarity between two quantized vectors given their squared
    * norms: one integer dot product, one double division.
    */
  def cosineExpr(qa: String, qb: String, na: String, nb: String): String =
    s"""cast(aggregate(zip_with($qa, $qb, (x, y) -> x * y),
       |       cast(0 as bigint), (a, v) -> a + v) as double)
       | / (sqrt(cast($na as double)) * sqrt(cast($nb as double)))"""
      .stripMargin

  /** Attach quantized vector + squared norm columns. */
  def prepare(df: DataFrame, embCol: String, qv: String = "qv",
      qn: String = "qn"): DataFrame =
    df.withColumn(qv, quantized(embCol)).withColumn(qn, sqNorm(qv))

  /** Brute-force cosine top-k: for every query vector, the k nearest
    * base vectors (self excluded), ties broken by neighbor id. The query
    * side is broadcast — the base side is scanned once, never shuffled;
    * the only exchange is the final per-query top-k.
    */
  def bruteForceTopK(base: DataFrame, queries: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val b = base.select(col(idCol).as("id_b"), col("qv").as("__qvb"),
      col("qn").as("__qnb"))
    val q = queries.select(col(idCol).as("query_id"), col("qv").as("__qva"),
      col("qn").as("__qna"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("id_b").asc)
    b.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("id_b"))
      .withColumn("sim",
        expr(cosineExpr("__qva", "__qvb", "__qna", "__qnb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id_b").as("neighbor_id"),
        col("sim"))
  }

  /** Random-hyperplane LSH bucket id (0 .. 2^planes − 1), scan-local.
    * Plane h's d-th component is nibble(md5(h ',' d)) − 7.5 — an md5-
    * derived pseudo-random value reproducible in any engine; projections
    * are sums of exact half-integers, so the sign (the bucket bit) is
    * deterministic.
    */
  def hyperplaneBucket(qvCol: String, planes: Int = 4): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(transform(sequence(1, $planes),
         |  h -> case when aggregate(
         |    zip_with(
         |      transform(sequence(0, size($qvCol) - 1),
         |        d -> cast(conv(substring(md5(concat(cast(h as string), ',',
         |               cast(d as string))), 1, 1), 16, 10) as double)
         |             - 7.5d),
         |      $qvCol,
         |      (w, x) -> w * cast(x as double)),
         |    cast(0 as double), (a, v) -> a + v) > 0d
         |  then shiftleft(1, $planes - h) else 0 end),
         |  0, (a, b) -> a + b)""".stripMargin)

  /** LSH-bucketed ANN: top-k neighbors per vector *within its bucket* —
    * the one-shuffle approximate path. Returns (query_id, rank,
    * neighbor_id, sim, bucket).
    */
  def lshTopK(prepared: DataFrame, idCol: String, k: Int,
      planes: Int = 4): DataFrame = {
    val withB = prepared.withColumn("bucket",
      hyperplaneBucket("qv", planes).cast("long"))
    val a = withB.select(col(idCol).as("query_id"), col("qv").as("__qva"),
      col("qn").as("__qna"), col("bucket"))
    val b = withB.select(col(idCol).as("id_b"), col("qv").as("__qvb"),
      col("qn").as("__qnb"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("id_b").asc)
    a.join(b, Seq("bucket"))
      .filter(col("query_id") =!= col("id_b"))
      .withColumn("sim",
        expr(cosineExpr("__qva", "__qvb", "__qna", "__qnb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id_b").as("neighbor_id"),
        col("sim"), col("bucket"))
  }

  /** Embedding-cosine near-duplicate pairs: all pairs within the same
    * LSH bucket with similarity ≥ threshold (a < b). The near-dup
    * variant of [[lshTopK]] — same single-shuffle shape.
    */
  def cosineNearDupPairs(prepared: DataFrame, idCol: String,
      threshold: Double, planes: Int = 4): DataFrame = {
    val withB = prepared.withColumn("bucket",
      hyperplaneBucket("qv", planes).cast("long"))
    val a = withB.select(col(idCol).as("id_a"), col("qv").as("__qva"),
      col("qn").as("__qna"), col("bucket"))
    val b = withB.select(col(idCol).as("id_b"), col("qv").as("__qvb"),
      col("qn").as("__qnb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        expr(cosineExpr("__qva", "__qvb", "__qna", "__qnb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim", "bucket")
  }
}
