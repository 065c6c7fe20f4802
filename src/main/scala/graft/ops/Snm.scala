package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (SURVEY §2.11 extension) — the
  * SORT-based candidate-generation family for record linkage,
  * complementing the hash/index families already in the engine
  * (MinHash bands, SimHash blocks, deletion-variant index): sort the
  * corpus by a blocking key, compare each record only against its w
  * successors in sort order. Classic guarantee: any true pair whose
  * key renditions land within w positions is generated; candidate
  * volume is EXACTLY n·w − w(w+1)/2 — linear in n, chosen by the
  * operator, never data-dependent like a hot LSH bucket.
  *
  * Scale shape: the rank comes from [[DenseId]]'s count-then-offset
  * range exchange (the same exchange a global sort pays — no global
  * window funnel), and the "within w positions" predicate is turned
  * into an EQUI-join: explode each record into its w successor ranks
  * (rank + 1 … rank + w) and join on that integer — a hash shuffle on
  * an evenly-distributed key, never an inequality range join. At any
  * corpus size the cost is one range exchange + one w-fold explode +
  * one equi-join; skew-free by construction because ranks are unique.
  */
object Snm {

  /** Ordered candidate pairs (id_a, key_a, id_b, key_b) with
    * rank(b) − rank(a) ∈ [1, w] under (keyCol asc, idCol asc) order.
    */
  def candidates(df: DataFrame, idCol: String, keyCol: String,
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1: $w")
    val ranked = DenseId.withDenseId(
      df.select(col(idCol).as("__id"), col(keyCol).as("__k")),
      "__r", col("__k").asc, col("__id").asc)
    val right = ranked.select(col("__id").as("id_b"),
      col("__k").as("key_b"), col("__r").as("__rb"))
    ranked
      .select(col("__id").as("id_a"), col("__k").as("key_a"),
        col("__r"),
        explode(array((1 to w).map(lit(_)): _*)).as("__o"))
      .withColumn("__rb", col("__r") + col("__o"))
      .join(right, "__rb")
      .select("id_a", "key_a", "id_b", "key_b")
  }
}
