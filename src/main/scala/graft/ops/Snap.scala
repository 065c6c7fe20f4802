package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}

/** RDD-handle checkpointing for driver-side iterative loops (the
  * [[PageRank.ranksAdaptive]] / [[DedupClusters]] discipline, shared).
  *
  * `Dataset.localCheckpoint()` pins an INTERNAL RDD that the caller
  * never sees: `Dataset.rdd` on the returned frame builds a fresh
  * deserialization lineage over it, so `returned.rdd.unpersist()` is a
  * no-op and superseded per-round state silently accumulates for the
  * loop's lifetime (see `streaming/Staging.scala`'s persist-vs-
  * checkpoint note). Pinning at the RDD level instead keeps the exact
  * persisted handle, so release is real — verified in `SnapSpec` via
  * `sparkContext.getPersistentRDDs` before/after.
  */
object Snap {

  /** Mark `df`'s rows for a local checkpoint and return the rebuilt
    * frame plus the EXACT RDD handle that holds the pinned blocks.
    * Lazy: the first job over the returned frame materializes the
    * checkpoint (callers in argmax/isEmpty-per-round loops already run
    * one — no extra job); call [[release]] with the handle once the
    * state is superseded.
    */
  def pin(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd
    rdd.localCheckpoint()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** [[pin]] + an immediate count() so the checkpoint materializes NOW
    * — for loops with no natural per-round action, where the previous
    * round must not be released until the current one is safely pinned.
    */
  def pinEager(df: DataFrame): (DataFrame, RDD[Row]) = {
    val (back, rdd) = pin(df)
    back.count()
    (back, rdd)
  }

  /** Free a superseded handle (null-safe, non-blocking). */
  def release(rdd: RDD[Row]): Unit =
    if (rdd != null) rdd.unpersist(blocking = false)
}
