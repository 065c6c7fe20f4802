package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable deterministic dense surrogate keys — the at-scale form of
  * SURVEY §2.6 X1 (the reference's `monotonically_increasing_id`,
  * `etl.py:70,153`, with its intended dense semantics).
  *
  * The three ways to number rows:
  *  - `row_number().over(Window.orderBy(...))` — dense and
  *    deterministic, but funnels EVERY row through one task (the q06
  *    parity form; dies at scale);
  *  - `monotonically_increasing_id` — fully parallel, but sparse
  *    (partition id in the high bits) and unstable across runs /
  *    repartitioning;
  *  - this one: range-partition + sort by the key (the same exchange a
  *    global sort uses), count rows per partition (one lightweight
  *    count-only job), then id = partition offset + local position.
  *    Dense, deterministic for a unique key, and every partition
  *    numbers its rows independently. RDD `zipWithIndex` provides
  *    exactly the count-then-offset machinery — one of the few genuine
  *    per-partition imperative jobs in the engine.
  */
object DenseId {

  /** Append a dense 1-based id assigned in `orderCols` order.
    * Deterministic iff `orderCols` is a total order (e.g. contains a
    * unique key) — the same contract the window form has.
    */
  def withDenseId(df: DataFrame, out: String, orderCols: Column*): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(out, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}
