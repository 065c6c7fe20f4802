package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch interval join without a cartesian plan (SURVEY §2.11 E55).
  *
  * The naive form — `l JOIN r ON l.key = r.key AND r.t BETWEEN l.t AND
  * l.t + lag` — is an equi-join in Spark only on `key`; when one key
  * dominates (or the key is dropped) the range predicate degenerates to
  * a per-key all-pairs scan. The scale-safe construction buckets time
  * into `maxLag`-wide bins:
  *
  *   - the RIGHT side keeps its one bin `floor(rt / w)`;
  *   - the LEFT side duplicates into bins `floor(lt / w)` and
  *     `floor(lt / w) + 1` — any right event within `[lt, lt + w]`
  *     lands in one of those two bins;
  *   - one equi-join on (key, bin), then the exact range filter.
  *
  * Each qualifying pair matches exactly once (the left copies carry
  * distinct bin values; the right row has one), so no distinct is
  * needed. Cost: 2× the left row count through one hash shuffle — never
  * quadratic in events-per-key; the per-bin fanout is bounded by event
  * density per `maxLag` window, the quantity the join's own semantics
  * already bound.
  */
object IntervalJoin {

  /** Pairs (left, right) with `left.key = right.key` and
    * `0 ≤ rightTs − leftTs ≤ maxLag` (inclusive, matching the streaming
    * interval-join contract of `EventStream.clickAttribution`).
    * Timestamp columns are epoch-scaled longs; `maxLag` is in the same
    * unit. Output carries every column of both inputs except the join
    * key once and the internal bin columns.
    */
  def within(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, maxLag: Long): DataFrame = {
    require(maxLag > 0, s"maxLag must be positive: $maxLag")
    // EXACT long floor-division: subtracting pmod makes the numerator
    // divisible, then `div` stays in integer arithmetic. floor(x / w)
    // through doubles would round nanosecond-scale epochs (> 2^53) to
    // 256-multiples and mis-bin ~1% of boundary pairs — silently
    // dropping in-window matches from the equi-join.
    def bin(tsCol: String): Column =
      expr(s"($tsCol - pmod($tsCol, ${maxLag}L)) div ${maxLag}L")
    val l = left
      .withColumn("__bin", explode(array(bin(leftTs), bin(leftTs) + 1L)))
    val r = right.withColumn("__bin", bin(rightTs))
    l.join(r, Seq(keyCol, "__bin"))
      .filter(col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + maxLag)
      .drop("__bin")
  }
}
