package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable exact running (prefix) sums — the machinery behind sequence
  * packing (SURVEY §2.11 E59): assigning documents to fixed-token-budget
  * training bins needs every row's exact cumulative token count in a
  * global order, and the naive `SUM() OVER (ORDER BY …)` funnels the
  * corpus through ONE task (the same failure mode as the q06 global
  * window).
  *
  * This is [[DenseId]]'s count-then-offset construction generalized
  * from row counts to value sums:
  *   1. global sort (range exchange — the scalable primitive);
  *   2. one lightweight pass summing `valueCol` per partition;
  *   3. cumulative per-partition offsets (metadata-scale, broadcast);
  *   4. each partition emits offset + local running sum independently.
  * Two linear passes, no single-task stage, deterministic when
  * `orderCols` is a total order.
  */
object Packing {

  /** Append the INCLUSIVE running sum of `valueCol` (must be LongType)
    * in `orderCols` order. Null semantics match `SUM() OVER` exactly:
    * null values contribute nothing, and rows BEFORE the first non-null
    * value get a null running sum (not 0) — so the op is substitutable
    * for the window form anywhere.
    */
  def withRunningSum(df: DataFrame, out: String, valueCol: String,
      orderCols: Column*): DataFrame = {
    val sorted = df.orderBy(orderCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"$valueCol must be LongType, was ${sorted.schema(vIdx).dataType}")
    // INVARIANT: both passes must iterate the SAME RDD instance so the
    // range-partition assignment (ties included) is identical — see
    // Percentiles.exactFewGroups
    val sortedRdd = sorted.rdd
    val perPart: Array[(Int, Long, Boolean)] = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        var any = false
        it.foreach(r => if (!r.isNullAt(vIdx)) { s += r.getLong(vIdx); any = true })
        Iterator((pid, s, any))
      }.collect()
    // per-partition: (sum of all earlier partitions, any non-null earlier)
    val offsets: Map[Int, (Long, Boolean)] = {
      var acc = 0L
      var any = false
      perPart.sortBy(_._1).map { case (pid, s, a) =>
        val o = (acc, any); acc += s; any ||= a; pid -> o
      }.toMap
    }
    val bcOff = sorted.sparkSession.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+
      StructField(out, LongType, nullable = true))
    val rdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var (acc, any) = bcOff.value(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) { acc += r.getLong(vIdx); any = true }
        Row.fromSeq(r.toSeq :+ (if (any) acc else null))
      }
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }
}
