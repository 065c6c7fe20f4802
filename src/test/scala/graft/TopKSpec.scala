package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopK

/** Bounded top-k aggregator: ordering, ties, k larger than the
  * group, determinism under repartitioning (merge order must not
  * matter), and the partial-aggregation plan shape.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(String, Long, Long)], k: Int,
      parts: Int = 5): Map[String, Seq[(Long, Long)]] = {
    import spark.implicits._
    val tk = TopK.topK(k)
    rows.toDF("g", "score", "id").repartition(parts)
      .groupBy("g").agg(tk(col("score"), col("id")).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1))).toSeq)
      .toMap
  }

  test("keeps the k largest scores in descending order") {
    val out = run((1L to 10L).map(i => ("a", i, i * 100)), 3)
    assert(out("a") === Seq((10L, 1000L), (9L, 900L), (8L, 800L)))
  }

  test("score ties break by smaller id") {
    val out = run(Seq(("a", 5L, 30L), ("a", 5L, 10L), ("a", 5L, 20L)), 2)
    assert(out("a") === Seq((5L, 10L), (5L, 20L)))
  }

  test("a group smaller than k returns all its rows") {
    val out = run(Seq(("a", 1L, 1L), ("a", 2L, 2L)), 5)
    assert(out("a") === Seq((2L, 2L), (1L, 1L)))
  }

  test("independent groups keep independent buffers") {
    val out = run(Seq(("a", 9L, 1L), ("b", 1L, 2L), ("b", 7L, 3L)), 1)
    assert(out === Map("a" -> Seq((9L, 1L)), "b" -> Seq((7L, 3L))))
  }

  test("result is invariant to partitioning (merge order)") {
    val rows = (1L to 100L).map(i => ("g", (i * 37) % 50, i))
    assert(run(rows, 7, parts = 1) === run(rows, 7, parts = 13))
  }

  test("plans as a partial-aggregated ObjectHashAggregate, no Window") {
    import spark.implicits._
    val tk = TopK.topK(3)
    val df = (1L to 100L).map(i => (i % 10, i, i)).toDF("g", "s", "i")
      .groupBy("g").agg(tk(col("s"), col("i")).as("top"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_topkagg") ||
      plan.toLowerCase.contains("partial"))
    assert(!plan.contains("Window"))
  }
}
