package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DenseId

class DenseIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def df = {
    import spark.implicits._
    // deliberately unsorted, multiple partitions
    (1 to 500).map(i => ((i * 131) % 503, s"row$i")).toDF("k", "payload")
      .repartition(7)
  }

  test("ids are dense 1..n in key order") {
    val out = DenseId.withDenseId(df, "id", col("k").asc)
      .select("k", "id").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.length === 500)
    assert(out.map(_._2).sorted.toSeq === (1L to 500L))
    // id order is key order
    assert(out.sortBy(_._2).map(_._1).toSeq === out.map(_._1).sorted.toSeq)
  }

  test("deterministic across runs and equal to the window form") {
    import org.apache.spark.sql.expressions.Window
    val a = DenseId.withDenseId(df, "id", col("k").asc)
      .select("k", "id").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = DenseId.withDenseId(df, "id", col("k").asc)
      .select("k", "id").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val w = df.withColumn("id", row_number().over(Window.orderBy("k")).cast("long"))
      .select("k", "id").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a === w)
  }
}
