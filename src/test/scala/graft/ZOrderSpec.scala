package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ZOrder

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches a reference Morton interleave on exhaustive 5-bit pairs") {
    import spark.implicits._
    val pairs = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.zValue("x", "y", 5))
      .orderBy("x", "y")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z === morton(x, y, 5), s"($x,$y)")
    }
  }

  test("z-order locality: shard bounding boxes are tighter than row-order shards") {
    import spark.implicits._
    // a 64x64 grid, arrival order = row-major (y varies fastest): a
    // row-major shard spans the full y range, a z-shard must not.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue("x", "y", 6))
    // 16 shards of 256 rows each, by top-4 z bits (z < 2^12)
    val spans = grid
      .withColumn("shard", expr("z >> 8"))
      .groupBy("shard")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(spans.length === 16)
    // each z-shard is a 16x16 box: both dimensions span 15, not 63
    spans.foreach { r =>
      assert(r.getAs[Long]("dx") === 15L)
      assert(r.getAs[Long]("dy") === 15L)
    }
  }

  test("zValue stays inside whole-stage codegen (no UDF, pure integer ops)") {
    val df = spark.range(100)
      .withColumn("x", col("id") % 7)
      .withColumn("y", col("id") % 11)
      .withColumn("z", ZOrder.zValue("x", "y", 16))
    df.collect()
    val exec = df.queryExecution.executedPlan
    assert(exec.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]))
    assert(!exec.toString.contains("ScalaUDF"))
  }

  test("bits bounds are enforced") {
    intercept[IllegalArgumentException](ZOrder.zValue("x", "y", 0))
    intercept[IllegalArgumentException](ZOrder.zValue("x", "y", 32))
  }
}
