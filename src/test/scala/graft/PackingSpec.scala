package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  test("distributed running sum equals the single-task window form") {
    import spark.implicits._
    // enough rows to spread across many range partitions, values chosen
    // so every prefix is distinct from what a dropped/duplicated row
    // would produce
    val df = (1L to 10000L).map(i => (i, i % 97 + 1)).toDF("k", "v")
      .repartition(16)
    val got = Packing.withRunningSum(df, "cum", "v", col("k"))
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val want = df
      .withColumn("cum", sum("v").over(
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)))
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got === want)
    assert(got(10000L) === (1L to 10000L).map(_ % 97 + 1).sum)
  }

  test("null semantics match SUM() OVER exactly, including leading nulls") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // leading null: the window form emits NULL until the first non-null
    // value — the op must agree (0 there would be a silent divergence)
    val df = Seq((1L, None), (2L, Some(5L)), (3L, None), (4L, Some(7L)))
      .toDF("k", "v")
    val got = Packing.withRunningSum(df, "cum", "v", col("k"))
      .orderBy("k").select("cum").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got === Seq(None, Some(5L), Some(5L), Some(12L)))
    val win = df.withColumn("cum", sum("v").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("k").select("cum").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got === win)
  }

  test("non-long value column is refused") {
    import spark.implicits._
    val df = Seq((1L, 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Packing.withRunningSum(df, "cum", "v", col("k"))
    }
  }
}
