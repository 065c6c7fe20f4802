package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.LongDot

class LongDotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("long_dot equals the higher-order-function dot product") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-10L, 0L, 7L), Seq(3L, 9L, -2L)),
      (Seq.empty[Long], Seq.empty[Long])
    ).toDF("a", "b")
    val got = df.select(
      LongDot.dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as bigint), (s, v) -> s + v)").as("hof"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(got(0).getLong(0) === 32L)
  }

  test("long_dot is null-safe") {
    import spark.implicits._
    val df = Seq((Option.empty[Seq[Long]], Option(Seq(1L, 2L))))
      .toDF("a", "b")
    val r = df.select(LongDot.dot(col("a"), col("b")).as("d")).head()
    assert(r.isNullAt(0))
  }

  test("long_dot survives codegen and interpreted paths identically") {
    import spark.implicits._
    val n = 500
    val df = (0 until n).map(i => (i.toLong, Seq.fill(16)(i.toLong % 7 - 3)))
      .toDF("id", "v")
    val total = df.select(sum(LongDot.dot(col("v"), col("v"))).as("s"))
      .head().getLong(0)
    val expected = (0 until n).map { i =>
      val v = Seq.fill(16)(i.toLong % 7 - 3); v.map(x => x * x).sum
    }.sum
    assert(total === expected)
  }
}
