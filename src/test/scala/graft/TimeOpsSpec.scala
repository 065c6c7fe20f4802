package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeOps

class TimeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  // The reference's golden log record timestamp (README.md:33):
  // 1541105830796 ms = 2018-11-01 20:57:10.796 UTC (a Thursday).
  private val goldenMs = 1541105830796L

  test("epoch-ms -> timestamp preserves sub-second precision (SURVEY §2.7 U1)") {
    import spark.implicits._
    val df = Seq(goldenMs).toDF("ts_ms")
      .withColumn("ts", TimeOps.fromEpochMillis(col("ts_ms")))
      .withColumn("back", TimeOps.toEpochMillis(col("ts")))
    assert(df.head().getAs[Long]("back") === goldenMs)
  }

  test("calendar fields match the reference semantics on the golden record") {
    import spark.implicits._
    val df = TimeOps.withCalendarFields(
      Seq(goldenMs).toDF("ts_ms")
        .withColumn("t", TimeOps.fromEpochMillis(col("ts_ms"))), "t")
    val r = df.head()
    assert(r.getAs[Long]("hour") === 20L)
    assert(r.getAs[Long]("day") === 1L)
    assert(r.getAs[Long]("week") === 44L)
    assert(r.getAs[Long]("month") === 11L)
    assert(r.getAs[Long]("year") === 2018L)
    assert(r.getAs[Long]("weekday") === 5L) // Spark: 1=Sun .. 7=Sat; Thu=5
  }
}
