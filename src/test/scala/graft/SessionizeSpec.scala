package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sessionize

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val min = 60L * 1000

  private def events = {
    import spark.implicits._
    Seq(
      // user A: two sessions separated by a 31-minute gap
      ("a", 1L, 0L), ("a", 2L, 5 * min), ("a", 3L, 36 * min),
      // user B: one session, exactly 30-minute gap is NOT a new session
      ("b", 4L, 0L), ("b", 5L, 30 * min)
    ).toDF("user_id", "event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
  }

  test("session boundaries open strictly after the gap timeout") {
    val got = Sessionize.sessionSummary(events, "user_id", "ts", "event_id",
        30 * min)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("a", 1L) -> 2L, // events 1,2
      ("a", 2L) -> 1L, // event 3 after 31-min gap
      ("b", 1L) -> 2L)) // 30-min gap: same session
  }

  test("session start/end bound the member events") {
    val s = Sessionize.sessionSummary(events, "user_id", "ts", "event_id",
        30 * min)
      .filter(col("user_id") === "a" && col("session_idx") === 1)
      .head()
    assert(s.getAs[Long]("session_start_ms") === 0L)
    assert(s.getAs[Long]("session_end_ms") === 5 * min)
  }
}
