package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Ev, UserState}

class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val minMs = 60L * 1000

  test("assign opens sessions only past the gap and carries state across batches") {
    // simulate two micro-batches through the raw transition function
    val state = new TestGroupState[UserState]
    val batch1 = Iterator(Ev(1, 1, 0), Ev(1, 2, 5 * minMs))
    val out1 = StatefulSessions.assign(30 * minMs)(1, batch1, state).toSeq
    assert(out1.map(_.session_idx) === Seq(1L, 1L))
    // batch 2 resumes from state: 31-minute gap -> new session
    val batch2 = Iterator(Ev(1, 3, 36 * minMs), Ev(1, 4, 37 * minMs))
    val out2 = StatefulSessions.assign(30 * minMs)(1, batch2, state).toSeq
    assert(out2.map(_.session_idx) === Seq(2L, 2L))
  }

  test("cross-batch out-of-order arrival merges into the current session, never rewinds") {
    val state = new TestGroupState[UserState]
    // batch 1 closes at 40min (sessions: [0,5min]=1, [40min]=2)
    val out1 = StatefulSessions.assign(30 * minMs)(1,
      Iterator(Ev(1, 1, 0), Ev(1, 2, 5 * minMs), Ev(1, 3, 40 * minMs)),
      state).toSeq
    assert(out1.map(_.session_idx) === Seq(1L, 1L, 2L))
    // batch 2 delivers a straggler from 38min (< lastMs 40min): it joins
    // the CURRENT session (2), does not renumber anything, and lastMs
    // stays 40min — so a 69min arrival (gap 29min from 40min) still
    // continues session 2 rather than measuring the gap from 38min
    val out2 = StatefulSessions.assign(30 * minMs)(1,
      Iterator(Ev(1, 4, 38 * minMs), Ev(1, 5, 69 * minMs)), state).toSeq
    assert(out2.map(_.session_idx) === Seq(2L, 2L))
    assert(state.get.lastMs === 69 * minMs)
  }

  test("streaming sessionization equals the batch window form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      (10L, 1L, 0L), (10L, 2L, 5 * minMs), (10L, 3L, 40 * minMs),
      (20L, 4L, 0L), (20L, 5L, 90 * minMs))
      .toDF("user_id", "event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val dir = Scratch.register(
      java.nio.file.Files.createTempDirectory("graft_ss_spec").toString)
    events.coalesce(1).write.parquet(s"$dir/src")
    val file = new java.io.File(s"$dir/src").listFiles()
      .filter(_.getName.endsWith(".parquet")).head

    val got = StatefulSessions
      .sessionSummaries(spark, file.getAbsolutePath, 30 * minMs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (10L, 1L) -> 2L, (10L, 2L) -> 1L,
      (20L, 1L) -> 1L, (20L, 2L) -> 1L))
  }
}

/** Minimal in-memory GroupState for exercising the transition function
  * outside a streaming query.
  */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = None
  private var removed = false
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(newValue: S): Unit = { v = Some(newValue); removed = false }
  override def remove(): Unit = { v = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
