package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("streamed windowed counts equal the late-filtered batch result") {
    import spark.implicits._
    val min = 60L * 1000
    // ~3 hours of events, offset 7s from window boundaries so the final
    // watermark (max − 1h) never ties a window end exactly.
    val rows = (0 until 18).map { i =>
      (i.toLong, if (i % 2 == 0) "click" else "view", i * 10 * min + 7000)
    }
    val src = rows.toDF("event_id", "event_type", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val dir = new java.io.File(
      Scratch.register(Files.createTempDirectory("graft_es_spec").toString))
    val pq = s"${dir.getAbsolutePath}/events_src"
    src.coalesce(1).write.parquet(pq)
    val file = new java.io.File(pq).listFiles()
      .filter(_.getName.endsWith(".parquet")).head

    val got = EventStream.windowedCounts(spark, file.getAbsolutePath)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    // batch mirror: 10-minute windows, keep only window_end <= max - 1h
    val batch = src
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .count()
      .filter(unix_millis(col("window.end")) <= 170 * min + 7000 - 60 * min)
      .select(unix_millis(col("window.start")).as("w"), col("event_type"),
        col("count"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(got === batch)
    assert(got.nonEmpty)
  }
}
