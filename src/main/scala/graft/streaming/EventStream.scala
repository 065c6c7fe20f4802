package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY §2.10 — extension beyond the
  * batch-only reference): file-source stream → event-time tumbling-window
  * aggregation with a watermark → sink.
  *
  * Semantics: 10-minute tumbling windows on event time, watermark
  * `delay` behind the max observed event time. In *append* mode a window
  * emits exactly once, when the watermark passes its end — so late data
  * within the delay still lands, and state for closed windows is dropped
  * (bounded state at 100 TB/day: state size is O(open windows × groups),
  * not O(stream)).
  *
  * The batch equivalence this is verified against: windows whose end ≤
  * final watermark, i.e. `GROUP BY time_bucket(10 min, ts)` filtered to
  * buckets closed before max(ts) − delay. That equivalence (stream
  * result ≡ late-filtered batch result) is the standard streaming
  * correctness statement, and is what the DuckDB oracle replays.
  */
object EventStream {

  /** Windowed counts per event_type over a parquet-file stream, run to
    * completion with Trigger.AvailableNow.
    */
  def windowedCounts(spark: SparkSession, srcParquet: String,
      window: String = "10 minutes",
      delay: String = "1 hour"): DataFrame = {
    val (events, tag) = Staging.stageAndRead(spark, srcParquet,
      "graft_stream_in")
    val qn = s"graft_stream_$tag"
    val query = events
      .withWatermark("ts", delay)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(qn)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    spark.table(qn)
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"))
      .orderBy("window_start_ms", "event_type")
  }

  /** Streaming exact dedup: distinct (user_id, event_type) pairs over
    * the stream via stateful `dropDuplicates` — each key's first arrival
    * passes, the rest are dropped across micro-batches. Projecting to
    * exactly the key columns makes the result deterministic (no
    * arbitrary carried row). State here is O(distinct keys); with event-
    * time bounds, `dropDuplicatesWithinWatermark` caps it for unbounded
    * key spaces.
    */
  def streamDedup(spark: SparkSession, srcParquet: String): DataFrame = {
    val (events, tag) = Staging.stageAndRead(spark, srcParquet,
      "graft_dedup_in")
    val qn = s"graft_dedup_$tag"
    val query = events
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(qn)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    spark.table(qn).orderBy("user_id", "event_type")
  }
}
