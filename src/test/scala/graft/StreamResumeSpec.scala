package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-resume (SURVEY §2.11 E83): the production streaming
  * property — a stopped query restarted against the same
  * checkpointLocation must (a) not re-emit windows it already emitted,
  * and (b) CONTINUE aggregations whose rows span the restart, because
  * watermark + window state are restored from the checkpoint, not
  * rebuilt. Each run uses Trigger.AvailableNow (drain-and-stop), which
  * is exactly the restart-heavy batch-cadence deployment mode.
  */
class StreamResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val min = 60L * 1000

  private def writeFile(dir: java.io.File, name: String,
      rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("event_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  test("restart resumes state: no re-emission, cross-restart windows aggregate") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_resume_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val out = new java.io.File(root, "out"); out.mkdirs()
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = graft.streaming.Staging
        .withStreamShufflePartitions(spark) {
      val schema = "event_id BIGINT, ts TIMESTAMP"
      val q = spark.readStream.schema(schema)
        .parquet(src.getAbsolutePath)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(unix_millis(col("window.start")).as("w"), col("n"))
        .writeStream
        .outputMode("append")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          if (!df.isEmpty)
            df.write.mode("overwrite")
              .parquet(s"${out.getAbsolutePath}/batch-$id")
          ()
        }
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    def emitted(): Seq[(Long, Long)] = {
      val dirs = out.listFiles().filter(_.getName.startsWith("batch-"))
        .map(_.getAbsolutePath)
      if (dirs.isEmpty) Seq.empty
      else spark.read.parquet(dirs: _*).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    }

    // run 1: w0 holds 2 events, w1 holds 1, sentinel at 45m advances
    // the watermark to 15m — only w0 closes
    writeFile(src, "f1.parquet",
      Seq((1L, 7000L), (2L, 8000L), (3L, 10 * min + 7000), (4L, 45 * min + 7000)))
    runOnce()
    val afterRun1 = emitted()
    assert(afterRun1 === Seq((0L, 2L)), s"run 1 emitted $afterRun1")

    // run 2: one MORE w1 event at 16m — ON TIME against the RESTORED
    // watermark (15m07s; anything ≤ it would be dropped as late, which
    // is itself proof the watermark survived the restart) — plus a
    // sentinel at 95m that closes w1 and the 45m window.
    // w1 must total 2 = 1 (run 1, from restored state) + 1 (run 2).
    writeFile(src, "f2.parquet",
      Seq((5L, 16 * min + 0L), (6L, 95 * min + 7000)))
    runOnce()
    val afterRun2 = emitted().sortBy(_._1)

    // no window emitted twice
    assert(afterRun2.map(_._1).distinct.length === afterRun2.length,
      s"duplicate windows: $afterRun2")
    // w0 still exactly once with run-1's count; w1 aggregated ACROSS
    // the restart; the 45m sentinel window closed too
    assert(afterRun2 === Seq((0L, 2L), (10 * min, 2L), (40 * min, 1L)),
      s"got $afterRun2")
  }
}
