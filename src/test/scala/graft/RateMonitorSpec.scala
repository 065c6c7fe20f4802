package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{RateMonitor, Staging}

/** Restart-resume for the streaming rate-monitor fold (q138's
  * machinery): a restarted run must not re-fold committed batches
  * (counts would double), must MERGE an hour that straddles batches —
  * and the restart — by summing, and must leave the folded buckets
  * equal to one groupBy over every event ever seen.
  */
class RateMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One parquet file per micro-batch: (event_type, ts at `hr` hours +
    * `off` minutes since epoch). Written with micros timestamps —
    * [[Staging]]'s schema pass-through leaves TimestampType alone.
    */
  private def writeEvents(dir: java.io.File, name: String,
      rows: Seq[(String, Long, Int)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("event_type", "hr", "off")
      .selectExpr("event_type",
        "timestamp_micros(hr * 3600000000 + CAST(off AS BIGINT) * 60000000) AS ts")
      .coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def buckets(root: String): Set[(String, Long, Long)] =
    RateMonitor.currentBuckets(spark, root)
      .map(_.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
      .getOrElse(Set.empty)

  private def versions(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("restart resumes the fold: no double-count, straddling hours " +
      "merge across batches and across the stop") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_rate_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val events = spark.readStream
        .schema("event_type STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      RateMonitor.runInto(spark, events, state, ck)
    }

    // run 1: batch 1 = 2 clicks @ hour 10; batch 2 = 1 click @ hour 10
    // (STRADDLE: must merge to 3, not replace to 1) + 1 view @ hour 11
    writeEvents(src, "f1.parquet",
      Seq(("click", 10L, 5), ("click", 10L, 20)))
    writeEvents(src, "f2.parquet",
      Seq(("click", 10L, 40), ("view", 11L, 0)))
    runOnce()
    assert(buckets(state) ===
      Set(("click", 10L, 3L), ("view", 11L, 1L)))
    val versions1 = versions(s"$state/buckets")
    assert(versions1.size === 2, s"got $versions1")

    // run 2 (restart, same checkpoint + state): hour 10 straddles the
    // STOP too — the stored 3 must become 4, and run 1's batches must
    // not re-fold (a re-fold would yield 7, not 4)
    writeEvents(src, "f3.parquet",
      Seq(("click", 10L, 55), ("view", 12L, 10)))
    runOnce()
    assert(buckets(state) ===
      Set(("click", 10L, 4L), ("view", 11L, 1L), ("view", 12L, 1L)))
    val versions2 = versions(s"$state/buckets")
    assert(versions2.size === 3, s"got $versions2")
    assert(versions2.take(2) === versions1)

    // run 3: nothing new — the resume is a no-op
    runOnce()
    assert(versions(s"$state/buckets") === versions2)
    assert(buckets(state).contains(("click", 10L, 4L)))
  }
}
