package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{SkylineStream, Staging, VersionedStore}

/** Restart-resume for the streaming incremental skyline (q187's
  * machinery): the stored frontier must be a sufficient statistic —
  * an arriving point that dominates stored members EVICTS them, a
  * dominated arrival changes nothing (but still commits its
  * version), and a restarted run neither re-folds committed batches
  * nor loses the frontier.
  */
class SkylineStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One parquet file per micro-batch: (doc_id, text). A doc of n
    * tokens with d distinct lands at (x = n, y = d·10⁴ div n).
    */
  private def writeDocs(dir: java.io.File, name: String,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def frontier(root: String): Set[(Long, Long)] =
    VersionedStore.latestBelow(spark, s"$root/frontier", Long.MaxValue)
      .map(p => spark.read.parquet(p).collect()
        .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet)
      .getOrElse(Set.empty)

  private def versions(dir: String): Seq[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("arrivals evict dominated frontier members across a restart; " +
      "dominated arrivals fold as no-ops; committed batches never " +
      "re-fold") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_sky_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      SkylineStream.runInto(spark, docs, state, ck)
    }

    // batch 1: "a b" → (2, 10000); "c c c" → (3, 3333). Incomparable:
    // both on the frontier.
    writeDocs(src, "f1.parquet", Seq((1L, "a b"), (2L, "c c c")))
    runOnce()
    assert(frontier(state) === Set((2L, 10000L), (3L, 3333L)))

    // batch 2 (restart): "p q r" → (3, 10000) dominates BOTH stored
    // points (≥ on each axis, > on at least one) → the frontier
    // collapses to it alone.
    writeDocs(src, "f2.parquet", Seq((3L, "p q r")))
    runOnce()
    assert(frontier(state) === Set((3L, 10000L)))
    assert(versions(s"$state/frontier").size === 2)

    // batch 3: "x x" → (2, 5000), dominated → frontier unchanged,
    // but the fold still commits its version.
    writeDocs(src, "f3.parquet", Seq((4L, "x x")))
    runOnce()
    assert(frontier(state) === Set((3L, 10000L)))
    assert(versions(s"$state/frontier").size === 3)

    // restart with nothing new: no re-fold, no new version
    runOnce()
    assert(versions(s"$state/frontier").size === 3)
    assert(frontier(state) === Set((3L, 10000L)))
  }
}
