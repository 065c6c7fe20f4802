package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{NearDupIndex, Staging}

/** Restart-resume for the streaming near-dup index (q131's machinery,
  * the StreamIncrClustersSpec discipline applied to APPEND-state
  * stores): a restarted run must (a) not re-judge batches it already
  * committed, and (b) probe new arrivals against the STORED band
  * index — a post-restart duplicate of a pre-restart document must be
  * caught by the index read, not by any in-memory state.
  */
class NearDupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val textA = "the quick brown fox jumps over the lazy dog again"
  private val textB = "an entirely different sentence about spark physical plans"
  private val textC = "yet another unrelated document concerning parquet files"

  private def writeDocs(dir: java.io.File, name: String,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def verdicts(root: String): Set[(Long, Long)] =
    graft.streaming.VersionedStore
      .readAllBelow(spark, s"$root/verdicts", Long.MaxValue)
      .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .getOrElse(Set.empty)

  private def versions(root: String, sub: String): Seq[String] = {
    val f = new java.io.File(s"$root/$sub")
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("restart probes the stored index: cross-restart duplicates are " +
      "caught, committed batches are not re-judged") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_ndidx_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      NearDupIndex.runInto(spark, docs, state, ck)
    }

    // run 1: batch {1:A, 2:B}, then batch {3:A} — 3 duplicates 1 via
    // the stored index (batch 2 probing batch 1's bands)
    writeDocs(src, "f1.parquet", Seq((1L, textA), (2L, textB)))
    writeDocs(src, "f2.parquet", Seq((3L, textA)))
    runOnce()
    assert(verdicts(state) === Set((3L, 1L)))
    assert(versions(state, "bands").size === 2)

    // run 2 (restart, same checkpoint + state): {4:B, 5:C} — 4
    // duplicates 2, which arrived BEFORE the restart: only the stored
    // index can know that
    writeDocs(src, "f3.parquet", Seq((4L, textB), (5L, textC)))
    runOnce()
    assert(verdicts(state) === Set((3L, 1L), (4L, 2L)))
    // exactly ONE new version per store: runs 1's batches not re-judged
    assert(versions(state, "bands").size === 3)
    assert(versions(state, "verdicts").size === 3)

    // run 3: nothing new — a no-op resume
    runOnce()
    assert(versions(state, "verdicts").size === 3)
    assert(verdicts(state) === Set((3L, 1L), (4L, 2L)))
  }
}
