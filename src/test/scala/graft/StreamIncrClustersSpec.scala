package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{IncrementalClusters, Staging}

/** Restart-resume for the streaming incremental-cluster pipeline
  * (q130's machinery, the StreamResumeSpec discipline applied to the
  * versioned label store): a stopped run restarted against the same
  * checkpoint + label store must (a) not re-fold batches it already
  * committed, and (b) CONTINUE folding new arrivals into the STORED
  * labeling — components spanning the restart must merge exactly as
  * a never-stopped run (and a full recompute) would merge them.
  */
class StreamIncrClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeEdges(dir: java.io.File, name: String,
      rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("id_a", "id_b").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def labels(labDir: String): Set[(Long, Long)] =
    IncrementalClusters.currentLabels(spark, labDir)
      .map(_.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
      .getOrElse(Set.empty)

  private def versions(labDir: String): Seq[String] = {
    val f = new java.io.File(labDir)
    if (!f.exists()) Seq.empty
    else f.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
  }

  test("restart resumes: committed batches stay folded, new arrivals " +
      "merge components across the stop") {
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_incrcc_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val labDir = s"${root.getAbsolutePath}/labels"
    val ck = s"${root.getAbsolutePath}/ck"

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val edges = spark.readStream
        .schema("id_a BIGINT, id_b BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      IncrementalClusters.runInto(spark, edges, labDir, ck)
    }

    // run 1: two micro-batches — {1,2} {3,4}, then {5,6}
    writeEdges(src, "f1.parquet", Seq((1L, 2L), (3L, 4L)))
    writeEdges(src, "f2.parquet", Seq((5L, 6L)))
    runOnce()
    assert(labels(labDir) ===
      Set((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L), (6L, 5L)))
    val versionsAfterRun1 = versions(labDir)
    assert(versionsAfterRun1.size === 2, s"got $versionsAfterRun1")

    // run 2 (restart, same checkpoint + store): one batch bridging
    // the stored components — (2,3) merges {1,2}∪{3,4}; (6,7) grows
    // {5,6}. The fold must read the RESTORED labeling, so the result
    // equals a full CC over all edges ever seen.
    writeEdges(src, "f3.parquet", Seq((2L, 3L), (6L, 7L)))
    runOnce()
    assert(labels(labDir) ===
      Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
        (5L, 5L), (6L, 5L), (7L, 5L)))
    val versionsAfterRun2 = versions(labDir)
    // exactly ONE new version: run 1's batches were not re-folded
    assert(versionsAfterRun2.size === 3, s"got $versionsAfterRun2")
    assert(versionsAfterRun2.take(2) === versionsAfterRun1)

    // run 3: nothing new — the resume is a no-op (no re-emission,
    // no new versions, labeling unchanged)
    runOnce()
    assert(versions(labDir) === versionsAfterRun2)
    assert(labels(labDir).contains((7L, 5L)))
  }
}
