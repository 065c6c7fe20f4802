package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Staging, TombstoneScreen, VersionedStore}

/** Restart-resume for the streaming tombstone gate (q255's machinery):
  * a restarted run must not re-screen committed batches (blocked
  * counts would duplicate), the tombstone store must keep blocking
  * after the stop, and the canonical fingerprint must catch
  * re-formatted re-ingestions (case/whitespace changes), not just
  * byte-identical ones.
  */
class TombstoneScreenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeDocs(dir: java.io.File, name: String,
      rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = s"${dir.getAbsolutePath}/__stage_$name"
    rows.toDF("doc_id", "text").coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(dir, name).toPath)
  }

  private def rates(root: String): Map[Long, (Long, Long)] =
    VersionedStore.readAllBelow(spark, s"$root/rates", Long.MaxValue)
      .map(_.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap)
      .getOrElse(Map.empty)

  test("restart resumes: committed batches keep their counts, the " +
      "store keeps blocking, and reformatting does not evade") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_tomb_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    val tombstones = Seq("the deleted document body")
      .toDF("text")
      .select(graft.functions.TextFns.fingerprint("text").as("fp"))
      .localCheckpoint()

    def runOnce(): Unit = Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      TombstoneScreen.runInto(spark, docs, tombstones, state, ck)
    }

    // run 1: batch 0 has one verbatim re-ingestion, batch 1 is clean
    writeDocs(src, "f1.parquet", Seq(
      1L -> "the deleted document body", 2L -> "fresh content"))
    writeDocs(src, "f2.parquet", Seq(3L -> "more fresh content"))
    runOnce()
    assert(rates(state) === Map(0L -> ((2L, 1L)), 1L -> ((1L, 0L))))

    // run 2 (restart): a REFORMATTED copy (case + whitespace) must
    // still be blocked by the canonical fingerprint; committed
    // batches must not re-screen
    writeDocs(src, "f3.parquet", Seq(
      4L -> "  The   Deleted DOCUMENT body ", 5L -> "unrelated"))
    runOnce()
    assert(rates(state) ===
      Map(0L -> ((2L, 1L)), 1L -> ((1L, 0L)), 2L -> ((2L, 1L))))

    // run 3: nothing new arrives — no new versions
    runOnce()
    assert(rates(state).size === 3)
  }

  test("duplicate fingerprints in the tombstone store do not multiply " +
      "arrival rows or blocked counts") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_tomb_dup_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    // the same document deleted by THREE requesters: the store carries
    // its fingerprint three times — realistic for deletion requests
    val tombstones = Seq("the deleted document body",
        "the deleted document body", "THE  deleted Document body")
      .toDF("text")
      .select(graft.functions.TextFns.fingerprint("text").as("fp"))
      .localCheckpoint()
    assert(tombstones.count() === 3L &&
      tombstones.distinct().count() === 1L)

    writeDocs(src, "f1.parquet", Seq(
      1L -> "the deleted document body", 2L -> "fresh content"))
    Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      TombstoneScreen.runInto(spark, docs, tombstones, state, ck)
    }
    // without the probe-side dedup this reads (4, 3): the matched
    // arrival row triples through the left join
    assert(rates(state) === Map(0L -> ((2L, 1L))))
  }

  test("a decomposed (NFD) re-ingestion of tombstoned content is " +
      "blocked: the canonical fingerprint normalizes Unicode") {
    import spark.implicits._
    val root = new java.io.File(Scratch.register(
      Files.createTempDirectory("graft_tomb_nfd_spec").toString))
    val src = new java.io.File(root, "src"); src.mkdirs()
    val state = s"${root.getAbsolutePath}/state"
    val ck = s"${root.getAbsolutePath}/ck"

    // deletion request holds the PRECOMPOSED form (e-acute U+00E9)
    val tombstones = Seq("the caf\u00e9 r\u00e9sum\u00e9 to delete")
      .toDF("text")
      .select(graft.functions.TextFns.fingerprint("text").as("fp"))
      .localCheckpoint()

    // the re-ingestion arrives DECOMPOSED (e + combining acute) —
    // byte-distinct, reader-identical; pre-NFC chains let this through
    writeDocs(src, "f1.parquet", Seq(
      1L -> "the cafe\u0301 re\u0301sume\u0301 to delete",
      2L -> "unrelated clean document"))
    Staging.withStreamShufflePartitions(spark, "4") {
      val docs = spark.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(src.getAbsolutePath)
      TombstoneScreen.runInto(spark, docs, tombstones, state, ck)
    }
    assert(rates(state) === Map(0L -> ((2L, 1L))),
      "the NFD twin must be blocked")
  }
}
