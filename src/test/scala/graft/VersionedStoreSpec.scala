package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.VersionedStore

/** The versioned-store surface q130/q131/q135 stand on: read-below /
  * read-at semantics, snapshot retention, and append-state
  * consolidation — each checked for the invariant that makes it safe
  * (latest read unchanged, union-read contents preserved).
  */
class VersionedStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String =
    Files.createTempDirectory("graft_vstore").toString

  private def writeVersions(dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.foreach(i =>
      VersionedStore.write(Seq((i, s"v$i")).toDF("id", "payload"), dir, i))
  }

  private def readIds(path: String): Set[Long] =
    spark.read.parquet(path).collect().map(_.getLong(0)).toSet

  test("readAt returns exactly the requested version; None for absent") {
    val dir = freshDir()
    writeVersions(dir, Seq(0L, 1L, 2L))
    assert(VersionedStore.readAt(spark, dir, 1L).map(
      _.collect().map(_.getString(1)).toSeq) === Some(Seq("v1")))
    assert(VersionedStore.readAt(spark, dir, 5L).isEmpty)
  }

  test("latestBelow/allBelow honor the strict bound") {
    val dir = freshDir()
    writeVersions(dir, Seq(0L, 1L, 3L))
    assert(VersionedStore.latestBelow(spark, dir, 3L)
      .exists(_.endsWith("batch-1")))
    assert(VersionedStore.allBelow(spark, dir, Long.MaxValue)
      .map(_.split("batch-").last.toLong) === Seq(0L, 1L, 3L))
  }

  test("compactSnapshots retires all but the newest retainLast; " +
      "the latest read is unchanged and retired versions vanish") {
    val dir = freshDir()
    writeVersions(dir, Seq(0L, 1L, 2L, 3L))
    val before = VersionedStore.latestBelow(spark, dir, Long.MaxValue)
      .map(readIds).get
    val retired = VersionedStore.compactSnapshots(spark, dir, retainLast = 2)
    assert(retired === Seq(0L, 1L))
    assert(VersionedStore.allBelow(spark, dir, Long.MaxValue)
      .map(_.split("batch-").last.toLong) === Seq(2L, 3L))
    assert(VersionedStore.latestBelow(spark, dir, Long.MaxValue)
      .map(readIds).get === before)
    assert(VersionedStore.readAt(spark, dir, 0L).isEmpty)
  }

  test("compactSnapshots never deletes the last remaining version") {
    val dir = freshDir()
    writeVersions(dir, Seq(7L))
    assert(VersionedStore.compactSnapshots(spark, dir, retainLast = 1)
      === Seq.empty)
    assert(VersionedStore.readAt(spark, dir, 7L).isDefined)
  }

  test("consolidateAppend preserves the union-read exactly and " +
      "collapses the inputs to one version") {
    val dir = freshDir()
    writeVersions(dir, Seq(0L, 1L, 2L, 4L))
    val before = VersionedStore.readAllBelow(spark, dir, Long.MaxValue)
      .get.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    VersionedStore.consolidateAppend(spark, dir, upTo = 2L)
    assert(VersionedStore.allBelow(spark, dir, Long.MaxValue)
      .map(_.split("batch-").last.toLong) === Seq(2L, 4L))
    val after = VersionedStore.readAllBelow(spark, dir, Long.MaxValue)
      .get.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after === before)
    // the consolidated version alone carries all three inputs
    assert(readIds(s"$dir/batch-2") === Set(0L, 1L, 2L))
  }

  private def fs(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  test("consolidateAppend adopts a crashed predecessor's complete " +
      "temp copy instead of rebuilding from the surviving inputs") {
    val dir = freshDir()
    writeVersions(dir, Seq(0L, 1L, 2L))
    // simulate a predecessor that wrote the full consolidated copy
    // (with its _SUCCESS marker)...
    spark.read.parquet(s"$dir/batch-0", s"$dir/batch-1", s"$dir/batch-2")
      .write.parquet(s"$dir/.compact-2")
    // ...then crashed after retiring one input: batch-0's rows now
    // exist ONLY in the temp copy
    fs(dir).delete(new org.apache.hadoop.fs.Path(s"$dir/batch-0"), true)
    VersionedStore.consolidateAppend(spark, dir, upTo = 2L)
    // a survivors-only rebuild would have lost id 0
    assert(readIds(s"$dir/batch-2") === Set(0L, 1L, 2L))
    assert(VersionedStore.allBelow(spark, dir, Long.MaxValue)
      .map(_.split("batch-").last.toLong) === Seq(2L))
  }

  test("consolidateAppend discards a half-written temp (no _SUCCESS) " +
      "and rebuilds from the intact inputs") {
    val dir = freshDir()
    writeVersions(dir, Seq(0L, 1L))
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/.compact-1")
    fs(dir).mkdirs(tmp)
    fs(dir).create(new org.apache.hadoop.fs.Path(tmp, "part-junk"))
      .close()
    VersionedStore.consolidateAppend(spark, dir, upTo = 1L)
    assert(readIds(s"$dir/batch-1") === Set(0L, 1L))
  }
}
