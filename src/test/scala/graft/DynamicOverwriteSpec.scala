package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition overwrite — the idempotent-daily-rerun write
  * semantic (SURVEY §2.11 E109): a partitioned table re-materialized
  * for ONE partition key must replace exactly that partition and leave
  * every other partition's files untouched. STATIC mode (the default)
  * truncates the whole table first — re-running one day's job would
  * silently drop every other day; DYNAMIC scopes the overwrite to the
  * partitions present in the incoming data. At 100 TB the difference
  * is "re-run yesterday" vs "re-ingest the corpus".
  */
class DynamicOverwriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeInitial(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c"), (4L, "fr", "d"))
      .toDF("id", "lang", "payload")
      .write.partitionBy("lang").parquet(dir)
  }

  test("dynamic mode replaces only the partitions present in the batch") {
    import spark.implicits._
    val dir = Scratch.register(
      Files.createTempDirectory("graft_dynover").toString) + "/t"
    writeInitial(dir)
    val deBefore = new java.io.File(s"$dir/lang=de").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet

    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the "re-run of the en job": replaces lang=en only
      Seq((10L, "en", "a2")).toDF("id", "lang", "payload")
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    }

    val got = spark.read.parquet(dir)
      .select("id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // en fully replaced; de and fr intact
    assert(got === Set((10L, "en"), (3L, "de"), (4L, "fr")))
    // de's FILES are untouched (not rewritten-in-place): same names
    val deAfter = new java.io.File(s"$dir/lang=de").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    assert(deAfter === deBefore)
  }

  test("static mode (the default) would truncate the other partitions — " +
      "the failure dynamic exists to prevent") {
    import spark.implicits._
    val dir = Scratch.register(
      Files.createTempDirectory("graft_statover").toString) + "/t"
    writeInitial(dir)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      .equalsIgnoreCase("static"))
    Seq((10L, "en", "a2")).toDF("id", "lang", "payload")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val langs = spark.read.parquet(dir).select("lang")
      .distinct().collect().map(_.getString(0)).toSet
    assert(langs === Set("en"), "static overwrite truncates the table")
  }
}
