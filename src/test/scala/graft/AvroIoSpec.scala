package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.AvroIo

/** [[graft.sources.AvroIo]] container-file roundtrips: every supported
  * type branch, nulls through the union, one file per partition,
  * overwrite semantics, and the unsupported-type fail-fast.
  */
class AvroIoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("n", IntegerType),
    StructField("x", DoubleType),
    StructField("s", StringType),
    StructField("b", BooleanType)))

  private def scratch(name: String): String =
    Scratch.register(s"${System.getProperty("java.io.tmpdir")}/${name}_" +
      ProcessHandle.current().pid())

  test("roundtrip preserves rows, types, and nulls") {
    val rows = Seq(
      Row(1L, 10, 1.5, "alpha", true),
      Row(2L, null, -0.25, null, false),
      Row(3L, 30, null, "gamma", null),
      Row(null, 40, 4.0, "delta", true))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val path = scratch("graft_avro_spec")
    AvroIo.write(df, path)
    val back = AvroIo.read(spark, path, schema)
    assert(back.schema.fieldNames.toSeq === schema.fieldNames.toSeq)
    assert(back.collect().toSet === rows.toSet)
    // one container file per upstream partition
    val files = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.endsWith(".avro"))
    assert(files.length === 3)
  }

  test("write overwrites a previous directory") {
    val path = scratch("graft_avro_spec_ow")
    val df1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 1, 1.0, "a", true)), 1),
      schema)
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, 2, 2.0, "b", false)), 1),
      schema)
    AvroIo.write(df1, path)
    AvroIo.write(df2, path)
    assert(AvroIo.read(spark, path, schema).collect().toSeq ===
      Seq(Row(2L, 2, 2.0, "b", false)))
  }

  test("empty frames roundtrip: schema preserved, zero rows, files " +
      "still written per partition") {
    val path = scratch("graft_avro_spec_empty")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row], 2), schema)
    AvroIo.write(df, path)
    val back = AvroIo.read(spark, path, schema)
    assert(back.count() === 0L)
    assert(back.schema.fieldNames.toSeq === schema.fieldNames.toSeq)
    val files = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.endsWith(".avro"))
    assert(files.length === 2, "empty partitions still emit containers")
  }

  test("sync-marker splits: one container reads as multiple tasks " +
      "with no row lost or duplicated") {
    // ~600 KB of records in ONE container → ~10 avro blocks at the
    // default 64 KB sync interval; 64 KB read splits must then fan
    // the single file out to many tasks and still partition the
    // blocks exactly (sync/pastSync assigns each block to one range).
    val path = scratch("graft_avro_spec_split")
    val payload = "x" * 100
    val rows = (0 until 6000).map(i =>
      Row(i.toLong, i, i / 2.0, s"$payload$i", i % 2 == 0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    AvroIo.write(df, path)
    val files = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.endsWith(".avro"))
    assert(files.length === 1)
    val back = AvroIo.read(spark, path, schema, splitBytes = 64L * 1024)
    assert(back.rdd.getNumPartitions > 1,
      "one container must split into multiple tasks")
    assert(back.count() === 6000L)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 6000L).toSeq, "every block in exactly one split")
  }

  test("read refuses an uncommitted directory (no _SUCCESS)") {
    val path = scratch("graft_avro_spec_nosuccess")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 1, 1.0, "a", true)), 1),
      schema)
    AvroIo.write(df, path)
    assert(new java.io.File(path, "_SUCCESS").delete())
    val e = intercept[java.io.IOException] {
      AvroIo.read(spark, path, schema)
    }
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("a failed mid-job write leaves the previous target intact " +
      "and no temp directory behind") {
    val path = scratch("graft_avro_spec_atomic")
    val df1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 1, 1.0, "a", true)), 1),
      schema)
    AvroIo.write(df1, path)
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(0 until 10, 2).map { i =>
        if (i == 7) throw new RuntimeException("boom")
        Row(i.toLong, i, 1.0, "b", false)
      }, schema)
    intercept[org.apache.spark.SparkException] { AvroIo.write(bad, path) }
    assert(AvroIo.read(spark, path, schema).collect().toSeq ===
      Seq(Row(1L, 1, 1.0, "a", true)), "target must be the pre-write data")
    val leftovers = new java.io.File(path).getParentFile.listFiles()
      .map(_.getName).filter(_.contains("graft_avro_spec_atomic"))
      .filter(_.contains("__inprogress"))
    assert(leftovers.isEmpty, s"temp dirs left: ${leftovers.toSeq}")
  }

  test("a successful overwrite leaves no backup sibling behind (the " +
      "two-phase swap cleans up its rename-aside copy)") {
    val path = scratch("graft_avro_spec_swap")
    val df1 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 1, 1.0, "a", true)), 1),
      schema)
    val df2 = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, 2, 2.0, "b", false)), 1),
      schema)
    AvroIo.write(df1, path)
    AvroIo.write(df2, path) // commit swap moves df1 aside, then drops it
    assert(AvroIo.read(spark, path, schema).collect().toSeq ===
      Seq(Row(2L, 2, 2.0, "b", false)))
    val strays = new java.io.File(path).getParentFile.listFiles()
      .map(_.getName).filter(_.contains("graft_avro_spec_swap"))
      .filterNot(_ == new java.io.File(path).getName)
    assert(strays.isEmpty, s"swap left siblings behind: ${strays.toSeq}")
  }

  test("unsupported types fail fast at write time") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroIo.write(df, scratch("graft_avro_spec_bad"))
    }
    assert(e.getMessage.contains("AvroIo supports"))
  }
}
