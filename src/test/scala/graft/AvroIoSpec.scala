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

  test("unsupported types fail fast at write time") {
    import spark.implicits._
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      AvroIo.write(df, scratch("graft_avro_spec_bad"))
    }
    assert(e.getMessage.contains("AvroIo supports"))
  }
}
