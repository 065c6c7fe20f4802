package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

class StagingRocksDbSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream dedup on the RocksDB state store matches the default store exactly") {
    val src = "/root/testdata/sf0.001/events.parquet"
    val default = EventStream.streamDedup(spark, src).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val rocks = EventStream.streamDedup(spark, src, rocksDb = true)
      .collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(default.nonEmpty)
    assert(rocks === default)
    // the scoped provider config must not leak out of the helper
    assert(spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .forall(_ != graft.streaming.Staging.RocksDbProvider))
  }
}
