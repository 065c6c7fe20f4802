package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Salting

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("salted join result is identical to the plain join") {
    import spark.implicits._
    val probe = (1 to 100).map(i => (i.toLong, (i % 3).toLong))
      .toDF("event_id", "user_id")
    val build = Seq((0L, "a"), (1L, "b"), (2L, "c"))
      .toDF("user_id", "tag")
    val salted = Salting.saltedEquiJoin(probe, build, Seq("user_id"),
        col("event_id"), 8)
      .select("event_id", "user_id", "tag")
    val plain = probe.join(build, Seq("user_id"))
      .select("event_id", "user_id", "tag")
    assert(salted.count() === 100)
    assert(salted.collect().toSet === plain.collect().toSet)
  }
}
