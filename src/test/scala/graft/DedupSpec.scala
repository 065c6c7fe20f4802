package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def users = {
    import spark.implicits._
    Seq(
      ("u1", 100L, 1L, "free"),
      ("u1", 200L, 2L, "paid"), // latest for u1
      ("u2", 50L, 1L, "free"),
      ("u1", 200L, 1L, "free") // same ts as latest, lower session
    ).toDF("user_id", "ts", "session_id", "level")
  }

  test("latestBy keeps the latest row per key with deterministic ties") {
    val got = Dedup.latestBy(users, Seq("user_id"), "ts", "session_id")
      .select("user_id", "level").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("u1" -> "paid", "u2" -> "free"))
  }

  test("firstBy keeps exactly one row per key") {
    val got = Dedup.firstBy(users, Seq("user_id"), Seq(col("ts").asc, col("session_id").asc))
    assert(got.count() === 2)
    assert(got.filter(col("user_id") === "u1").head().getAs[String]("level") === "free")
  }

  test("dedup is idempotent") {
    val once = Dedup.firstBy(users, Seq("user_id"), Seq(col("ts").asc, col("session_id").asc))
    val twice = Dedup.firstBy(once, Seq("user_id"), Seq(col("ts").asc, col("session_id").asc))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("arbitrary matches dropDuplicates row count") {
    assert(Dedup.arbitrary(users, Seq("user_id")).count() === 2)
  }
}
