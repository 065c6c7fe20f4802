package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cogrouped

class CogroupedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def run(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    Cogrouped.clickSignupAsof(
        rows.toDF("event_id", "user_id", "event_type", "ms"), spark)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
      .sortBy(_._1)
  }

  test("each click attributes to the most recent prior signup") {
    val got = run(Seq(
      (1L, 7L, "signup", 100L),
      (2L, 7L, "click", 150L),   // -> signup 1
      (3L, 7L, "signup", 200L),
      (4L, 7L, "click", 250L),   // -> signup 3
      (5L, 7L, "click", 260L)))  // -> signup 3 (pointer does not rewind)
    assert(got === Seq((2L, 100L, 1L), (4L, 200L, 3L), (5L, 200L, 3L)))
  }

  test("clicks before any signup attribute to null") {
    val got = run(Seq(
      (1L, 7L, "click", 50L),
      (2L, 7L, "signup", 100L),
      (3L, 7L, "click", 150L)))
    assert(got === Seq((1L, -1L, -1L), (3L, 100L, 2L)))
  }

  test("same-ms tie uses event_id order (signup with lower id counts)") {
    val got = run(Seq(
      (1L, 7L, "signup", 100L),
      (2L, 7L, "click", 100L),   // signup id 1 < click id 2 -> attributed
      (4L, 7L, "click", 200L),
      (5L, 7L, "signup", 200L))) // signup id 5 > click id 4 -> not yet
    assert(got === Seq((2L, 100L, 1L), (4L, 100L, 1L)))
  }

  test("users do not leak into each other") {
    val got = run(Seq(
      (1L, 7L, "signup", 100L),
      (2L, 8L, "click", 150L)))  // user 8 never signed up
    assert(got === Seq((2L, -1L, -1L)))
  }
}
