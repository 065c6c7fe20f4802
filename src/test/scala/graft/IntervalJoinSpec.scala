package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def sides = {
    import spark.implicits._
    // left events at t=1000 (user 1) and t=5000 (user 2)
    val l = Seq((1L, 10L, 1000L), (2L, 11L, 5000L))
      .toDF("user_id", "left_id", "lt")
    // rights probe every boundary: same instant, interior, exactly at
    // maxLag, one past maxLag, before left, wrong user
    val r = Seq(
      (1L, 20L, 1000L),  // lag 0         -> match
      (1L, 21L, 1400L),  // interior      -> match (crosses a bin edge)
      (1L, 22L, 2000L),  // lag == maxLag -> match (inclusive)
      (1L, 23L, 2001L),  // lag > maxLag  -> no
      (1L, 24L, 999L),   // before left   -> no
      (3L, 25L, 1000L)   // other key     -> no
    ).toDF("user_id", "right_id", "rt")
    (l, r)
  }

  test("inclusive [0, maxLag] window; key-scoped; each pair exactly once") {
    val (l, r) = sides
    val got = IntervalJoin.within(l, r, "user_id", "lt", "rt", 1000L)
      .select("left_id", "right_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(got === Seq((10L, 20L), (10L, 21L), (10L, 22L)))
  }

  test("bin duplication never duplicates a pair, even on bin boundaries") {
    import spark.implicits._
    // left exactly on a bin edge: its two copies land in bins 1 and 2;
    // a right in bin 1 at the same instant must match once, not twice
    val l = Seq((1L, 10L, 1000L)).toDF("user_id", "left_id", "lt")
    val r = Seq((1L, 20L, 1000L), (1L, 21L, 1999L), (1L, 22L, 2000L))
      .toDF("user_id", "right_id", "rt")
    val got = IntervalJoin.within(l, r, "user_id", "lt", "rt", 1000L)
    assert(got.count() === 3L)
    assert(got.select("right_id").distinct().count() === 3L)
  }

  test("nanosecond-scale epochs (> 2^53) bin exactly — no dropped boundary pairs") {
    import spark.implicits._
    // with double-based binning these timestamps round to 256-multiples
    // and the right row lands two bins away from the left — the match
    // silently vanishes; exact long division must keep it
    val lt = 1700000000000004761L
    val l = Seq((1L, 10L, lt)).toDF("user_id", "left_id", "lt")
    val r = Seq((1L, 20L, lt + 1000L), (1L, 21L, lt + 1001L))
      .toDF("user_id", "right_id", "rt")
    val got = IntervalJoin.within(l, r, "user_id", "lt", "rt", 1000L)
      .select("right_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(20L)) // inclusive at maxLag, exclusive past it
  }

  test("batch interval join result equals the streaming q57 result") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q70_interval_join")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val stream = SparkEntry.queries("q57_stream_stream_join")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(batch === stream)
  }
}
