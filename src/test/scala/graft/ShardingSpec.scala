package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.ops.Sharding

/** [[Sharding.hrwShard]]: range, determinism, rough balance, and the
  * HRW property the operator exists for — growing n → n+1 moves ONLY
  * keys won by the new shard (nothing reshuffles between surviving
  * shards), at ~1/(n+1) expected rate.
  */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shards(n: Int, keys: Range = 0 until 2000) = {
    keys.map(_.toLong).toDF("k")
      .select(col("k"), Sharding.hrwShard("k", n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("shards are in [0, n) and assignment is deterministic") {
    val a = shards(8)
    val b = shards(8)
    assert(a === b)
    assert(a.values.forall(s => s >= 0 && s < 8))
  }

  test("rough balance: no shard under half or over double the mean") {
    val counts = shards(8).values.groupBy(identity).map(_._2.size)
    val mean = 2000.0 / 8
    assert(counts.size === 8)
    counts.foreach(c => assert(c > mean / 2 && c < mean * 2,
      s"shard count $c far from mean $mean"))
  }

  test("resize 8 -> 9 moves only keys won by the NEW shard, at " +
      "~1/9 rate; mod routing would move ~8/9") {
    val s8 = shards(8)
    val s9 = shards(9)
    val moved = s8.keys.filter(k => s8(k) != s9(k))
    // HRW: every moved key landed on the new shard 8
    moved.foreach(k => assert(s9(k) === 8L,
      s"key $k moved between surviving shards: ${s8(k)} -> ${s9(k)}"))
    // expected 2000/9 ~ 222; allow wide slack, the point is the
    // order of magnitude vs mod's ~1778
    assert(moved.size > 100 && moved.size < 400,
      s"moved ${moved.size}, expected ~222")
    val modMoved = s8.keys.count(k => k % 8 != k % 9)
    assert(modMoved > 1600, s"mod moved only $modMoved of 2000")
  }

  test("null keys route to null, not to a shard") {
    val out = Seq(Some(1L), None).toDF("k")
      .select(Sharding.hrwShard("k", 4).as("s")).collect()
    assert(out.count(_.isNullAt(0)) === 1)
  }
}
