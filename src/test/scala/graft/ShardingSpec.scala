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

  private def twoLevel(nInner: Int, keys: Range = 0 until 2000) =
    keys.map(_.toLong).toDF("k")
      .select(col("k"), Sharding.hrwShard("k", 8).as("sup"))
      .select(col("k"), col("sup"),
        Sharding.hrwShardWithin("k", "sup", nInner).as("inner"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("two-level HRW: inner shards in range, deterministic, and " +
      "roughly balanced within each super-shard") {
    val a = twoLevel(8)
    assert(a === twoLevel(8))
    assert(a.values.forall { case (sup, i) =>
      sup >= 0 && sup < 8 && i >= 0 && i < 8 })
    // each super-shard uses its whole inner range (250 keys over 8
    // inner shards leaves no inner shard empty w.h.p.)
    a.values.groupBy(_._1).foreach { case (sup, vs) =>
      assert(vs.map(_._2).toSet.size === 8,
        s"super-shard $sup uses ${vs.map(_._2).toSet.size} inner shards")
    }
  }

  test("two-level HRW: resizing the INNER fan-out 8 -> 9 moves keys " +
      "only onto the new inner shard and never across super-shards") {
    val i8 = twoLevel(8)
    val i9 = twoLevel(9)
    var movedInner = 0
    i8.keys.foreach { k =>
      val (sup8, in8) = i8(k)
      val (sup9, in9) = i9(k)
      assert(sup8 === sup9, s"key $k left its super-shard")
      if (in8 != in9) {
        assert(in9 === 8L,
          s"key $k moved between surviving inner shards: $in8 -> $in9")
        movedInner += 1
      }
    }
    // expected 2000/9 ~ 222 across all super-shards
    assert(movedInner > 100 && movedInner < 400,
      s"moved $movedInner, expected ~222")
  }

  test("two-level HRW: inner weight families differ across " +
      "super-shards (the salt is live)") {
    // route the same key range under two FIXED outer values: if the
    // salt were dead, the assignments would coincide everywhere
    val base = (0 until 500).map(_.toLong).toDF("k")
    def under(sup: Int) = base
      .select(col("k"), lit(sup.toLong).as("sup"))
      .select(col("k"), Sharding.hrwShardWithin("k", "sup", 8).as("i"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val u0 = under(0)
    val u1 = under(1)
    val same = u0.keys.count(k => u0(k) == u1(k))
    // independent families agree ~1/8 of the time, never ~100%
    assert(same < 200, s"salted families agree on $same of 500 keys")
  }
}
