package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Percentiles

class PercentilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  // deterministic pseudo-random-ish values: uneven group sizes, ties,
  // negatives, non-quarter interpolation fractions
  private def df = {
    import spark.implicits._
    (1 to 97).map { i =>
      (s"g${i % 3}", ((i * 37) % 101 - 23).toDouble)
    }.toDF("g", "v")
  }

  test("matches Spark's percentile() aggregate across groups") {
    val ps = Seq(("p10", 0.10), ("p25", 0.25), ("p50", 0.50), ("p90", 0.90))
    val got = Percentiles.exact(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 4).map(r.getDouble).toVector).toMap
    val want = df.groupBy("g")
      .agg(expr("percentile(v, array(0.10d, 0.25d, 0.50d, 0.90d))").as("ps"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1).toVector).toMap
    assert(got.keySet === want.keySet)
    for (g <- got.keySet; i <- 0 until 4)
      // interpolation formula shapes differ between the two
      // implementations → compare to 1e-9, not bit-exact
      assert(math.abs(got(g)(i) - want(g)(i)) < 1e-9,
        s"group $g percentile ${i}: ${got(g)(i)} vs ${want(g)(i)}")
  }

  test("single-element group returns the element for every percentile") {
    import spark.implicits._
    val one = Seq(("a", 42.0)).toDF("g", "v")
    val r = Percentiles.exact(one, Seq("g"), "v",
      Seq(("p0", 0.0), ("p50", 0.5), ("p100", 1.0))).collect().head
    assert((1 to 3).map(r.getDouble).forall(_ === 42.0))
  }

  test("exactFewGroups equals the window form on every group and percentile") {
    val ps = Seq(("p10", 0.10), ("p25", 0.25), ("p50", 0.50), ("p90", 0.90))
    val a = Percentiles.exact(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 4).map(r.getDouble).toVector).toMap
    val b = Percentiles.exactFewGroups(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 4).map(r.getDouble).toVector).toMap
    assert(a === b) // bit-identical: same probe values, same formula
  }

  test("exactFewGroups is correct when one group dominates and spans many partitions") {
    // the scenario the few-groups form exists for: a skewed group far
    // larger than any single partition, whose rows the range exchange
    // splits across partitions — the partition-offset arithmetic must
    // stitch global ranks back together exactly
    import spark.implicits._
    val big = (1 to 5000).map(i => ("big", ((i * 7919) % 5003).toDouble))
    val small = (1 to 7).map(i => ("small", i.toDouble * 10))
    val skewed = (big ++ small).toDF("g", "v").repartition(16)
    val ps = Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75))
    val got = Percentiles.exactFewGroups(skewed, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 3).map(r.getDouble).toVector).toMap
    val want = skewed.groupBy("g")
      .agg(expr("percentile(v, array(0.25d, 0.5d, 0.75d))").as("ps"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Double](1).toVector).toMap
    for (g <- want.keySet; i <- 0 until 3)
      assert(math.abs(got(g)(i) - want(g)(i)) < 1e-9,
        s"group $g p$i: ${got(g)(i)} vs ${want(g)(i)}")
  }

  test("approx_percentile tracks the exact path within its accuracy bound") {
    // the at-scale alternative branch: approx_percentile's GK sketch
    // guarantees rank error ≤ n/accuracy. With accuracy=100 on ~32-row
    // groups the rank error bound is <1 rank ⇒ the approx answer must
    // be within one order-statistic step of the exact value. This pins
    // the relationship MEASURED, so a future swap to the approx path at
    // 100 TB has a spec'd contract, not a hope.
    val exact = Percentiles.exact(df, Seq("g"), "v", Seq(("p50", 0.5)))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = df.groupBy("g")
      .agg(expr("approx_percentile(v, 0.5d, 100)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // one rank step in this data is ≤ 4 (values stride by 37 mod 101)
    for (g <- exact.keySet)
      assert(math.abs(exact(g) - approx(g)) <= 4.0,
        s"group $g: exact ${exact(g)} vs approx ${approx(g)}")
  }

  test("p0 and p100 are group min and max") {
    val r = Percentiles.exact(df, Seq("g"), "v",
        Seq(("lo", 0.0), ("hi", 1.0)))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    val want = df.groupBy("g").agg(min("v"), max("v"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    assert(r === want)
  }

  test("exactFewGroupsLowerRank returns the element at floor((n-1)p)+1 " +
      "— an element of the data, never a blend") {
    import spark.implicits._
    val ps = Seq(("p10", 0.10), ("p50", 0.50), ("p90", 0.90))
    val got = Percentiles.exactFewGroupsLowerRank(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) ->
        (1 to 3).map(r.getDouble).toVector).toMap
    // reference: sort each group, index directly
    val want = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, rows) =>
        val sorted = rows.map(_._2).sorted.toVector
        g -> ps.map { case (_, p) =>
          sorted(math.floor((sorted.size - 1).toDouble * p).toInt)
        }.toVector
      }
    assert(got === want)
    // every returned statistic is an actual element
    val elems = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    got.foreach { case (g, vs) =>
      vs.foreach(v => assert(elems.contains((g, v)))) }
  }
}
