package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FreqSketch

class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def items = {
    import spark.implicits._
    (Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
      Seq.fill(50)("gamma") ++ (1 to 40).map(i => s"tail$i"))
      .toDF("item")
  }

  test("top-k is exact with deterministic tie order") {
    val got = FreqSketch.heavyHitters(items, "item", 4, 0.01, 0.99, 3)
      .collect()
    assert(got.length === 4)
    // counts 100, 50, 50, 1... — the 50-tie breaks item-ascending
    assert(got.map(_.getString(1)).take(3) ===
      Array("alpha", "beta", "gamma"))
    assert(got.map(_.getLong(2)).take(3) === Array(100L, 50L, 50L))
    assert(got.map(_.getLong(0)) === Array(1L, 2L, 3L, 4L))
  }

  test("CMS never undercounts ANY item (agg-build / driver-readback " +
      "hash consistency)") {
    // k = full vocabulary: if the distributed builder and the driver
    // readback hashed strings differently, estimates would read from
    // wrong counters and undercount — this pins the round-trip.
    val got = FreqSketch.heavyHitters(items, "item", 43, 0.01, 0.99, 3)
      .collect()
    assert(got.length === 43)
    got.foreach { r =>
      assert(r.getBoolean(4),
        s"CMS undercounted ${r.getString(1)}: est ${r.getLong(3)} < " +
          s"exact ${r.getLong(2)}")
    }
  }

  test("estimates are independent of partitioning (merge is " +
      "commutative integer addition)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      FreqSketch.heavyHitters(df, "item", 43, 0.01, 0.99, 3)
        .collect().map(r => (r.getString(1), r.getLong(3))).toMap
    assert(run(items.repartition(13)) === run(items.coalesce(1)))
  }

  test("null items are excluded from the top-k AND from the eps total") {
    import spark.implicits._
    val withNulls = (Seq.fill(200)(None: Option[String]) ++
      Seq.fill(10)(Some("x")) ++ Seq.fill(5)(Some("y")))
      .toDF("item")
    val got = FreqSketch.heavyHitters(withNulls, "item", 5, 0.05, 0.99, 3)
      .collect()
    // nulls outnumber every real item but must not rank (nor NPE on
    // the driver-side sketch probe)
    assert(got.length === 2)
    assert(got.map(_.getString(1)).toSeq === Seq("x", "y"))
    // slack from the non-null N=15: ceil(0.05*15)=1 — with nulls
    // counted it would be 11 and within_eps would be trivially true
    got.foreach(r => assert(r.getBoolean(4) && r.getBoolean(5)))
  }

  test("within_eps holds on a skewed corpus at the configured eps") {
    val got = FreqSketch.heavyHitters(items, "item", 10, 0.01, 0.99, 3)
      .collect()
    got.foreach(r => assert(r.getBoolean(5),
      s"eps bound violated for ${r.getString(1)}"))
  }
}
