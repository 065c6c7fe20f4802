package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Drift

/** [[Drift.vocabDrift]]: identical slices report nothing, a planted
  * shift surfaces in the right buckets, the ppm accounting sums to
  * ~10⁶ per side, and the TV distance derives from the rows.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val buckets = 64

  private def df(rows: Seq[String]) = rows.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("identical slices drift nowhere (empty report)") {
    val a = df(Seq("alpha beta gamma", "delta alpha beta"))
    assert(Drift.vocabDrift(a, a, "text", buckets).count() === 0L)
  }

  test("a planted one-token shift surfaces and the TV distance " +
      "derives from the rows") {
    // identical 9-token base; slice b swaps one alpha for zzz
    val a = df(Seq("alpha alpha alpha beta gamma delta eps zeta eta"))
    val b = df(Seq("alpha alpha zzz beta gamma delta eps zeta eta"))
    val rows = Drift.vocabDrift(a, b, "text", buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // exactly the alpha bucket (down 1/9) and the zzz bucket (up 1/9)
    // drift, unless the two tokens collide into one bucket
    assert(rows.length === 2 || rows.length === 1)
    val third = 1000000L / 9
    rows.foreach { case (_, ppmA, ppmB, d) =>
      assert(d === math.abs(ppmA - ppmB))
      assert(math.abs(d - third) <= 1,
        s"drift $d differs from one ninth $third")
    }
    // TV = sum(d_ppm) / 2e6 = ~1/9
    val tv = rows.map(_._4).sum / 2.0 / 1e6
    assert(math.abs(tv - 1.0 / 9) < 1e-3)
  }

  test("ppm columns are truncating integer normalizations " +
      "(each side sums to <= 1e6, within bucket-count slack)") {
    val a = df(Seq("a b c d e f g h i j k l m n o p"))
    val b = df(Seq("a a b b c c d d e e f f g g h h"))
    val rows = Drift.vocabDrift(a, b, "text", buckets).collect()
    val sa = rows.map(_.getLong(1)).sum
    val sb = rows.map(_.getLong(2)).sum
    // drifted buckets only, so sums are bounded by the full budget
    assert(sa <= 1000000L && sb <= 1000000L)
    assert(rows.forall(_.getLong(3) > 0))
  }
}
