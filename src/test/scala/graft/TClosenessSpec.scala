package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TCloseness

/** The t-closeness contract (q279): the audit catches exactly the
  * class its two siblings cannot — a planted group that is LARGE
  * (k-safe), fully DIVERSE (all three bands present, l = 3 satisfied)
  * yet heavily SKEWED toward one band fails the distance bound, while
  * a same-shape balanced group passes. EMD values are asserted to the
  * exact integer (the whole point of the int64 prefix-sum form).
  */
class TClosenessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def rows(qi: String, counts: Seq[Int]): Seq[(String, Int)] =
    counts.zipWithIndex.flatMap { case (n, band) =>
      Seq.fill(n)((qi, band))
    }

  test("skewed-but-diverse group: passes l-diversity, FAILS " +
      "t-closeness; the balanced sibling passes — exact EMD values") {
    import spark.implicits._
    // corpus of 1000: 'bal' 270/360/270 (the corpus shape), 'skew'
    // 5/5/90 — all three bands present (l = 3 SATISFIED) but 90 % in
    // the top band vs 36 % corpus-wide
    val df = (rows("bal", Seq(270, 360, 270)) ++
      rows("skew", Seq(5, 5, 90))).toDF("qi", "band")
    val out = TCloseness.audit(df, Seq("qi" -> col("qi")), col("band"),
        nBands = 3, tBp = 1000L)
      .collect().map(r => r.getAs[String]("qi") -> r).toMap
    val skew = out("skew")
    assert(skew.getAs[Long]("n_rows") === 100L)
    assert(skew.getAs[Long]("l_distinct") === 3L,
      "the planted group must PASS l-diversity (that is the point)")
    // numer = |5·1000 − 275·100| + |10·1000 − 640·100| = 22500 + 54000
    // emd_bp = 76500·10⁴ div (2·100·1000) = 3825
    assert(skew.getAs[Long]("emd_bp") === 3825L)
    assert(!skew.getAs[Boolean]("t_ok"),
      "skewed-but-diverse must FAIL t-closeness")
    val bal = out("bal")
    // same numerator by two-group symmetry, scaled by G = 900 → 425
    assert(bal.getAs[Long]("emd_bp") === 425L)
    assert(bal.getAs[Boolean]("t_ok"))
  }

  test("a group matching the corpus distribution exactly has EMD 0") {
    import spark.implicits._
    val df = (rows("a", Seq(10, 20, 30)) ++ rows("b", Seq(20, 40, 60)))
      .toDF("qi", "band")
    val out = TCloseness.audit(df, Seq("qi" -> col("qi")), col("band"),
        nBands = 3, tBp = 0L)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("emd_bp") === 0L, r.toString)
      assert(r.getAs[Boolean]("t_ok"))
    }
  }
}
