package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q221 exact-integer Pearson expression must COMPUTE inside the
  * documented 2⁶² sufficient-statistic headroom and RAISE beyond it
  * (the PosBits/pairEnc house pattern: scale bounds enforced at
  * runtime, not by scaladoc) — driven with synthetic statistics, since
  * the corpus fixture never trips the guard.
  */
class CorrGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def corr(n: Long, sumX: Long, sumY: Long, sxy: Long,
      sxx: Long, syy: Long): Double = {
    import spark.implicits._
    Seq((n, sumX, sumY, sxy, sxx, syy))
      .toDF("n", "sum_x", "sum_y", "sxy", "sxx", "syy")
      .withColumn("corr", expr(TrainQueriesCuration.guardedCorrExpr))
      .collect().head.getAs[Double]("corr")
  }

  test("in-bounds statistics compute the exact Pearson value") {
    // x = (0, 2, 4), y = (1, 3, 5): perfectly correlated
    assert(corr(3L, 6L, 9L, 26L, 20L, 35L) === 1.0)
    // x = (0, 1), y = (1, 0): perfectly anti-correlated
    assert(corr(2L, 1L, 1L, 0L, 1L, 1L) === -1.0)
  }

  test("a statistic product past 2^62 raises instead of wrapping") {
    // n * sxx = 4 * 2^61 = 2^63: the bigint form would wrap negative
    val e = intercept[Exception] {
      corr(4L, 1L, 1L, 1L, 1L << 61, 1L)
    }
    assert(e.getMessage.contains("2^62 bigint headroom"))
    // sum_x * sum_x past the bound trips the abs-guarded check too
    val e2 = intercept[Exception] {
      corr(4L, -(1L << 32), 1L, 1L, 1L, 1L)
    }
    assert(e2.getMessage.contains("2^62 bigint headroom"))
  }
}
