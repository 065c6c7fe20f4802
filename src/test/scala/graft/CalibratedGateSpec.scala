package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Classifier, ModelStore}
import graft.streaming.ClassifierGate

/** The calibrated operating point (q303): the choice rule, the stored
  * artifact roundtrip, and the proof that the gate actually READS the
  * stored threshold — a different operating point changes admissions.
  */
class CalibratedGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def calib(rows: Seq[(Long, Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("threshold", "n_tp", "n_fp", "n_fn")
      .withColumn("precision_bp",
        when(col("n_tp") + col("n_fp") === 0, lit(null))
          .otherwise(expr("n_tp * 10000 div (n_tp + n_fp)")))
      .withColumn("recall_bp",
        expr("n_tp * 10000 div (n_tp + n_fn)"))
  }

  test("choice rule: max F1 subject to the precision floor, ties to " +
      "the smallest threshold") {
    // t=-1: p=50% (excluded by floor); t=0: F1=2*8/(16+0+2)=0.889;
    // t=1: F1=2*6/(12+0+4)=0.75 -> choose 0
    val c = calib(Seq((-1L, 10L, 10L, 0L), (0L, 8L, 0L, 2L),
      (1L, 6L, 0L, 4L)))
    assert(Classifier.chooseOperatingPoint(c, 9500L)._1 === 0L)
    // equal F1 at t=0 and t=1 -> the smaller threshold wins
    val tie = calib(Seq((0L, 8L, 0L, 2L), (1L, 8L, 0L, 2L)))
    assert(Classifier.chooseOperatingPoint(tie, 9500L)._1 === 0L)
    // nothing meets the floor -> loud failure, never a silent default
    intercept[IllegalArgumentException] {
      Classifier.chooseOperatingPoint(
        calib(Seq((0L, 1L, 1L, 0L))), 9500L)
    }
  }

  test("operating-point artifact roundtrips through the ModelStore") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_op_spec"
    ModelStore.saveOperatingPoint(spark, path, 2L, 9876L, 5432L)
    assert(ModelStore.loadOperatingPoint(spark, path) ===
      ((2L, 9876L, 5432L)))
  }

  test("the gate reads the threshold: a different stored operating " +
      "point changes admissions") {
    val s = spark
    import s.implicits._
    val votes = Seq(("good", 1L), ("spam", -1L)).toDF("token", "vote")
    val docs = Seq((1L, "good good"), (2L, "good"), (3L, "spam"))
      .toDF("doc_id", "text")
    def admitted(thr: Long) =
      ClassifierGate.batchVerdicts(docs, votes, thr)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(admitted(0L) === Map(1L -> true, 2L -> true, 3L -> false))
    assert(admitted(1L) === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("end-to-end q303: every verdict is score > the stored " +
      "threshold, and the threshold column is constant") {
    val rows = SparkEntry.queries("q303_calibrated_gate")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val thr = rows.head.getLong(2)
    rows.foreach { r =>
      assert(r.getLong(2) === thr)
      assert(r.getBoolean(3) === (r.getLong(1) > thr))
    }
  }
}
