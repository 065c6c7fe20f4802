package graft

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftGate

/** The streaming drift gate's arithmetic (q282): the exact-integer TV
  * endpoints (0 for an identical distribution, 10⁶ for a disjoint
  * one) on planted inputs, and the end-to-end separation — planted
  * bad-crawl batch alerts, clean batches sit at the sampling-noise
  * floor.
  */
class DriftGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def bucketOf(token: String, buckets: Int): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  test("TV endpoints are exact: identical distribution drifts 0, " +
      "disjoint distribution drifts the full 10^6 ppm") {
    import spark.implicits._
    val batch = Seq((1L, "alpha alpha alpha")).toDF("doc_id", "text")
    val b = bucketOf("alpha", 256)
    val same = Seq((b, 1000000L)).toDF("bucket", "ppm")
    val r0 = DriftGate.batchDrift(batch, same, 256, alertPpm = 1L)
      .collect().head
    assert(r0.getAs[Long]("drift_ppm") === 0L)
    assert(r0.getAs[Long]("n_tokens") === 3L)
    assert(!r0.getAs[Boolean]("drift_alert"))
    val disjoint = Seq(((b + 1) % 256, 1000000L)).toDF("bucket", "ppm")
    val r1 = DriftGate.batchDrift(batch, disjoint, 256, alertPpm = 150000L)
      .collect().head
    assert(r1.getAs[Long]("drift_ppm") === 1000000L)
    assert(r1.getAs[Long]("drifted_buckets") === 2L)
    assert(r1.getAs[Boolean]("drift_alert"))
  }

  test("q282 end-to-end at sf0.001: clean batches below the alert, " +
      "the planted bad-crawl batch above it — the gate separates") {
    val rows = SparkEntry.queries("q282_stream_drift_gate")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("drift_ppm"),
        r.getAs[Boolean]("drift_alert"))).sortBy(_._1)
    assert(rows.map(_._1) === Seq(0L, 1L, 2L))
    assert(rows.map(_._3) === Seq(false, false, true),
      s"alert pattern wrong: $rows")
    // the separation is wide, not marginal: the corrupted batch sits
    // several times above the clean batches' noise floor
    val clean = rows.init.map(_._2).max
    val bad = rows.last._2
    assert(bad > 4 * clean, s"weak separation: clean max $clean, bad $bad")
  }
}
