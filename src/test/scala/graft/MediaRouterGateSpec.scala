package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Audio, Multimodal, Video}
import graft.streaming.MediaRouterGate

/** The streaming mixed-media router gate (q293): routed-batch
  * arithmetic on planted payloads, the corruption plant's magic-flip
  * property per format, and the end-to-end alert pattern.
  */
class MediaRouterGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every format's first-magic-byte bit flip lands outside ALL magics") {
    val payloads = Seq(
      Multimodal.encodePpm(1L, 2, 2),
      Multimodal.encodeGradientPng(1L, 4, 3),
      Multimodal.encodeJpeg(1L, 8, 6),
      Audio.encodeWav(1L, 10, 8000),
      Video.encodeY4m(1L, 2, 2, 1, -1))
    payloads.foreach { p =>
      assert(Multimodal.sniffFormat(p) !== "unknown")
      val flipped = p.clone()
      flipped(0) = (flipped(0) ^ 0x01).toByte
      assert(Multimodal.sniffFormat(flipped) === "unknown",
        s"flip of ${Multimodal.sniffFormat(p)} still sniffs")
    }
  }

  test("batchRouted counts unknowns without decoding, alerts on share") {
    val s = spark
    import s.implicits._
    val wav = Audio.encodeWav(3L, 100, 8000)
    val bad = wav.clone(); bad(0) = (bad(0) ^ 0x01).toByte
    val batch = Seq(
      (1L, Multimodal.encodePpm(1L, 2, 3)), // 6 pixels
      (2L, wav),                            // 100 samples
      (3L, bad))                            // unroutable
      .toDF("doc_id", "payload")
    val rows = MediaRouterGate.batchRouted(batch, alertUnknownBp = 100L)
      .collect().map(r => r.getAs[String]("format") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_units"),
          r.getAs[Long]("unknown_bp"), r.getAs[Boolean]("unknown_alert"))))
      .toMap
    assert(rows("ppm") === ((1L, 6L, 3333L, true)))
    assert(rows("wav") === ((1L, 100L, 3333L, true)))
    assert(rows("unknown") === ((1L, 0L, 3333L, true)))
  }

  test("q293 end-to-end at sf0.001: clean batches route everything, " +
      "the planted container-rot batch alerts with attribution") {
    val rows = SparkEntry.queries("q293_stream_media_router")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("format"),
        r.getAs[Long]("n_docs"), r.getAs[Boolean]("unknown_alert")))
    val byBatch = rows.groupBy(_._1)
    assert(byBatch.keySet === Set(0L, 1L, 2L))
    // batches 0-1: all five formats, zero unknowns, no alert
    for (b <- Seq(0L, 1L)) {
      assert(!byBatch(b).exists(_._2 == "unknown"), s"unknown in batch $b")
      assert(byBatch(b).forall(!_._4), s"false alert in batch $b")
    }
    // batch 2: the rot batch — unknown rows present, every row alerts
    assert(byBatch(2L).exists(_._2 == "unknown"))
    assert(byBatch(2L).forall(_._4), "rot batch must alert")
  }
}
