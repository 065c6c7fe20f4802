package graft

import org.scalatest.funsuite.AnyFunSuite

/** Takedown compliance report (q320): one row per screen axis,
  * internally consistent with the gated takedown screens it rolls up.
  */
class TakedownReportSpec extends AnyFunSuite {

  test("the report aggregates exactly the three takedown screens") {
    val s = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q320_takedown_report")(s, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(rows.keySet ===
      Set("audio_envelope", "audio_landmark", "video_keyframes"))
    val nArr = s.read.parquet(s"$dir/documents.parquet").count()
    val nReq = (0L until nArr).map(_ / 3).distinct.count(_ % 9 == 0)
    for ((axis, q, reqIdx) <- Seq(
        ("audio_envelope", "q315_audio_takedown", 1),
        ("audio_landmark", "q319_landmark_takedown", 1),
        ("video_keyframes", "q316_video_takedown", 1))) {
      val m = SparkEntry.queries(q)(s, dir).collect()
      val (req, arr, blocked, hits, rate) = rows(axis)
      assert(req === nReq.toLong, s"$axis requests")
      assert(arr === nArr, s"$axis arrivals")
      assert(blocked === m.map(_.getLong(0)).distinct.length.toLong,
        s"$axis blocked")
      assert(hits === m.map(_.getLong(reqIdx)).distinct.length.toLong,
        s"$axis hits")
      assert(rate === blocked * 10000 / nArr, s"$axis rate")
    }
  }
}
