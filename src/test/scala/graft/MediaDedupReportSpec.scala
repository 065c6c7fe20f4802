package graft

import org.scalatest.funsuite.AnyFunSuite

/** Media dedup impact report (q313): one row per modality, internally
  * consistent with the gated cluster queries it rolls up.
  */
class MediaDedupReportSpec extends AnyFunSuite {

  test("the report aggregates exactly the three cluster queries") {
    val s = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q313_media_dedup_report")(s, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(rows.keySet === Set("audio", "raster", "video"))
    for ((mod, q) <- Seq("audio" -> "q294_audio_clusters",
        "raster" -> "q280_raster_clusters",
        "video" -> "q300_video_clusters")) {
      val cl = SparkEntry.queries(q)(s, dir).collect()
        .map(_.getAs[Long]("n_docs"))
      val (items, clusters, dups, rate, mx) = rows(mod)
      assert(items === cl.sum, s"$mod items")
      assert(clusters === cl.length.toLong, s"$mod clusters")
      assert(dups === cl.sum - cl.length, s"$mod dups")
      assert(rate === (cl.sum - cl.length) * 10000 / cl.sum, s"$mod rate")
      assert(mx === cl.max, s"$mod max")
    }
  }
}
