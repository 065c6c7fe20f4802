package graft

import org.scalatest.funsuite.AnyFunSuite

/** Corpus dedup impact report (q318): one row per modality including
  * the text axis, internally consistent with the gated cluster
  * queries it rolls up.
  */
class CorpusDedupReportSpec extends AnyFunSuite {

  test("the report aggregates exactly the four cluster chains") {
    val s = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q318_corpus_dedup_report")(s, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(rows.keySet === Set("audio", "raster", "text", "video"))
    def check(mod: String, sizes: Seq[Long]): Unit = {
      val (items, clusters, dups, rate, mx) = rows(mod)
      assert(items === sizes.sum, s"$mod items")
      assert(clusters === sizes.length.toLong, s"$mod clusters")
      assert(dups === sizes.sum - sizes.length, s"$mod dups")
      assert(rate === (sizes.sum - sizes.length) * 10000 / sizes.sum,
        s"$mod rate")
      assert(mx === sizes.max, s"$mod max")
    }
    for ((mod, q) <- Seq("audio" -> "q294_audio_clusters",
        "raster" -> "q280_raster_clusters",
        "video" -> "q300_video_clusters"))
      check(mod, SparkEntry.queries(q)(s, dir).collect()
        .map(_.getAs[Long]("n_docs")).toSeq)
    // text leg: q71's closure totalized over every document —
    // clustered docs from the gated q71 output, the rest singletons
    val q71 = SparkEntry.queries("q71_dedup_clusters")(s, dir)
      .collect()
    val total = s.read.parquet(s"$dir/documents.parquet").count()
    val clustered = q71.map(_.getAs[Long]("doc_id")).distinct.length
    val clusterSizes = q71.groupBy(_.getAs[Long]("cluster_rep"))
      .map(_._2.length.toLong).toSeq
    val sizes = clusterSizes ++
      Seq.fill((total - clustered).toInt)(1L)
    check("text", sizes)
  }
}
