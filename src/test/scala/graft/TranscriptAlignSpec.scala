package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Audio

/** Audio-transcript pair alignment (q317): the transcript generator
  * round-trips against the real codec's utterance segmentation, and
  * the off-by-one plant drops while every true pair keeps.
  */
class TranscriptAlignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transcript structure round-trips the codec's VAD exactly") {
    val n = 5200
    val us = Audio.utterances(7L,
      Audio.encodeWavSamples(Audio.burstTrain(7L, n), 16000), 256)
    assert(us.nonEmpty)
    // regenerate the transcript the fixture builds and re-parse it
    val text = us.map(u =>
      Seq.fill((u.len / 25 + 1).toInt)("tok").mkString(" "))
      .mkString("\n")
    val lines = text.split("\n").filter(_.nonEmpty)
    assert(lines.length === us.length)
    assert(lines.map(_.split(" ").count(_.nonEmpty).toLong).toSeq
      === us.map(_.len / 25 + 1))
  }

  test("sf0.001: every off-by-one pair drops, every true pair keeps") {
    val rows = SparkEntry.queries("q317_audio_transcript_align")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val swapped = r.getAs[Boolean]("swapped")
      val kept = r.getAs[Boolean]("kept")
      assert(kept === !swapped,
        s"doc ${r.getLong(0)}: swapped=$swapped kept=$kept")
      if (!swapped)
        assert(r.getAs[Long]("token_gap") === 0L &&
          r.getAs[Boolean]("count_match"))
    }
  }
}
