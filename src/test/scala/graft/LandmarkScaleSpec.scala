package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.AudioNearDup

/** Scale discipline of the BATCH audio pairing joins
  * ([[AudioNearDup]], consumed by q302 and q306): plants the two
  * skew magnets the df cap exists for — a metronome beat hash shared
  * by hundreds of unrelated clips on the landmark axis, silent audio
  * quantizing to one degenerate band value on the envelope axis — and
  * measures the candidate volume collapsing to the genuine twins
  * only, the `VideoScaleSpec` pattern on the audio axis.
  */
class LandmarkScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a metronome hash shared by 300 unrelated clips costs ZERO " +
      "pairs under the cap; a genuine twin pair still out-votes") {
    import spark.implicits._
    // 300 unrelated clips: the shared beat hash (-1) + 9 unique
    // hashes each; one twin pair (1000, 1001) sharing 6 hashes that
    // does NOT carry the beat
    val rows = (0L until 300L).flatMap(id => (0 to 9).map(k =>
        if (k == 0) (id, -1L) else (id, id * 100 + k))) ++
      (0 to 5).flatMap(k =>
        Seq((1000L, 10000000L + k), (1001L, 10000000L + k)))
    val hashes = rows.toDF("doc_id", "h")
    val capped = AudioNearDup.pairVotes(hashes, 64).collect()
    assert(capped.length === 1,
      "the beat hash must contribute zero candidate pairs")
    assert(capped.head.getLong(0) === 1000L &&
      capped.head.getLong(1) === 1001L &&
      capped.head.getLong(2) === 6L)
    // the uncapped rule pays the quadratic beat bill: C(300,2) chance
    // pairs at vote 1 before the vote filter can run
    assert(AudioNearDup.pairVotes(hashes, 1000000).count()
      === 300L * 299L / 2 + 1)
    // and the edge rule at the production vote threshold keeps
    // exactly the twins
    val edges = AudioNearDup.voteEdges(hashes, 6L, 64).collect()
    assert(edges.length === 1 && edges.head.getLong(0) === 1000L)
  }

  test("silent audio's degenerate band value costs ZERO candidates " +
      "under the cap; a twin pair with one distinctive band survives " +
      "by pigeonhole") {
    import spark.implicits._
    // 300 silent clips: fp = 0, so all five band keys are the
    // degenerate (0, b) buckets; one twin pair whose fp differs from
    // silence in band 1 only — its four other bands land in the hot
    // buckets and are dropped, band 1 alone must carry the match
    val twinFp = 7L << 12
    val fps = (0L until 300L).map(id => (id, 0L)) ++
      Seq((1000L, twinFp), (1001L, twinFp))
    val bands = fps.toDF("doc_id", "fp")
      .select(col("doc_id"), col("fp"),
        explode(expr("transform(sequence(0, 4), " +
          "b -> (shiftright(fp, b * 12) & 4095) * 5 + b)")).as("bk"))
    val capped = AudioNearDup.bandCandidates(bands, 64).collect()
    assert(capped.length === 1,
      "only the twins' distinctive band may pair")
    assert(capped.head.getAs[Long]("id_a") === 1000L &&
      capped.head.getAs[Long]("id_b") === 1001L)
    // uncapped, the degenerate buckets pay ~4 x C(302,2) + C(300,2)
    assert(AudioNearDup.bandCandidates(bands, 1000000).count()
      > 200000L)
  }
}
