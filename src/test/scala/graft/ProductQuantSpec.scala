package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ProductQuant, Similarity}

class ProductQuantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic synthetic embeddings: 16 dims, values in
    * [-0.9, 0.9] from pure integer congruences (no RNG state).
    */
  private def vecs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong,
        (0 until 16).map(d => ((i * 31 + d * 7) % 19 - 9) / 10.0f).toArray)
    }.toDF("vec_id", "embedding")
  }

  private def prep(n: Int) =
    Similarity.prepare(vecs(n), "embedding").filter(col("qn") > 0)

  test("codes are m indices each in [0, ksub)") {
    val p = prep(40)
    val cbs = ProductQuant.trainCodebooks(p, "vec_id", 4, 4, 1)
    val codes = ProductQuant.withCodes(p, cbs)
      .select("codes").collect().map(_.getSeq[Long](0))
    assert(codes.forall(_.length === 4))
    assert(codes.forall(_.forall(c => c >= 0 && c < 4)))
  }

  test("one centroid per vector (k = n, iters = 0) makes ADC exact — " +
      "the quantization-error-zero identity") {
    val p = prep(8).localCheckpoint()
    // seeding takes the 8 lowest-id subvectors as centroids: every
    // vector then encodes to a zero-distance code, so the ADC distance
    // IS the exact L2² and the two top-k frames must be identical
    val cbs = ProductQuant.trainCodebooks(p, "vec_id", 4, 8, 0)
    val coded = ProductQuant.withCodes(p, cbs)
    val adc = ProductQuant.adcTopK(coded, p, "vec_id", cbs, 3)
      .select("query_id", "rank", "neighbor_id", "approx_d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val exact = ProductQuant.exactL2TopK(p, p, "vec_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(adc === exact)
  }

  test("training, encoding, and ADC are partitioning-independent") {
    val p = prep(40)
    def run(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
      val pinned = df.localCheckpoint()
      val cbs = ProductQuant.trainCodebooks(pinned, "vec_id", 4, 4, 2)
      val coded = ProductQuant.withCodes(pinned, cbs)
      ProductQuant.adcTopK(coded, pinned.filter(col("vec_id") < 5),
          "vec_id", cbs, 3)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    }
    assert(run(p.repartition(7)) === run(p.coalesce(1)))
  }

  test("probing every cell makes IVF+PQ identical to plain PQ ADC") {
    val p = prep(40).localCheckpoint()
    val coarse = graft.ops.KMeans.fitCentroids(p, "vec_id", 4, 1)
    val cbs = ProductQuant.trainCodebooks(p, "vec_id", 4, 4, 1)
    val coded = ProductQuant.withCodes(
      graft.ops.KMeans.assignTo(p, "vec_id", coarse)
        .withColumnRenamed("cluster", "cell"), cbs)
    val q = p.filter(col("vec_id") < 6)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nprobe = all cells → the cell restriction admits everything, so
    // the composition must reduce to the unrestricted ADC ranking
    val all = rows(ProductQuant.ivfAdcTopK(coded, q, "vec_id", cbs,
      coarse, 4, 3))
    val plain = rows(ProductQuant.adcTopK(coded, q, "vec_id", cbs, 3))
    assert(all === plain)
    // nprobe=1: every returned neighbor must live in the query's ONE
    // probed cell — the restriction provably restricting (a broken
    // probe join degenerating to all cells fails here)
    val probed = ProductQuant.probeCells(q, "vec_id", coarse, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellOf = coded.select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = ProductQuant.ivfAdcTopK(coded, q, "vec_id", cbs,
        coarse, 1, 3)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(one.nonEmpty)
    one.foreach { case (qid, nid) =>
      assert(probed.contains((qid, cellOf(nid))),
        s"neighbor $nid (cell ${cellOf(nid)}) outside query $qid's probe")
    }
  }

  test("encoding is scan-local: no join, no shuffle in the coded plan") {
    val p = prep(40).localCheckpoint()
    val cbs = ProductQuant.trainCodebooks(p, "vec_id", 4, 4, 1)
    val coded = ProductQuant.withCodes(p, cbs)
    coded.count()
    val plan = coded.queryExecution.executedPlan
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(bad.isEmpty,
      "PQ encoding must fold codebooks as literals — no join/exchange")
  }

  test("m must divide the vector width") {
    intercept[IllegalArgumentException] {
      ProductQuant.trainCodebooks(prep(20), "vec_id", 5, 2, 1)
    }
  }
}
