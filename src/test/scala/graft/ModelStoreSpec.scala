package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{KMeans, ModelStore, ProductQuant, Similarity}

/** Persistent model artifacts ([[graft.ops.ModelStore]]): the parquet
  * roundtrip must be lossless (exact longs in, exact longs out, shape
  * preserved), and scoring against a LOADED model must be bit-identical
  * to scoring against the in-memory model it was saved from — the
  * train-once / score-many contract q113/q115/q129 deploy.
  */
class ModelStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scratch(name: String): String =
    Scratch.register(
      Files.createTempDirectory(s"graft_modelstore_$name").toString)

  private def vecs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong,
        (0 until 16).map(d => ((i * 31 + d * 7) % 19 - 9) / 10.0f).toArray)
    }.toDF("vec_id", "embedding")
  }

  private def prep(n: Int) =
    Similarity.prepare(vecs(n), "embedding").filter(col("qn") > 0)

  test("centroid roundtrip is lossless, order-independent") {
    val p = prep(30).localCheckpoint()
    val cs = KMeans.fitCentroids(p, "vec_id", 5, 2)
    val path = s"${scratch("cent")}/centroids"
    ModelStore.saveCentroids(spark, path, cs)
    val back = ModelStore.loadCentroids(spark, path)
    assert(back.length === cs.length)
    assert(back.zip(cs).forall { case (a, b) => a.sameElements(b) })
  }

  test("codebook roundtrip is lossless across the (subspace, code) grid") {
    val p = prep(30).localCheckpoint()
    val cbs = ProductQuant.trainCodebooks(p, "vec_id", 4, 4, 2)
    val path = s"${scratch("cb")}/codebooks"
    ModelStore.saveCodebooks(spark, path, cbs)
    val back = ModelStore.loadCodebooks(spark, path)
    assert(back.length === cbs.length)
    assert(back.zip(cbs).forall { case (sa, sb) =>
      sa.length == sb.length &&
        sa.zip(sb).forall { case (a, b) => a.sameElements(b) }
    })
  }

  test("stored-model scoring is bit-identical to inline-trained scoring") {
    val p = prep(40).localCheckpoint()
    val coarse = KMeans.fitCentroids(p, "vec_id", 4, 2)
    val cbs = ProductQuant.trainCodebooks(p, "vec_id", 4, 4, 2)
    val root = scratch("score")
    ModelStore.saveCentroids(spark, s"$root/coarse", coarse)
    ModelStore.saveCodebooks(spark, s"$root/cbs", cbs)
    val lc = ModelStore.loadCentroids(spark, s"$root/coarse")
    val lcb = ModelStore.loadCodebooks(spark, s"$root/cbs")

    def score(co: Array[Array[Long]], cb: Array[Array[Array[Long]]]) = {
      val coded = ProductQuant.withCodes(
        KMeans.assignTo(p, "vec_id", co)
          .withColumnRenamed("cluster", "cell"), cb)
      ProductQuant.ivfAdcTopK(coded, p.filter(col("vec_id") < 5),
          "vec_id", cb, co, 2, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    }
    assert(score(lc, lcb) === score(coarse, cbs))
  }

  test("load rejects a non-contiguous model table") {
    import spark.implicits._
    val path = s"${scratch("bad")}/centroids"
    // cluster ids 0 and 2 — id 1 missing: a corrupt/partial model
    Seq((0, Seq(1L, 2L)), (2, Seq(3L, 4L)))
      .toDF("cluster", "centroid")
      .write.mode("overwrite").parquet(path)
    assertThrows[IllegalArgumentException] {
      ModelStore.loadCentroids(spark, path)
    }
  }
}
