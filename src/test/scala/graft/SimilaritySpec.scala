package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9999f, 0.001f, 0.0f)), // near-copy of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),      // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f))      // opposite
    ).toDF("vec_id", "embedding")
  }

  test("quantization is exact integer math") {
    val q = Similarity.prepare(vecs, "embedding")
      .filter(col("vec_id") === 0L).head()
    assert(q.getSeq[Long](q.fieldIndex("qv")) === Seq(10000L, 0L, 0L))
    assert(q.getAs[Long]("qn") === 100000000L)
  }

  test("brute-force top-k ranks the near-copy first, opposite last") {
    val p = Similarity.prepare(vecs, "embedding")
    val top = Similarity.bruteForceTopK(p, p.filter(col("vec_id") === 0L), "vec_id", 3)
      .collect().sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))
    assert(top.head._1 === 1L)
    assert(top.head._2 > 0.999)
    assert(top.last._1 === 3L)
    assert(top.last._2 === -1.0)
  }

  test("hyperplane bucket is deterministic and clusters near-dups") {
    val p = Similarity.prepare(vecs, "embedding")
      .withColumn("bucket", Similarity.hyperplaneBucket("qv", 4, 3))
    val buckets = p.select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(buckets(0L) === buckets(1L)) // near-identical vectors co-bucket
    assert(buckets.values.forall(b => b >= 0 && b < 16))
    // rerun must give identical buckets (md5-derived planes, no RNG)
    val again = Similarity.prepare(vecs, "embedding")
      .withColumn("bucket", Similarity.hyperplaneBucket("qv", 4, 3))
      .select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(again === buckets)
  }

  test("cosineNearDupPairs finds the near-copy above threshold") {
    val p = Similarity.prepare(vecs, "embedding")
    val pairs = Similarity.cosineNearDupPairs(p, "vec_id", 0.99, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
  }
}
