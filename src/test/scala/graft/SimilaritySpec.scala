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

  test("multi-probe over the full bucket space equals brute force") {
    // planes=1 → 2 buckets; probing own + the one flip covers the whole
    // space, so the approximate path must reproduce the exact top-k
    val p = Similarity.prepare(vecs, "embedding")
    val mp = Similarity.lshTopKMultiProbe(p, "vec_id", 3, 1, 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val exact = Similarity.bruteForceTopK(p, p, "vec_id", 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(mp === exact)
  }

  test("autoPlanes grows with corpus size, bounded") {
    assert(Similarity.autoPlanes(100, 1024) === 1)  // tiny corpus: 2 buckets
    assert(Similarity.autoPlanes(8192, 64) === 7)   // 128 buckets
    assert(Similarity.autoPlanes(1L << 40, 1024) === 20) // clamp
    // monotone in n, antitone in target
    assert(Similarity.autoPlanes(1 << 20, 64) > Similarity.autoPlanes(1 << 14, 64))
    assert(Similarity.autoPlanes(1 << 20, 64) > Similarity.autoPlanes(1 << 20, 4096))
  }

  // deterministic pseudo-random corpus: dim values derived from md5 of
  // (id, dim), signed — the same trick the plane weights use
  private def corpus(n: Int, dims: Int) = {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { id =>
      id.toLong -> Array.tabulate(dims) { d =>
        (md.digest(s"v$id,$d".getBytes("UTF-8"))(0).toInt / 128.0f)
      }
    }.toDF("vec_id", "embedding")
  }

  test("auto-sized buckets keep bucket sizes near target at two corpus sizes") {
    for ((n, target) <- Seq((512, 64), (4096, 64))) {
      val p = Similarity.prepare(corpus(n, 16), "embedding")
      val planes = Similarity.autoPlanes(n, target)
      val sizes = p.withColumn("bucket",
          Similarity.hyperplaneBucket("qv", planes, 16))
        .groupBy("bucket").count().collect().map(_.getLong(1))
      val mean = sizes.sum.toDouble / (1 << planes) // over ALL 2^planes buckets
      assert(mean <= target,
        s"n=$n: expected mean ≤ $target, got $mean over ${sizes.length} buckets")
      // random hyperplanes over a spread-out corpus must actually split
      // it: no bucket hoards the corpus (8× target is far below n)
      assert(sizes.max <= 8L * target,
        s"n=$n: max bucket ${sizes.max} exceeds 8×target")
      // pair work stays ~linear: Σ s² ≈ n·target, not n²
      val pairWork = sizes.map(s => s * s).sum
      assert(pairWork <= 16L * n * target,
        s"n=$n: in-bucket pair work $pairWork vs bound ${16L * n * target}")
    }
  }

  test("int8 quantization: element error bounded by half a step, cosine near 1") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.9f, -0.45f, 0.225f, 0.0f)),
      (2L, Array(0.001f, 0.001f, 0.001f, 0.001f)), // tiny but non-zero
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))          // zero: excluded
    ).toDF("vec_id", "embedding")
    val rows = Similarity.int8QuantStats(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(!rows.contains(3L)) // no direction to preserve
    rows.foreach { case (id, (amax, cos, maxErr)) =>
      // round-to-nearest: reconstruction error ≤ half the quantization
      // step amax/127 (in the engine's 1e4-quantized units)
      assert(maxErr <= amax.toDouble / 254.0 + 1e-9,
        s"vec $id: max_err $maxErr > step/2 ${amax / 254.0}")
      assert(cos > 0.999, s"vec $id: cos_sim $cos")
    }
    // identical relative profile ⇒ identical codes: vec 2 quantizes to
    // all-127 exactly, so reconstruction is exact up to the step grid
    assert(rows(2L)._2 === 1.0)
  }

  test("q275 one-sided risk: the stored-IVF semantic screen can only " +
      "UNDER-flag — its top-1 sim is a subset max of the exact top-1, " +
      "so every IVF flag is also an exact flag") {
    val r = SparkEntry.queries("q275_semantic_contam_ivf")(
      spark, "/root/testdata/sf0.001").collect().head
    val nEval = r.getAs[Long]("n_eval")
    val nExact = r.getAs[Long]("n_flagged_exact")
    val nIvf = r.getAs[Long]("n_flagged_ivf")
    val nHits = r.getAs[Long]("n_flag_hits")
    assert(nEval > 0)
    // subset-max: an IVF-flagged item is necessarily exact-flagged
    assert(nHits === nIvf,
      s"IVF flagged $nIvf but only $nHits coincide with exact flags — " +
        "the probed screen must never flag what exact search does not")
    assert(nIvf <= nExact)
    val recall = r.getAs[Double]("flag_recall")
    assert(recall >= 0.0 && recall <= 1.0)
  }

  test("pair alignment: an aligned pair scores 1, a swapped caption " +
      "from an orthogonal doc drops below any sane threshold") {
    val p = Similarity.prepare(vecs, "embedding")
      .select(col("vec_id"), col("qv"), col("qn"))
    // pair 0 aligned (caption = own embedding); pair 2's caption
    // embedding swapped to doc 3's (orthogonal-to-2's image)
    val img = p.select(col("vec_id").as("pair_id"),
        col("qv").as("qa"), col("qn").as("na"))
      .withColumn("cap_src",
        when(col("pair_id") === 2L, 3L).otherwise(col("pair_id")))
    val cap = p.select(col("vec_id").as("cap_src"),
      col("qv").as("qb"), col("qn").as("nb"))
    val got = img.join(cap, "cap_src")
      .withColumn("alignment", Similarity.cosine(col("qa"), col("qb"),
        col("na"), col("nb")))
      .collect().map(r => r.getAs[Long]("pair_id")
        -> r.getAs[Double]("alignment")).toMap
    assert(got(0L) >= 0.999999)
    assert(math.abs(got(2L)) < 0.01) // orthogonal caption: no alignment
  }
}
