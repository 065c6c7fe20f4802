package graft.ops

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructField, StructType}

/** Persistent model artifacts for the ANN/clustering family — the
  * train-once / score-many surface production actually deploys:
  * k-means centroids ([[KMeans.fitCentroids]]) and PQ codebooks
  * ([[ProductQuant.trainCodebooks]]) written ONCE as parquet tables,
  * then loaded (a metadata-sized read: k·dims longs) and folded into
  * any later batch's scoring plan as literals. Without this surface
  * every scoring run re-trains — at 100 TB that is re-running Lloyd
  * passes over the corpus per query batch, which no production
  * pipeline does; with it, scoring cost is independent of training
  * cost and the model is a versionable, auditable table like any
  * other.
  *
  * Layout (one row per centroid, the vector as an array column):
  *  - centroids:  (cluster INT, centroid ARRAY<BIGINT>)
  *  - codebooks:  (subspace INT, code INT, centroid ARRAY<BIGINT>)
  *
  * Both tables are metadata-sized (k·dims / m·ksub·subDim longs), so
  * `load*` collecting them to the driver is the same class of action
  * as collecting a range partitioner's boundaries — NOT a data-sized
  * collect. Determinism end-to-end: training is exact integer
  * arithmetic, parquet stores the longs losslessly, so stored-model
  * scoring is bit-identical to inline-trained scoring (q129's oracle
  * proves it by re-deriving the model from the corpus in SQL).
  */
object ModelStore {

  private val centroidSchema = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("centroid", ArrayType(LongType, containsNull = false),
      nullable = false)))

  private val codebookSchema = StructType(Seq(
    StructField("subspace", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("centroid", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Write a fitted centroid set as a parquet model table. */
  def saveCentroids(spark: SparkSession, path: String,
      cs: Array[Array[Long]]): Unit = {
    require(cs.nonEmpty, "empty centroid set")
    val rows = cs.zipWithIndex.map { case (c, j) => Row(j, c.toSeq) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), centroidSchema)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a centroid model table back into the literal form every
    * scoring path ([[KMeans.assignTo]], [[ProductQuant.probeCells]])
    * folds into its plan. Metadata-sized collect (k·dims longs).
    */
  def loadCentroids(spark: SparkSession, path: String): Array[Array[Long]] = {
    val rows = spark.read.parquet(path)
      .select(col("cluster"), col("centroid"))
      .collect()
    require(rows.nonEmpty, s"no centroids at $path")
    val out = new Array[Array[Long]](rows.length)
    rows.foreach { r =>
      val j = r.getInt(0)
      require(j >= 0 && j < out.length,
        s"cluster id $j out of range for ${out.length} rows at $path")
      out(j) = r.getSeq[Long](1).toArray
    }
    require(!out.contains(null), s"non-contiguous cluster ids at $path")
    out
  }

  /** Write PQ sub-codebooks as a parquet model table. */
  def saveCodebooks(spark: SparkSession, path: String,
      cbs: Array[Array[Array[Long]]]): Unit = {
    require(cbs.nonEmpty && cbs.forall(_.nonEmpty), "empty codebooks")
    val rows = for {
      (cb, s) <- cbs.zipWithIndex
      (c, j) <- cb.zipWithIndex
    } yield Row(s, j, c.toSeq)
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), codebookSchema)
      .write.mode("overwrite").parquet(path)
  }

  /** Load PQ codebooks: `out(s)(j)` = centroid j of subspace s —
    * the exact shape [[ProductQuant.withCodes]]/[[ProductQuant.adcTopK]]
    * take. Metadata-sized collect (m·ksub·subDim longs).
    */
  def loadCodebooks(spark: SparkSession,
      path: String): Array[Array[Array[Long]]] = {
    val rows = spark.read.parquet(path)
      .select(col("subspace"), col("code"), col("centroid"))
      .collect()
    require(rows.nonEmpty, s"no codebooks at $path")
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val ksub = rows.iterator.map(_.getInt(1)).max + 1
    val out = Array.fill[Array[Long]](m, ksub)(null)
    rows.foreach { r =>
      out(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray
    }
    require(out.forall(cb => !cb.contains(null)),
      s"non-contiguous (subspace, code) grid at $path")
    out
  }

  private val opPointSchema = StructType(Seq(
    StructField("threshold", LongType, nullable = false),
    StructField("precision_bp", LongType, nullable = false),
    StructField("recall_bp", LongType, nullable = false)))

  private val lmPointSchema = StructType(Seq(
    StructField("vote_t", LongType, nullable = false),
    StructField("delta_qbits", LongType, nullable = false),
    StructField("max_df", LongType, nullable = false),
    StructField("precision_bp", LongType, nullable = false),
    StructField("recall_bp", LongType, nullable = false)))

  /** Write the LANDMARK operating point — the q314-tuned
    * (vote threshold, delta-quantization) pair plus the q321-tuned
    * boilerplate df cap, with the credentials they were chosen on —
    * the [[saveOperatingPoint]] discipline for the media dedup
    * family: q302/q306 admit at this stored artifact, never at a
    * hardcoded vote count, and every pairing-join df cap (video
    * keyframes, audio landmark/envelope, takedown blocklists) reads
    * `max_df` from here, never a bare constant.
    */
  def saveLandmarkPoint(spark: SparkSession, path: String,
      voteT: Long, deltaQbits: Long, maxDf: Long, precisionBp: Long,
      recallBp: Long): Unit = {
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(voteT, deltaQbits, maxDf, precisionBp, recallBp)), 1),
        lmPointSchema)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a landmark operating point:
    * (vote_t, delta_qbits, max_df, precision_bp, recall_bp).
    */
  def loadLandmarkPoint(spark: SparkSession,
      path: String): (Long, Long, Long, Long, Long) = {
    val rows = spark.read.parquet(path)
      .select(col("vote_t"), col("delta_qbits"), col("max_df"),
        col("precision_bp"), col("recall_bp"))
      .collect()
    require(rows.length == 1,
      s"expected exactly one landmark point at $path, got ${rows.length}")
    val (t, q, m) =
      (rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2))
    // a corrupt artifact must fail HERE, loudly — consumers narrow
    // delta_qbits with .toInt, which would silently wrap an absurd
    // value into a legal shift, a vote_t <= 0 silently admits every
    // single-shared-hash chance pair, and a max_df <= 0 silently
    // empties every pairing join (while an absurdly large one
    // reopens the skew magnet the cap exists for)
    require(t >= 1 && q >= 0 && q < 20,
      s"corrupt landmark point at $path: vote_t=$t delta_qbits=$q")
    require(m >= 1 && m <= (1L << 20),
      s"corrupt landmark point at $path: max_df=$m")
    (t, q, m, rows(0).getLong(3), rows(0).getLong(4))
  }

  /** Write a classifier OPERATING POINT — the calibration-chosen
    * threshold with the credentials it was chosen on — as a one-row
    * parquet artifact. A deployed gate (q303's `ClassifierGate`) must
    * read its cutoff from a versioned store exactly like the model
    * weights: a hardcoded `score > 0` is an uncalibrated default, and
    * re-deriving the sweep at admission time re-couples serving to the
    * held-out corpus.
    */
  def saveOperatingPoint(spark: SparkSession, path: String,
      threshold: Long, precisionBp: Long, recallBp: Long): Unit = {
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          Seq(Row(threshold, precisionBp, recallBp)), 1), opPointSchema)
      .write.mode("overwrite").parquet(path)
  }

  /** Load an operating point: (threshold, precision_bp, recall_bp). */
  def loadOperatingPoint(spark: SparkSession,
      path: String): (Long, Long, Long) = {
    val rows = spark.read.parquet(path)
      .select(col("threshold"), col("precision_bp"), col("recall_bp"))
      .collect()
    require(rows.length == 1,
      s"expected exactly one operating point at $path, got ${rows.length}")
    (rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2))
  }

  private val mergeSchema = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("s1", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("s2", org.apache.spark.sql.types.StringType,
      nullable = false)))

  /** Write a trained BPE merge chain ([[Bpe.train]]) as a parquet
    * model table — the tokenizer artifact a registry versions.
    */
  def saveMerges(spark: SparkSession, path: String,
      merges: Seq[Bpe.Merge]): Unit = {
    require(merges.nonEmpty, "empty merge chain")
    val rows = merges.map(m => Row(m.rank, m.s1, m.s2))
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), mergeSchema)
      .write.mode("overwrite").parquet(path)
  }

  private val profileSchema = StructType(Seq(
    StructField("lang", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("token", org.apache.spark.sql.types.StringType,
      nullable = false)))

  /** Write per-language token profiles (the q250 corpus-driven
    * discovery output, one row per (lang, token)) as a parquet model
    * table — the lang-ID artifact a registry versions (q278). */
  def saveTokenProfiles(spark: SparkSession, path: String,
      profiles: Seq[(String, String)]): Unit = {
    require(profiles.nonEmpty, "empty token profiles")
    val rows = profiles.map { case (l, t) => Row(l, t) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), profileSchema)
      .write.mode("overwrite").parquet(path)
  }

  /** Load token profiles back into the (lang → tokens) literal form
    * the scoring path folds into its plan, languages and tokens both
    * sorted for a deterministic argmax order. Metadata-sized collect
    * (a stopword list per language — high-df tokens are few by Zipf).
    */
  def loadTokenProfiles(spark: SparkSession,
      path: String): Seq[(String, Seq[String])] = {
    val rows = spark.read.parquet(path)
      .select(col("lang"), col("token"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    require(rows.nonEmpty, s"no token profiles at $path")
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (l, ts) => (l, ts.map(_._2).toSeq.sorted) }
  }

  /** Load a merge chain back, ordered by rank (metadata-sized: one
    * row per merge). Ranks must be the contiguous 1..k the trainer
    * emits — application order is the chain's whole meaning.
    */
  def loadMerges(spark: SparkSession, path: String): Seq[Bpe.Merge] = {
    val out = spark.read.parquet(path)
      .select(col("rank"), col("s1"), col("s2"))
      .collect()
      .map(r => Bpe.Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq
    require(out.nonEmpty, s"no merges at $path")
    require(out.map(_.rank) == (1 to out.size),
      s"non-contiguous merge ranks at $path")
    out
  }
}
