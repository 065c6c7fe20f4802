package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Small-file compaction — the operational answer to the classic
  * degradation of long-lived 100 TB tables: streaming sinks,
  * per-batch upserts, and over-parallel writers leave directories of
  * KB-scale files, and every later scan then pays per-file open /
  * footer-parse / scheduling cost (plus object-store LIST latency)
  * that can dwarf the actual read. Compaction rewrites a directory's
  * data into ~`targetBytes` files.
  *
  * Scale shape: sizing is pure METADATA (one driver-side listing —
  * the same cost any scan's file index pays); the rewrite is a
  * `coalesce`, a NARROW dependency — each output task concatenates
  * whole input partitions with NO exchange, so compacting N TB moves
  * N TB through tasks exactly once and shuffles nothing. The
  * tradeoff, stated: coalesce cannot split a partition, so heavily
  * skewed inputs can leave uneven outputs — `shuffle = true` opts
  * into a repartition (full exchange) for when even file sizes matter
  * more than the shuffle. Safety: the rewrite is verified
  * row-count-preserving before the stats report, and goes to a NEW
  * directory — swapping it over the source is the caller's
  * (atomic-rename-aware) decision, not this op's.
  */
object Compaction {

  /** Rewrite `inDir` (parquet) into `outDir` targeting `targetBytes`
    * per output file (sized from the INPUT bytes — post-compression
    * output runs smaller; the target is an upper-bound shape, not a
    * promise). Returns one stats row: (files_before, files_after,
    * bytes_before, bytes_after, n_rows).
    *
    * @throws IllegalStateException if the rewrite loses or duplicates
    *         rows (the directory-swap guard)
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, shuffle: Boolean = false): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val (filesBefore, bytesBefore) = dirStats(spark, inDir)
    require(filesBefore > 0, s"no parquet files under $inDir")
    val nOutL = math.max(1L,
      (bytesBefore + targetBytes - 1) / targetBytes)
    // .toInt on a multi-billion quotient would wrap (negative or a
    // silently wrong positive partition count)
    require(nOutL <= Int.MaxValue,
      s"targetBytes=$targetBytes over $bytesBefore input bytes would " +
        s"mean $nOutL output files — not a plausible compaction target")
    val nOut = nOutL.toInt

    // The input row count rides the WRITE pass via observe — the input
    // is read exactly once. A separate verification re-read of inDir
    // would double the I/O and, on a live directory (a streaming sink —
    // this op's stated motivation), could see files the rewrite didn't,
    // aborting a correct compaction.
    val obs = new org.apache.spark.sql.Observation()
    val in = spark.read.parquet(inDir)
    val sized = if (shuffle) in.repartition(nOut) else in.coalesce(nOut)
    sized.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("overwrite").parquet(outDir)
    val nRows = obs.get("n").asInstanceOf[Long]
    val nRowsAfter = spark.read.parquet(outDir).count()
    if (nRows != nRowsAfter)
      throw new IllegalStateException(
        s"compaction changed row count: $nRows -> $nRowsAfter")

    val (filesAfter, bytesAfter) = dirStats(spark, outDir)
    val schema = StructType(Seq(
      StructField("files_before", LongType, nullable = false),
      StructField("bytes_before", LongType, nullable = false),
      StructField("files_after", LongType, nullable = false),
      StructField("bytes_after", LongType, nullable = false),
      StructField("n_rows", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(filesBefore, bytesBefore, filesAfter, bytesAfter, nRows)), 1),
      schema)
  }

  /** (data-file count, total bytes) under `dir` — driver-side listing
    * through the session's Hadoop FS (object-store-correct), hidden
    * and metadata files excluded.
    */
  def dirStats(spark: SparkSession, dir: String): (Long, Long) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return (0L, 0L)
    val root = fs.makeQualified(p)
    // hidden/metadata exclusion must test every path component under
    // the root, not just the leaf: a streaming sink's
    // _spark_metadata/0 has a non-hidden LEAF inside a hidden
    // directory, and counting it would skew the nOut sizing against
    // files the parquet read never consumes
    def hidden(path: Path): Boolean = {
      var cur = path
      while (cur != null && cur != root) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val it = fs.listFiles(p, true)
    var n = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && !hidden(f.getPath)) {
        n += 1; bytes += f.getLen
      }
    }
    (n, bytes)
  }
}
