package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch-versioned parquet state for `foreachBatch` pipelines — the
  * replay-idempotence discipline [[IncrementalClusters]] introduced,
  * factored out so every streaming state table ([[IncrementalClusters]]'
  * label snapshots, [[NearDupIndex]]'s band/signature/verdict stores)
  * shares ONE implementation of the rule that makes batch replay safe:
  * a batch READS only versions strictly BELOW its own batchId and
  * OVERWRITES exactly its own `batch-<id>` directory, so a re-executed
  * batch (failure recovery re-runs the same id with the same data) sees
  * the same predecessor state and rewrites the same output — never the
  * partial state its failed attempt may have left.
  *
  * Two read shapes, matching the two state algebras:
  *  - [[latestBelow]] — SNAPSHOT state: each version is the full folded
  *    state (q130's labels), so current = the one latest version;
  *  - [[allBelow]] — APPEND state: each version holds only that batch's
  *    additions (an LSH index's new band rows, per-batch verdicts), so
  *    current = the union. This is the Hive ingest-partition shape: at
  *    100 TB the index is never rewritten, each batch adds a directory.
  *
  * Listing uses the SESSION's Hadoop filesystem — the same resolution
  * the writer used (the q58 lesson: `java.io.File` lies for any
  * non-local default FS).
  */
object VersionedStore {

  /** Paths of all committed versions with id < `bound`, ascending. */
  def allBelow(spark: SparkSession, dir: String,
      bound: Long): Seq[String] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).iterator
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("batch-"))
      .map(p => (p.getName.stripPrefix("batch-").toLong, p.toString))
      .filter(_._1 < bound)
      .toSeq
      .sortBy(_._1)
      .map(_._2)
  }

  /** The single latest version below `bound`, if any. */
  def latestBelow(spark: SparkSession, dir: String,
      bound: Long): Option[String] =
    allBelow(spark, dir, bound).lastOption

  /** Union-read of every version below `bound` (append-state read);
    * None when no version exists yet.
    */
  def readAllBelow(spark: SparkSession, dir: String,
      bound: Long): Option[DataFrame] = {
    val vs = allBelow(spark, dir, bound)
    if (vs.isEmpty) None else Some(spark.read.parquet(vs: _*))
  }

  /** Commit `df` as version `batchId` — overwrite makes replay rewrite
    * rather than duplicate. Always writes (an empty `df` still commits
    * an empty version with its schema), so append-state readers never
    * see a gap that silently drops a batch's contribution.
    */
  def write(df: DataFrame, dir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$dir/batch-$batchId")

  /** Time travel: read exactly version `batchId` if committed. For
    * snapshot state this is the store AS OF that batch — what an
    * incremental pipeline's audit ("what were the labels after
    * Tuesday's ingest?") and backfill-from-a-known-good-point both
    * read. None when that version was never committed or has been
    * retired by [[compactSnapshots]].
    */
  def readAt(spark: SparkSession, dir: String,
      batchId: Long): Option[DataFrame] = {
    val p = new Path(s"$dir/batch-$batchId")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Retention for SNAPSHOT stores: delete all but the newest
    * `retainLast` versions, returning the retired batch ids. Each
    * snapshot version is the complete folded state, so old versions
    * exist only for time travel / replay — and replay can only revisit
    * ids the stream's checkpoint has NOT committed past, so the safe
    * call site is "retain at least the checkpoint's uncommitted
    * window" (the VACUUM-vs-time-travel retention trade every
    * versioned table format documents). Never deletes the latest
    * version regardless of `retainLast`.
    */
  def compactSnapshots(spark: SparkSession, dir: String,
      retainLast: Int): Seq[Long] = {
    require(retainLast >= 1, s"retainLast must be >= 1: $retainLast")
    val all = allBelow(spark, dir, Long.MaxValue)
    val retire = all.dropRight(retainLast)
    val fs = new Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    retire.map { p =>
      fs.delete(new Path(p), true)
      p.split("batch-").last.toLong
    }
  }

  /** Compaction for APPEND stores: union every version with id ≤
    * `upTo` into ONE consolidated version `batch-<upTo>` and delete
    * the inputs — the small-files cure for a long-running index (a
    * year of daily batches is 365 directories; reads pay per-file
    * open cost and the listing itself). Contents are preserved
    * exactly: union-read before ≡ union-read after. Crash safety is
    * write-ahead: the consolidated copy is FULLY written (parquet
    * `_SUCCESS` marker) to a dot-prefixed temp directory — invisible
    * to [[allBelow]] — before any input is removed, and a re-run first
    * ADOPTS a marker-complete temp copy from a crashed predecessor
    * (which already holds every original input's rows, including any
    * the crash had started deleting) instead of rebuilding from the
    * survivors; a marker-less (half-written) temp is discarded and
    * rebuilt. So recovery = re-run with the SAME `upTo`; no committed
    * row is ever readable only half-written. Same retention rule as
    * [[compactSnapshots]]: only consolidate ids the stream's
    * checkpoint has committed past, so no replay can write below the
    * consolidated version.
    */
  def consolidateAppend(spark: SparkSession, dir: String,
      upTo: Long): Unit = {
    val fs = new Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(s"$dir/.compact-$upTo")
    val complete = fs.exists(new Path(tmp, "_SUCCESS"))
    if (!complete) {
      if (fs.exists(tmp)) fs.delete(tmp, true) // half-written attempt
      val inputs = allBelow(spark, dir, Long.MaxValue)
        .filter(_.split("batch-").last.toLong <= upTo)
      if (inputs.isEmpty) return
      spark.read.parquet(inputs: _*)
        .write.mode("overwrite").parquet(tmp.toString)
    }
    // the temp copy now subsumes every version ≤ upTo that still
    // exists; retire them and promote the copy
    allBelow(spark, dir, Long.MaxValue)
      .filter(_.split("batch-").last.toLong <= upTo)
      .foreach(p => fs.delete(new Path(p), true))
    fs.rename(tmp, new Path(s"$dir/batch-$upTo"))
  }
}
