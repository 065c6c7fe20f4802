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
}
