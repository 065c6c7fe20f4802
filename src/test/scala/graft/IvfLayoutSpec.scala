package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{KMeans, Similarity}

/** The stored IVF inverted-list LAYOUT (SURVEY §2.11 E277): q37/q59/
  * q275 compute the cell restriction as a JOIN against in-plan
  * assignments; at corpus scale the assignments are a STORED table
  * PARTITIONED BY CELL, and a probe reads only its nprobe cells'
  * partitions — "the inverted lists are the only thing read" as a
  * filesystem fact, not a plan metaphor. This is the ANN sibling of
  * the ghp-partitioned novelty history (q220/q223) and the E160
  * bucket-pruning proof: partition pruning asserted on the EXECUTED
  * scan's selectedPartitions, and the pruned probe proven
  * row-identical to the unpruned one (a vector lives in exactly one
  * cell, so restricting the scan to probed cells drops nothing a
  * probe could match).
  */
class IvfLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("cell-partitioned embedding store: a 2-cell probe reads exactly " +
      "2 of k partitions (executed-scan selectedPartitions) and returns " +
      "the same rows as the unpruned scan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    val prep = Similarity
      .prepare(Tables(spark, "/root/testdata/sf0.001", "embeddings"),
        "embedding")
      .filter(col("qn") > 0)
    val cs = KMeans.fitCentroids(prep, "vec_id", 8, 2)
    val store = Scratch.register(java.nio.file.Files
      .createTempDirectory("graft_ivf_layout").toString) + "/cells"
    KMeans.assignTo(prep, "vec_id", cs)
      .select(col("vec_id"), col("qv"), col("qn"), col("cluster").as("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(store)
    val table = spark.read.parquet(store)
    val total = table.select("cell").distinct().count()
    assert(total === 8L, s"expected all 8 cells populated, got $total")
    // a probe restricted to its 2 coarse cells
    val probeCells = Seq(1L, 4L)
    val pruned = table.filter(col("cell").isin(probeCells: _*))
    val ids = pruned.select("vec_id").collect().map(_.getLong(0)).toSet
    val scans = flatten(pruned.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    assert(scans.map(_.selectedPartitions.partitionCount).max === 2,
      "the probe must read ONLY its 2 cells' partitions")
    // equivalence: partition restriction loses nothing a probe could
    // match — a vector lives in exactly one cell
    val full = table.filter(col("cell").isin(probeCells: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = KMeans.assignTo(prep, "vec_id", cs)
      .filter(col("cluster").isin(probeCells: _*))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids === expected && full === expected)
  }
}
