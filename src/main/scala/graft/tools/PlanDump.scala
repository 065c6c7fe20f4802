package graft.tools

import graft.{Sessions, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for selected queries to files — the
  * plan-evidence artifact for optimization rounds (plans/rNN/). Usage:
  *
  *   SPARK_GRAFT_ONLY=q302_,q306_ \
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r16 after"
  *
  * Writes `<outDir>/<query>_<suffix>.txt` holding the FORMATTED plan
  * (the same text `df.explain("formatted")` prints). The plan is the
  * pre-execution one (AQE `isFinalPlan=false`) — deterministic and
  * diffable, which is what plan-shape claims (Exchange count, join
  * strategy, PushedFilters/ReadSchema) are checked against.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] wrote $name ($suffix)")
      } catch { case t: Throwable =>
        System.err.println(s"[plandump] $name failed: ${t.getMessage}")
      } finally graft.ops.Snap.drainTracked()
    }
    Sessions.quiesceStreaming()
    spark.stop()
  }
}
