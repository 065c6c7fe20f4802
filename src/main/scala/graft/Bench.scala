package graft
import java.nio.file.{Files, Paths}
object Bench {

  /** Median of the timed trials — single-shot numbers at sf0.1 swing
    * 2–4× run-to-run (GC, codegen cache, shuffle-file reuse), so each
    * query runs `SPARK_GRAFT_TRIALS` times (default 3) and the median
    * is reported. An errored query reports -1 regardless of trials.
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** 1-minute load average — the machine-contention sentinel sampled
    * around every query so a driver-vs-idle discrepancy is
    * adjudicable from the artifact itself instead of a re-probe
    * (bench numbers on a loaded host run 2-4x hot; r15's four
    * "movers" were all contention).
    */
  private def loadAvg(): Double =
    try Files.readString(Paths.get("/proc/loadavg"))
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** (total, steal) jiffies from /proc/stat's aggregate cpu line —
    * steal% over a query's window exposes hypervisor contention the
    * load average can't see.
    */
  private def cpuTicks(): (Long, Long) =
    try {
      val f = Files.readAllLines(Paths.get("/proc/stat")).get(0)
        .trim.split("\\s+").drop(1).map(_.toLong)
      (f.sum, if (f.length > 7) f(7) else 0L)
    } catch { case _: Throwable => (0L, 0L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt.max(1)
    val spark = Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional name filter (comma-separated prefixes) for profiling runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    // Untimed warmup at the smallest available SF: JIT + codegen +
    // parquet-reader init otherwise lands entirely on the first timed
    // trial. Derived from sfDir (sibling sf0.001) rather than hardcoded
    // so hosts with other layouts still warm up — against sfDir itself
    // as the fallback; failures are logged, never silent.
    val warmupDir = sys.env.get("SPARK_GRAFT_WARMUP_DIR").getOrElse {
      val sibling = Paths.get(sfDir).toAbsolutePath.getParent match {
        case null => sfDir
        case p => p.resolve("sf0.001").toString
      }
      if (Files.isDirectory(Paths.get(sibling))) sibling else sfDir
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, warmupDir).count()
      catch {
        case t: Throwable =>
          System.err.println(s"[bench] WARN warmup of $name on $warmupDir " +
            s"failed: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      // release this invocation's tracked one-shot checkpoints NOW —
      // 263 queries × (warmup + trials) of stale blocks otherwise sit
      // in the block-manager store until a driver GC lets the
      // ContextCleaner catch up (eviction + GC pressure exactly where
      // the bench is deepest)
      finally ops.Snap.drainTracked()
    }
    val timed = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val la0 = loadAvg()
      val (tk0, st0) = cpuTicks()
      val secs = (1 to trials).map { i =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        // outside the timed window: bookkeeping, not query work
        ops.Snap.drainTracked()
        System.err.println(f"[bench] $name trial $i/$trials $sec%.2fs" +
          (if (ok) "" else " FAILED"))
        if (ok) sec else -1.0
      }
      val la1 = loadAvg()
      val (tk1, st1) = cpuTicks()
      val stealPct =
        if (tk1 > tk0) (st1 - st0) * 100.0 / (tk1 - tk0) else 0.0
      (name, if (secs.contains(-1.0)) -1.0 else median(secs),
        la0, la1, stealPct)
    }
    val results = timed.map { case (n, v, _, _, _) => n -> v }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // the contention sentinel: per query [loadavg before, loadavg
    // after, steal% across its window] — all trials included
    def r2(v: Double): String = (math.rint(v * 100) / 100.0).toString
    val loads = timed.map { case (n, _, la0, la1, sp) =>
      s"\"" + n + s"\":[${r2(la0)},${r2(la1)},${r2(sp)}]"
    }.mkString("{", ",", "}")
    val laMax = timed.map(t => math.max(t._3, t._4))
      .foldLeft(0.0)(math.max)
    val stealMax = timed.map(_._5).foldLeft(0.0)(math.max)
    // errored queries keep their -1 marker per-query but must not be
    // summed: total - 1.0 is a plausible-looking wrong headline number
    val ok = results.values.filter(_ >= 0)
    val total = if (ok.nonEmpty) ok.sum else 0.0
    val failed = results.count(_._2 < 0)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"load":$loads,"load_max":${r2(laMax)},"steal_max_pct":${r2(stealMax)},"sf":"$sfDir","trials":$trials,"failed":$failed}"""
    // The artifact of record: the full per-query map goes to a file —
    // the driver keeps only a ~2000-char TAIL of stdout, and the full
    // 200+-query line is >6 KB (BENCH_r04 and r06/r07 all lost the
    // line's head that way, leaving parsed=null).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    try Files.writeString(Paths.get(outPath), line + "\n")
    catch { case t: Throwable =>
      System.err.println(s"[bench] WARN could not write $outPath: ${t.getMessage}")
    }
    // stdout gets a line guaranteed to survive the tail capture intact:
    // same headline fields, but the queries map holds only the slowest
    // entries that fit a fixed byte budget (3-decimal seconds — the
    // informative ones; fast queries are the ones safely summarized by
    // the total), plus how many were omitted and where the full map is.
    val budget = 1600 // < 2000-char driver tail, with headroom
    def r3(v: Double): String = // locale-proof 3-decimal rendering
      (math.rint(v * 1000) / 1000.0).toString
    val sorted = results.toSeq.sortBy { case (n, v) => (-v, n) }
    val head = new StringBuilder
    var omitted = 0
    sorted.foreach { case (k, v) =>
      val ent = (if (head.nonEmpty) "," else "") + "\"" + k + "\":" + r3(v)
      if (head.length + ent.length <= budget) head.append(ent)
      else omitted += 1
    }
    val shortLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{${head.toString}},"omitted":$omitted,"full":"$outPath","load_max":${r2(laMax)},"steal_max_pct":${r2(stealMax)},"sf":"$sfDir","trials":$trials,"failed":$failed}"""
    // quiesce BEFORE the artifact line: the StateStore maintenance
    // thread's shutdown WARN otherwise lands after the JSON and breaks
    // the driver's tail parse (r12 finding #1)
    Sessions.quiesceStreaming()
    println(shortLine)
    spark.stop()
  }
}
