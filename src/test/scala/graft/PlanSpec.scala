package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that make these queries
  * survive a 100×–1000× scale-up are plan shapes, not results — filters
  * reaching the parquet scan, small dims broadcast, aggregates partial
  * (map-side), the custom dot-product expression actually planned.
  * These lock them in against regression.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def sparkPlan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan.toString

  test("q01: equality filter is pushed into the parquet scan") {
    val p = sparkPlan("q01_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("EqualTo(event_type,click)"))
  }

  test("q01: column pruning reaches the scan (no props/ts in ReadSchema)") {
    val p = sparkPlan("q01_filter_project")
    val readSchema = p.linesIterator.mkString
      .split("ReadSchema:").last
    assert(!readSchema.contains("props"))
    assert(readSchema.contains("event_id"))
  }

  test("q08: dimension joins broadcast; no shuffle on the build sides") {
    val p = sparkPlan("q08_join_multihop")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q12: grouped aggregation is partial (map-side combine)") {
    val p = sparkPlan("q12_agg_groupby")
    assert(p.contains("partial_sum") || p.contains("partial_count"))
  }

  test("minhash signature aggregation is partial (map-side min)") {
    // assert on the signature pipeline itself — inside q25 it sits
    // behind an eager localCheckpoint, which truncates the visible plan
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, dir, "documents")
      .withColumn("shingles",
        graft.functions.TextFns.shingles("text", 5))
      .select("doc_id", "shingles")
    val p = graft.ops.NearDup
      .minHashSigs(docs, "doc_id", "shingles", 32, "sig")
      .queryExecution.sparkPlan.toString
    assert(p.contains("partial_min"))
  }

  test("q27: simhash NN plan has no cartesian product (block-LSH candidates)") {
    // executed plan (join strategies are only final there); the radius-
    // bounded NN must get its pairs from the block self-equi-join, never
    // an all-pairs product
    val df = SparkEntry.queries("q27_simhash_knn")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // not vacuous: the pair source is the equi-join on (block_idx, block)
    assert(p.contains("block_idx"))
  }

  test("q06b: scalable surrogate key plans no window (q06 control does)") {
    // the partition-offset form numbers rows without any Window
    // operator; the q06 parity form is the single-task window — both
    // asserted so the q06b check is not vacuous
    val pb = SparkEntry.queries("q06b_surrogate_scalable")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!pb.contains("Window"))
    val p6 = sparkPlan("q06_surrogate_key")
    assert(p6.contains("Window"))
  }

  test("q47: exact percentiles never buffer group values, never window-sort per group") {
    val df = SparkEntry.queries("q47_percentiles")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // percentile()'s buffer holds every value of a group (out), and a
    // Window.partitionBy(group) sort has parallelism = #groups (out for
    // the 3-group l_returnflag) — the few-groups form range-partitions
    // the (group, value) space instead
    assert(!p.contains("ObjectHashAggregate"))
    assert(!p.toLowerCase.contains("percentile"))
    assert(!p.contains("Window"))
    assert(p.toLowerCase.contains("rangepartitioning"))
  }

  test("q53: eval gram index is broadcast; corpus grams never sort-merge") {
    val df = SparkEntry.queries("q53_contamination")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q60: quantile boundaries broadcast onto the corpus (no sort-merge)") {
    val df = SparkEntry.queries("q60_range_shard")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q28: custom codegen dot product is in the plan") {
    val p = sparkPlan("q28_cosine_topk")
    assert(p.contains("long_dot"))
  }

  test("q29: LSH bucket planes are folded to literals (no md5 at runtime)") {
    val p = sparkPlan("q29_cosine_lsh")
    assert(!p.contains("md5"))
  }

  test("bucketed tables join with no exchange; unbucketed control shuffles") {
    import org.apache.spark.sql.functions._
    val uid = "planspec"
    // the in-memory catalog forgets tables between JVMs but their
    // managed locations persist — clear both before re-creating (the
    // warehouse path comes from the live conf, kept in sync with
    // Sessions.scala)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq(s"graft_ps_o_$uid", s"graft_ps_li_$uid").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      Scratch.delete(new java.io.File(s"$warehouse/$tbl"))
    }
    Tables(spark, dir, "orders").select("o_orderkey", "o_custkey")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"graft_ps_o_$uid")
    Tables(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"graft_ps_li_$uid")
    // assertions must run on the EXECUTED plan: EnsureRequirements only
    // inserts Exchange/Sort there (sparkPlan would pass vacuously)
    val bucketed = spark.table(s"graft_ps_li_$uid").hint("merge")
      .join(spark.table(s"graft_ps_o_$uid"),
        col("l_orderkey") === col("o_orderkey"))
    bucketed.count()
    val pb = bucketed.queryExecution.executedPlan.toString
    assert(pb.contains("SortMergeJoin"))
    assert(!pb.contains("Exchange")) // co-located: bucket layout IS the shuffle
    // control: the same join on unbucketed scans MUST shuffle — proves
    // the assertion above is not vacuous
    val unbucketed = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity").hint("merge")
      .join(Tables(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
    unbucketed.count()
    assert(unbucketed.queryExecution.executedPlan.toString
      .contains("Exchange"))
  }

  test("q65: top-k is TakeOrderedAndProject, never a full global sort") {
    val df = SparkEntry.queries("q65_top_bigrams")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
    // and the gram count aggregation is map-side partial
    assert(p.contains("partial_count"))
  }

  test("q64: pair production is an equi-join on the gram hash, no cartesian") {
    val df = SparkEntry.queries("q64_ngram_jaccard")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("__gh")) // the inverted-index join key
  }

  test("q70: interval join is a bin equi-join, never a nested-loop range join") {
    val df = SparkEntry.queries("q70_interval_join")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("__bin")) // the time-bucket equi-join key
  }

  test("partitioned parquet sink: partition filter prunes at the scan") {
    import org.apache.spark.sql.functions._
    val out = Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_prune_" +
        spark.sparkContext.applicationId)
    Tables(spark, dir, "events")
      .select("event_id", "user_id", "event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    q.count()
    val scan = q.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory pruning —
    // non-click partitions are never opened), not in the data filters
    assert(scan.contains("PartitionFilters"))
    val pf = scan.split("PartitionFilters:").last.split("]").head
    assert(pf.contains("event_type") && pf.contains("click"))
  }

  test("q67: incremental dedup plans a hash anti-join on the fingerprint") {
    val df = SparkEntry.queries("q67_incremental_dedup")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q73: sequence packing plans NO window operator (distributed prefix sum)") {
    val df = SparkEntry.queries("q73_seq_packing")(spark, dir)
    df.count()
    // the whole point of Packing.withRunningSum: the global running sum
    // must not appear as a single-task Window in the physical plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("q79: profiler is ONE scan — a single aggregate feeds the stack pivot") {
    val df = SparkEntry.queries("q79_profiler")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // one parquet scan of lineitem, not one per profiled column
    val scans = "FileScan parquet".r.findAllIn(p).length +
      "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"expected a single lineitem scan, plan:\n$p")
    assert(p.contains("partial_min") && p.contains("partial_max"))
  }

  test("q96: aggregation argmax plans partial_max and NO sort/window before the agg") {
    val df = SparkEntry.queries("q96_argmax_agg")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // latest-per-key must be a map-side-combined struct max, never a
    // per-group sort (q03's form) or a window
    assert(p.contains("partial_max"), p.take(800))
    assert(!p.contains("Window"))
  }

  test("join hints are honored: shuffle_hash plans a ShuffledHashJoin") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey")
    val j = li.join(ord.hint("shuffle_hash"),
      li("l_orderkey") === ord("o_orderkey"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), p.take(800))
  }

  test("q87: k-means assignment plans NO join — centroids are plan literals") {
    val df = SparkEntry.queries("q87_kmeans")(spark, dir)
    df.count()
    // vectors must never shuffle into a join against a centroid table;
    // the only shuffle is the final k-row aggregation
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"assignment joined:\n${p.take(1200)}")
    assert(p.contains("long_dot"),
      "codegen'd dot product missing from the assignment")
  }

  test("q101: paragraph-dedup decisions shuffle ids and hashes only, never text") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // exchanges exist only post-EnsureRequirements; AQE wraps them in
    // opaque query stages, so inspect the non-adaptive executed plan
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = Tables(spark, dir, "documents")
      val plan = graft.ops.ParagraphDedup.decisions(docs, "doc_id", "text", 20)
        .queryExecution.executedPlan
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, "expected winner-election shuffles")
      exchanges.foreach { e =>
        val names = e.output.map(_.name)
        assert(!names.exists(n => n == "para" || n == "text"),
          s"paragraph text entered a shuffle: $names")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q103: cross-corpus semantic dedup plans exactly ONE join (the cell join)") {
    // both assignment legs are scan-local (centroids as literals); the
    // only join anywhere is batch-vs-history on the cluster key —
    // re-clustering or a centroid join would add more
    val p = SparkEntry.queries("q103_cross_semantic_dedup")(spark, dir)
      .queryExecution.sparkPlan.toString
    val joins = Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
      "CartesianProduct", "BroadcastNestedLoopJoin")
      .map(k => k.r.findAllIn(p).length).sum
    assert(joins === 1, s"expected the single cell join, got $joins:\n${p.take(1200)}")
    assert(p.contains("long_dot"),
      "codegen'd dot product missing from the cell compare")
  }

  test("q111: PPS sampling plans NO window operator (distributed " +
      "prefix sum + scan-local selection)") {
    val df = SparkEntry.queries("q111_pps_sample")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "the weight prefix sum must not be a single-task window")
  }

  test("q113: PQ ADC scoring broadcasts the query tables; the coded " +
      "base side never shuffles before scoring") {
    // the scored pair stream must come from a broadcast nested-loop of
    // base × (tiny) query tables — a shuffle of the coded base or a
    // sort-merge would not survive a 100 TB corpus
    val df = SparkEntry.queries("q113_pq_ann")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected broadcast scoring joins:\n${p.take(1200)}")
    assert(p.contains("long_dot"),
      "codegen'd dot product missing from table construction")
  }

  test("q124: star join pushes the date filter to the orders scan and " +
      "broadcasts the metadata dims") {
    val p = sparkPlan("q124_star_join")
    // pushed-down range predicate on o_orderdate at the parquet scan
    assert(p.contains("GreaterThanOrEqual(o_orderdate") ||
      p.contains("PushedFilters: [IsNotNull(o_orderdate"),
      s"date filter not pushed:\n${p.take(1200)}")
    // nation/region (metadata-sized) must broadcast — a shuffle of the
    // fact side keyed on nationkey would be a plan regression
    assert(p.contains("BroadcastHashJoin"))
    // the aggregation partial-aggregates map-side
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("q13: per-group top-k plans two-phase WindowGroupLimit (partial " +
      "map-side + final), never a full per-group sort buffer") {
    // Spark's InferWindowGroupLimit turns rank<=k into a partial
    // (pre-shuffle) + final group-limit — each task keeps at most k
    // rows per group in a heap, so a hot key cannot OOM the window;
    // this is the built-in answer to per-group top-k at 100 TB and
    // the reason no custom operator is needed for it
    val p = sparkPlan("q13_window_topn")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n${p.take(800)}")
    assert(p.contains("Partial") && p.contains("Final"),
      "expected both partial and final group-limit phases")
  }

  test("q118: each PageRank round is an equi-join + partial-aggregated " +
      "shuffle, no cartesian, no window") {
    // the per-round Snap checkpoint makes the FINAL plan start at the
    // last pinned state, so the round structure is asserted on the
    // actual round builder the loop runs
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val cur = Seq((1L, 1L, 2L, 100L), (2L, 1L, 2L, 100L))
      .toDF("node", "outdeg", "__n", "r")
    val round = graft.ops.PageRank.roundNext(e, cur, 1000L)
      .queryExecution.sparkPlan.toString
    assert(!round.contains("CartesianProduct"))
    assert(round.contains("partial_sum"),
      "per-edge contributions must combine map-side")
    assert(!round.contains("Window"))
    // the query's own final stage: top-k, never a global sort
    val p = sparkPlan("q118_pagerank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q133: triangle wedges and closings are equi-joins — no " +
      "cartesian, no nested-loop anywhere") {
    // the degree-ordered orientation's whole point: wedge build joins
    // on src, closing probes join on (dst1, dst2) — a cartesian or
    // BNLJ here means the orientation predicate fell out of the keys
    val p = sparkPlan("q133_triangles")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q134: prefix index and verification are equi-joins; the " +
      "per-doc prefix window stays doc-partitioned") {
    val p = sparkPlan("q134_setsim_join")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the prefix ranking must partition by doc (doc-bounded frames) —
    // a global window here would single-task the corpus
    assert(p.contains("windowspecdefinition(__id"),
      s"prefix window not partitioned by doc:\n${p.take(1200)}")
  }

  test("q140: grouping sets plan ONE Expand over one scan — levels " +
      "don't re-scan the fact table") {
    val p = sparkPlan("q140_grouping_sets")
    assert(p.contains("Expand"))
    assert("Expand".r.findAllIn(p).size === 1, "exactly one Expand")
    assert("Scan parquet".r.findAllIn(p).size === 1,
      "all three levels must share one scan")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "level aggregation must combine map-side")
  }

  test("q142: bin assignment is scan-local — boundaries are literals, " +
      "no join and no window between scan and the bin aggregate") {
    val df = SparkEntry.queries("q142_equidepth_bins")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), "boundaries must fold in as literals")
    assert(!p.contains("Window"))
    assert(p.contains("partial_count"),
      "per-bin counts must combine map-side")
  }

  test("q143: the seed table broadcasts onto the node state; rounds " +
      "are equi-joins with partial aggregation, top-k not global sort") {
    // round + seed-join shapes asserted on the builders the loop runs
    // (the per-round Snap checkpoint hides them from the final plan)
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val nodes = graft.ops.PageRank.seedNodes(e, seeds, "node")
      .queryExecution.sparkPlan.toString
    assert(nodes.contains("BroadcastHashJoin"), "seed join must broadcast")
    val cur = Seq((1L, 1L, 1L, 1L, 100L), (2L, 1L, 1L, 0L, 0L))
      .toDF("node", "outdeg", "__ns", "__seed", "r")
    val round = graft.ops.PageRank.seededRoundNext(e, cur, 1000L)
      .queryExecution.sparkPlan.toString
    assert(!round.contains("CartesianProduct"))
    assert(round.contains("partial_sum"))
    val p = sparkPlan("q143_trustrank")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q144: curriculum staging plans NO window operator (the prefix " +
      "sum is the distributed range exchange)") {
    val p = SparkEntry.queries("q144_curriculum")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "stage aggregation must combine map-side")
  }

  test("q145: selection is scan-local rate filtering — quota table " +
      "broadcasts, no window, no per-source sort") {
    val p = sparkPlan("q145_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), "quotas must broadcast")
    assert(!p.contains("Window"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q149: sequence-example windows are user-partitioned (frames " +
      "bounded by one user's stream); top-20 is TakeOrderedAndProject") {
    val p = sparkPlan("q149_seq_examples")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must not global-sort")
    assert(p.contains("partial_count"),
      "pattern counts must combine map-side")
    val winLine = p.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(winLine.contains("user_id"),
      s"window must partition by user_id:\n$winLine")
  }

  test("q150: exact stratified split has NO window operator — the " +
      "per-stratum rank is the range-exchange prefix sum minus a " +
      "broadcast offset") {
    val df = SparkEntry.queries("q150_exact_split")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "rank must come from the prefix sum, not a per-source window")
    assert(p.contains("BroadcastHashJoin"),
      "stratum offsets must broadcast")
  }

  test("q151: source-relative deciles have NO window — rank is the " +
      "prefix sum minus a broadcast stratum offset") {
    val df = SparkEntry.queries("q151_quality_deciles")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "per-source rank must not be a window (single task per source)")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q153: upsampling is scan-local — factors broadcast, copies " +
      "materialized by Generate, no cartesian beyond the 1-row nmax") {
    val df = SparkEntry.queries("q153_epoch_upsample")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Generate"), "explode must materialize copies")
    assert(p.contains("BroadcastHashJoin"),
      "per-source factors must broadcast onto the scan")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"))
  }

  test("q156: FK audit joins (key, cnt) pairs, child counts partial — " +
      "no row-level join materialization, no cartesian") {
    val df = SparkEntry.queries("q156_fk_audit")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count"),
      "per-key child counts must combine map-side")
    assert(!p.contains("CartesianProduct"))
  }

  test("q157: bitmask distinct — dictionary broadcasts, bit_or " +
      "aggregate is partial (8-byte state), no cartesian") {
    val df = SparkEntry.queries("q157_bitset_distinct")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the ordinal dictionary must broadcast")
    assert(p.contains("partial_bit_or") || p.contains("partial_bitor")
      || p.contains("bit_or"), s"bit_or must appear:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q158: both run-collapse windows are user-partitioned — no " +
      "corpus-sized frame") {
    val p = sparkPlan("q158_event_runs")
    val winLines = p.linesIterator.filter(_.contains("Window")).toList
    assert(winLines.nonEmpty)
    assert(winLines.forall(_.contains("user_id")),
      s"every window must partition by user_id:\n${winLines.mkString("\n")}")
  }

  test("q159: the duration window is user-partitioned and the " +
      "weighted sum aggregates partially") {
    val p = sparkPlan("q159_time_weighted_avg")
    val winLine = p.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(winLine.contains("user_id"),
      s"lead window must partition by user_id:\n$winLine")
    assert(p.contains("partial_sum"),
      "Σ(vq·dur) must combine map-side")
  }

  test("q161: PIT join is the union-carry-forward — user-partitioned " +
      "window, NO range join fan-out, no cartesian") {
    val df = SparkEntry.queries("q161_pit_join")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "carry-forward must avoid the interval-join fan-out")
    val winLine = p.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(winLine.contains("user_id"),
      s"carry-forward window must partition by user_id:\n$winLine")
  }

  test("q163: the runtime day set dynamically prunes the partitioned " +
      "fact scan") {
    val df = SparkEntry.queries("q163_dynamic_pruning")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"fact scan must carry a dynamic pruning subquery:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q168: the cell aggregate's shuffle feeds both consumers — " +
      "exchange reused in the final adaptive plan") {
    val df = SparkEntry.queries("q168_exchange_reuse")(spark, dir)
    df.collect() // AQE applies exchange reuse during execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"the totals re-aggregation must reuse the cell shuffle:\n${p.take(1600)}")
  }

  test("q169: incremental ids plan NO window — both phases are the " +
      "count-then-offset range exchange") {
    val df = SparkEntry.queries("q169_incremental_ids")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "dense ids must come from DenseId, not a global window")
  }

  test("q166: the point lookup reads ONE of 8 bucket files") {
    val df = SparkEntry.queries("q166_bucket_pruning")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning must select exactly one bucket:\n${p.take(1200)}")
  }

  test("q160: CDC merge is one key-equi full-outer join — no " +
      "cartesian, no window") {
    val df = SparkEntry.queries("q160_cdc_merge")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"))
    assert(p.contains("FullOuter"), "merge must be the full-outer join")
  }

  test("q177: skip-gram pair generation is scan-local — no join of " +
      "the token stream against itself; top-30 is TakeOrderedAndProject") {
    val df = SparkEntry.queries("q177_skipgram_pairs")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"),
      "pairs must come from the nested-transform expression, not a " +
        s"positional self-join:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_count"),
      "the pair count must partial-aggregate map-side")
  }

  test("q179: the seasonal-slot median windows partition by " +
      "(type, hour) — never an unpartitioned frame") {
    val df = SparkEntry.queries("q179_seasonal_anomaly")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("Window"))
    assert(p.contains("windowspecdefinition(event_type"),
      "slot windows must be keyed by (event_type, hr), not a " +
        s"global frame:\n${p.take(1200)}")
  }

  test("q182: the island sweep windows partition by user — never a " +
      "corpus-wide frame") {
    val df = SparkEntry.queries("q182_interval_coverage")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("windowspecdefinition(user_id"),
      s"island windows must be keyed by user_id:\n${p.take(1200)}")
  }

  test("q183: the duplication matrix joins per-hash COUNTS, never " +
      "doc pairs — no cartesian, counts partial-aggregated") {
    val df = SparkEntry.queries("q183_cross_source_matrix")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count"),
      "the (ph, source) occurrence counts must partial-aggregate")
  }

  test("q195: no row_number window anywhere — both interleave ranks " +
      "are the count-then-offset range exchange; the only window is " +
      "the per-source gap lag") {
    val df = SparkEntry.queries("q195_interleave")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("row_number"),
      s"ranks must come from the range exchange:\n${p.take(1200)}")
    assert(p.contains("windowspecdefinition(source"),
      "the gap lag must partition by source")
  }

  test("q199: the weighted-median crossing pick plans NO window — " +
      "the cumulative weight is the range-exchange prefix sum") {
    val df = SparkEntry.queries("q199_weighted_median")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Window"),
      s"cumulative weights must come from Packing, not a window:\n" +
        p.take(1200))
  }

  test("q196: all four horizon frames ride ONE (user, ms) exchange " +
      "and sort — never one shuffle per horizon") {
    val df = SparkEntry.queries("q196_multi_horizon")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(p).length
    assert(exchanges == 1,
      s"expected exactly one window exchange, got $exchanges:\n" +
        p.take(1500))
  }

  test("q203: nested schema pruning — the stored annotated corpus is " +
      "read as annotations.label only; span ints and text never decode") {
    val df = SparkEntry.queries("q203_nested_prune")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    val readSchema = p.split("ReadSchema:").last
    assert(readSchema.contains("annotations"),
      s"the nested column must be in the scan:\n$readSchema")
    assert(readSchema.contains("label"))
    assert(!readSchema.contains("span_start"),
      s"span ints must be pruned from the parquet read:\n$readSchema")
    assert(!readSchema.contains("text"),
      s"the dominant text column must be pruned:\n$readSchema")
  }

  test("q212: LM scoring broadcasts the model; the bigram stream " +
      "never sort-merges and training plans no join at all") {
    val train = SparkEntry.queries("q211_charlm_train")(spark, dir)
    val tp = train.queryExecution.sparkPlan.toString
    // the emitted frame is the stored model read back — asserting the
    // TRAINING shape needs the builder itself
    import graft.ops.CharLm
    val build = CharLm.trainBigrams(
      spark.read.parquet(s"$dir/documents.parquet"), "text")
      .queryExecution.sparkPlan.toString
    assert(!build.contains("Join"), "training is scan-local + one agg")
    assert(build.contains("partial_count"),
      "bigram counts must combine map-side")
    val score = SparkEntry.queries("q212_charlm_score")(spark, dir)
    val sp = score.queryExecution.sparkPlan.toString
    assert(sp.contains("BroadcastHashJoin"), "model must broadcast")
    assert(!sp.contains("SortMergeJoin"),
      s"the corpus-sized bigram stream must never sort-merge:\n" +
        sp.take(1200))
    assert(tp.nonEmpty)
  }

  test("q217: containment tests both directions over equi-joins — " +
      "no cartesian, no nested loop anywhere") {
    val p = sparkPlan("q217_containment_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q220: novelty is a hash anti-join of 32-byte hashes") {
    val p = sparkPlan("q220_gram_novelty")
    assert(p.contains("LeftAnti"),
      s"novel grams must come from an anti-join:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q220/q223 novelty probe: NO Exchange above the bucketed " +
      "gram-history scan — only the arriving grams shuffle (the scale " +
      "claim: per-batch probes never re-shuffle trillion-row history)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // assertions must run on the EXECUTED plan (EnsureRequirements only
    // inserts Exchange there), flattened through the AQE wrappers
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    val df = SparkEntry.queries("q220_gram_novelty")(spark, dir)
    df.count()
    val all = flatten(df.queryExecution.executedPlan)
    val antis = all.collect {
      case j: SortMergeJoinExec if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(antis.nonEmpty,
      s"the novelty probe must be a merge anti-join:\n${all.head.toString.take(1500)}")
    val hist = flatten(antis.head.right)
    assert(hist.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"history side must carry no Exchange:\n${antis.head.right.toString.take(1500)}")
    assert(hist.collect { case f: FileSourceScanExec => f }
        .exists(_.relation.bucketSpec.exists(b =>
          b.numBuckets == 8 && b.bucketColumnNames == Seq("gh"))),
      "history side must read the gh-bucketed table layout in place")
    assert(flatten(antis.head.left).collect {
        case e: ShuffleExchangeLike => e }.nonEmpty,
      "the arriving grams are the side that shuffles into the bucketing")
  }

  test("novelty probe partition pruning: a prefix-restricted probe " +
      "reads ONLY its prefixes' history partitions; a full probe " +
      "reads all (the trickle-batch scale claim)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    // history: enough grams that all 16 hex prefixes exist as partitions
    val tbl = "graft_planspec_novhist"
    spark.range(2000)
      .select(md5(concat(lit("h"), col("id"))).as("gh"))
      .withColumn("ghp", substring(col("gh"), 1, 1))
      .write.mode("overwrite").format("parquet")
      .partitionBy("ghp").bucketBy(8, "gh").sortBy("gh").saveAsTable(tbl)
    def probe(grams: org.apache.spark.sql.DataFrame): Int = {
      val out = graft.streaming.NoveltyMonitor
        .noveltyCounts(spark, grams, tbl)
      out.count()
      val scans = flatten(out.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec
            if f.relation.bucketSpec.exists(_.bucketColumnNames ==
              Seq("gh")) => f
      }
      assert(scans.nonEmpty, "history scan not found in executed plan")
      scans.map(_.selectedPartitions.partitionCount).max
    }
    val grams = spark.range(500)
      .select(lit("s").as("source"),
        md5(concat(lit("p"), col("id"))).as("gh"))
    // restricted probe: only grams whose prefix is 0-3 → ≤ 4 partitions
    val restricted = grams.filter(substring(col("gh"), 1, 1) <= "3")
    val prunedCount = probe(restricted)
    assert(prunedCount <= 4,
      s"prefix-restricted probe must prune the history scan to its " +
        s"prefixes, read $prunedCount partitions")
    // positive control: the unrestricted probe touches every prefix
    assert(probe(grams) === 16,
      "a full probe legitimately reads every partition")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("novelty probe legacy fallback: a history table WITHOUT a ghp " +
      "column (pre-partition-axis, or externally written) takes the " +
      "unpruned scan instead of failing at plan time") {
    import org.apache.spark.sql.functions._
    val tbl = "graft_planspec_novhist_legacy"
    val hist = spark.range(100)
      .select(md5(concat(lit("h"), col("id"))).as("gh"))
    hist.write.mode("overwrite").format("parquet").saveAsTable(tbl)
    // probe: 50 grams known to the history + 10 novel ones
    val grams = hist.limit(50).select(lit("s").as("source"), col("gh"))
      .unionByName(spark.range(10)
        .select(lit("s").as("source"),
          md5(concat(lit("novel"), col("id"))).as("gh")))
    val out = graft.streaming.NoveltyMonitor
      .noveltyCounts(spark, grams, tbl).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_grams") === 60L)
    assert(out.head.getAs[Long]("n_novel") === 10L)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("q222: the metadata-sized eval fingerprint set broadcasts " +
      "onto the corpus gram stream") {
    val p = sparkPlan("q222_winnow_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"eval side must broadcast:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q253: shard stitching is a hash equi-join on 32-byte keys — " +
      "no cartesian, no nested loop") {
    val p = sparkPlan("q253_shard_stitch")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q258: bot-rate screen is one RANGE-frame window + partial agg " +
      "+ TakeOrderedAndProject — no global sort") {
    val p = sparkPlan("q258_bot_rate_screen")
    assert(p.contains("RangeFrame, -60000"),
      s"the 60s burst count must be an event-time range frame:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_count") || p.contains("partial_max"))
  }

  test("q262: byte-budget sharding has NO Window — the running sum is " +
      "the distributed range-exchange pass; the rollup is partial") {
    val p = sparkPlan("q262_byte_shard_plan")
    assert(!p.contains("Window"),
      s"the prefix sum must never be a single-task window:\n${p.take(1200)}")
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("q254: embedding hygiene percentiles avoid the Window form and " +
      "nothing goes cartesian") {
    val p = sparkPlan("q254_embedding_hygiene")
    assert(!p.contains("Window"),
      s"exactFewGroupsLowerRank must use the range-exchange probe pass:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q263: NFC dedup is one partial-agg group-by of 32-byte keys") {
    val p = sparkPlan("q263_nfc_dedup")
    assert(p.contains("partial_count"),
      s"the fingerprint rollup must combine map-side:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q265: the re-encode dedup joins 16-byte fingerprint rows on " +
      "doc_id — payloads never shuffle past the decode") {
    val p = sparkPlan("q265_reencode_dedup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q266: the canon-shingle chain never goes cartesian") {
    val p = sparkPlan("q266_canon_neardup")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q268: winnow pairs come from a group self-join, never a " +
      "cartesian; top-k is TakeOrderedAndProject") {
    val p = sparkPlan("q268_winnow_pairs")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must never be a global sort:\n${p.take(1200)}")
  }

  test("q269: the repetition screen is scan-local + one partial agg — " +
      "no Window, no join, top-k is TakeOrderedAndProject") {
    val p = sparkPlan("q269_repetition_loop")
    assert(!p.contains("Window"))
    assert(!p.contains("Join"), s"nothing to join:\n${p.take(1200)}")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q271/q272: the capstone compositions never go cartesian and " +
      "keep their aggregates partial") {
    Seq("q271_dedup_impact", "q272_decontam_certificate").foreach { q =>
      val p = sparkPlan(q)
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
      assert(p.contains("partial_count") || p.contains("partial_sum"), q)
    }
  }

  test("q275: the stored-IVF semantic screen's fine search is a hash " +
      "equi-join on the cell id — the corpus side never meets a " +
      "nested loop; the only non-equi join is the 8-row broadcast " +
      "cell ranking") {
    val df = SparkEntry.queries("q275_semantic_contam_ivf")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"fine search must be an equi-join on cell:\n${p.take(1200)}")
    // the exact-baseline leg broadcasts the eval side (q28's shape) and
    // the coarse ranking broadcasts the 8 cell rows — each
    // BroadcastNestedLoopJoin in this plan must have a broadcast side
    // that is metadata- or eval-sized, never the corpus: both appear
    // only under a BroadcastExchange
    assert(!p.contains("ShuffledNestedLoopJoin"))
  }

  test("q277/q280: media payloads never shuffle — no Exchange input " +
      "carries a payload column; only (id, fp) rows reach the joins") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    Seq("q277_pair_curation", "q280_raster_clusters").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.count() // executedPlan: exchanges are final only after an action
      val exchanges = flatten(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeLike => e }
      assert(exchanges.nonEmpty, s"$name: expected hash exchanges")
      exchanges.foreach { e =>
        val cols = e.child.output.map(_.name.toLowerCase)
        assert(!cols.exists(_.contains("payload")),
          s"$name: an Exchange would shuffle media payloads: $cols")
      }
      assert(!df.queryExecution.sparkPlan.toString
        .contains("CartesianProduct"), name)
    }
  }

  test("q283/q284/q292/q294: codec-family plans — payloads never cross " +
      "an Exchange (features reduce inside the scan), no cartesian") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    Seq("q283_wav_decode", "q284_y4m_scenes", "q292_media_router",
      "q294_audio_clusters", "q300_video_clusters").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.count()
      flatten(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeLike => e }
        .foreach { e =>
          val cols = e.child.output.map(_.name.toLowerCase)
          assert(!cols.exists(_.contains("payload")),
            s"$name: an Exchange would shuffle media payloads: $cols")
        }
      assert(!df.queryExecution.sparkPlan.toString
        .contains("CartesianProduct"), name)
    }
  }

  test("q295: keyframe election is per-doc windows over narrow frame " +
      "rows — no cartesian, no corpus-wide window") {
    val p = sparkPlan("q295_video_keyframes")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // both windows must partition by doc_id (per-clip state only)
    assert(!p.contains("Window [") ||
      p.split("Window \\[").drop(1).forall(_.contains("doc_id")),
      s"a window without doc_id partitioning:\n${p.take(1500)}")
  }

  test("q259/q260/q261: the banded-chain audits never go cartesian") {
    Seq("q259_bbit_minhash", "q260_canon_policy", "q261_weighted_jaccard")
      .foreach { q =>
        val p = sparkPlan(q)
        assert(!p.contains("CartesianProduct"), q)
        assert(!p.contains("BroadcastNestedLoopJoin"), q)
      }
  }

  test("q215: unigram tables broadcast onto the pair counts; top-30 " +
      "is TakeOrderedAndProject") {
    val p = sparkPlan("q215_pmi_collocations")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q214: winnowing audit is scan-local until the count — no " +
      "join, no Window, no shuffle of the gram stream; top-k is " +
      "TakeOrderedAndProject") {
    val df = SparkEntry.queries("q214_memorization_audit")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"),
      s"repeated-substring detection must never compare pairs:\n" +
        p.take(1200))
    assert(!p.contains("Window"),
      "the sliding min is the in-array conjunction, not a window")
    assert(p.contains("partial_count"),
      "the selected-gram count must combine map-side")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("BPE pair counting: scan-local expansion, partial-agg shuffle, " +
      "no join") {
    import spark.implicits._
    val state = Seq(("ab", 3L))
      .toDF("seq", "cnt")
    val p = graft.ops.Bpe.pairCounts(state)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Join"))
    assert(p.contains("partial_sum"),
      "pair counts must combine map-side")
  }

  test("q209: nested aggregation never explodes — no Generate in the " +
      "plan; three scalars per doc shuffle, not one row per span") {
    val df = SparkEntry.queries("q209_nested_scan_agg")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Generate"),
      s"span stats must compute inside the array:\n${p.take(1200)}")
    assert(p.contains("partial_sum"), "rollup must combine map-side")
    val readSchema = p.split("ReadSchema:").last
    assert(!readSchema.contains("text"),
      s"the dominant text column must be pruned:\n$readSchema")
  }

  test("q202: nested build is scan-local — no join, no window; only " +
      "the label rollup shuffles") {
    val df = SparkEntry.queries("q202_nested_explode")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"),
      s"annotation construction must not join:\n${p.take(1200)}")
    assert(!p.contains("Window"),
      s"offsets must come from the aggregate fold, not a window:\n" +
        p.take(1200))
  }

  test("q231: two-level HRW routing is scan-local — no join, no " +
      "window; one partial-agg rollup shuffles shard counters only") {
    val df = SparkEntry.queries("q231_hrw_two_level")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"),
      s"shard arithmetic must not join:\n${p.take(1200)}")
    assert(!p.contains("Window"), "no window in the rollup")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "shard counters must combine map-side")
  }

  test("q232: drift counters ride ONE exchange (both slices tagged " +
      "into the same partial agg); totals broadcast back") {
    val df = SparkEntry.queries("q232_vocab_drift")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    // the sole pair of exchanges: bucket rollup + the scalar totals;
    // the counter-to-totals join must be broadcast, never sort-merge
    assert(!p.contains("SortMergeJoin"),
      s"scalar totals must broadcast:\n${p.take(1500)}")
    assert(p.contains("partial_sum"), "counters must combine map-side")
  }

  test("q234: dictionary tagging is a map-only pass — no join, no " +
      "shuffle of text; the lexicon is a plan literal") {
    val df = SparkEntry.queries("q234_dict_tags")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"),
      s"the broadcast-literal lexicon must not plan a join:\n" +
        p.take(1200))
    assert(!p.contains("Window"), "no window anywhere")
    // the terms appear as array literals folded into the plan
    assert(p.contains("spark") && p.contains("filter"),
      "lexicon terms must be plan literals")
  }

  test("q235: per-epoch order is TakeOrdered (top-k), never a global " +
      "sort of the corpus") {
    val df = SparkEntry.queries("q235_epoch_order")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"each epoch's first-k must be a distributed top-k:\n" +
        p.take(1200))
  }

  test("q238: length bucketing is map-only + one partial-agg rollup — " +
      "no join, no window; the pow-2 boundary is a plan literal") {
    val df = SparkEntry.queries("q238_length_buckets")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"),
      s"bucket arithmetic must not join:\n${p.take(1200)}")
    assert(!p.contains("Window"), "no window in the rollup")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "bucket counters must combine map-side")
  }

  test("q239: the epoch schedule's corpus totals broadcast back onto " +
      "the ≤sources-row side — never a sort-merge join") {
    val df = SparkEntry.queries("q239_epoch_schedule")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"scalar totals must broadcast:\n${p.take(1500)}")
    assert(p.contains("partial_sum"), "token counters must combine map-side")
  }

  test("q240: the nation dim broadcasts; sensitive-band distinct is a " +
      "grouped aggregate, not a window") {
    val df = SparkEntry.queries("q240_l_diversity")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"nation must broadcast:\n${p.take(1200)}")
    assert(!p.contains("Window"), "no window anywhere")
  }

  test("q241: the path report is TakeOrdered over path-rollup rows — " +
      "never a global sort; session assembly stays in one user shuffle") {
    val df = SparkEntry.queries("q241_session_paths")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 paths must be a distributed top-k:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
  }

  test("q242: the normalized screen ships only gram hashes — the eval " +
      "side broadcasts, and no cartesian appears") {
    val df = SparkEntry.queries("q242_norm_decontam")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the eval gram side must broadcast:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "no cartesian anywhere")
  }

  test("q244: the merge chain folds in as literals — no join anywhere " +
      "in the fertility rollup") {
    val df = SparkEntry.queries("q244_tokenizer_fertility")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"),
      s"stored merges must apply as plan literals:\n${p.take(1200)}")
    assert(p.contains("partial_sum"), "token counters must combine map-side")
  }

  test("q245: the Luhn screen is map-only — no join, no window; " +
      "counters combine map-side") {
    val df = SparkEntry.queries("q245_luhn_screen")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), s"no join:\n${p.take(1200)}")
    assert(!p.contains("Window"), "no window")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "counters must combine map-side")
  }

  test("q247: part language-ID is scan-local — no join; consistency " +
      "counters combine map-side") {
    val df = SparkEntry.queries("q247_mixed_lang_audit")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"), s"no join:\n${p.take(1200)}")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "consistency counters must combine map-side")
  }

  test("q249: the remix's two scalar-total joins broadcast — never " +
      "sort-merge") {
    val df = SparkEntry.queries("q249_budget_remix")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"scalar totals must broadcast:\n${p.take(1500)}")
    assert(p.contains("partial_sum"), "token counters must combine map-side")
  }

  test("q250: the per-language doc totals broadcast onto the df rollup") {
    val df = SparkEntry.queries("q250_stopword_discovery")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤ langs-row dim must broadcast:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "no cartesian")
  }

  test("q246: phrase excision is ONE corpus pass — a single parquet " +
      "scan, no join, no aggregate exchange") {
    val df = SparkEntry.queries("q246_phrase_excise")(spark, dir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("Join"),
      s"the phrase list must fold in as literals:\n${p.take(1200)}")
    assert(!p.contains("Window"), "no window")
    assert(p.split("Scan parquet").length - 1 === 1,
      s"exactly one corpus scan:\n${p.take(1200)}")
  }

  test("r15 media chains: q300's collapse pipeline and the takedown " +
      "probes shuffle only ids and hashes — no Exchange carries a " +
      "payload, no cartesian anywhere") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import spark.implicits._
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    def assertClean(name: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      val exchanges = flatten(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeLike => e }
      exchanges.foreach { e =>
        val cols = e.child.output.map(_.name.toLowerCase)
        assert(!cols.exists(_.contains("payload")),
          s"$name: an Exchange would shuffle media payloads: $cols")
      }
      assert(!df.queryExecution.sparkPlan.toString
        .contains("CartesianProduct"), name)
    }
    assertClean("q300_video_clusters",
      SparkEntry.queries("q300_video_clusters")(spark, dir))
    // the takedown probes: payloads are consumed inside the scan-local
    // decode; everything that crosses an Exchange is (id, hash) rows
    val n = 2400
    val wav = graft.ops.Audio.encodeWavSamples(
      graft.ops.Audio.clickTrain(10L, n), 16000)
    val batch = Seq((1L, wav)).toDF("doc_id", "payload")
    val envIdx = graft.streaming.AudioDedupGate.buildIndex(Seq(
        (9L, graft.ops.Audio.envelopeHash(9L, wav)))
      .toDF("hist_id", "fp"))
    assertClean("audio takedown probe",
      graft.streaming.AudioDedupGate.batchMatches(spark, batch, envIdx,
        maxHamming = 4))
    val lmIdx = graft.streaming.LandmarkTakedownGate.buildIndex(
      graft.ops.Audio.landmarkHashes(9L, wav, 256, 0).distinct
        .map(h => (9L, h)).toDF("takedown_id", "h"))
    assertClean("landmark takedown probe",
      graft.streaming.LandmarkTakedownGate.batchMatches(spark, batch,
        lmIdx, voteT = 6L, deltaQ = 0))
    val clip = graft.ops.Video.encodeY4mBlockScenes(18L, 16, 8, 4, 4, 0L)
    val vIdx = graft.streaming.VideoDedupGate.buildIndex(
      graft.ops.Video.sceneKeyframeHashes(9L, clip, 48)
        .map(k => (9L, k.kf_hash)).toDF("hist_id", "kf_hash"))
    assertClean("video takedown probe",
      graft.streaming.VideoDedupGate.batchMatches(spark,
        Seq((1L, clip)).toDF("doc_id", "payload"), vIdx))
  }
}
