package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.LongDot
import graft.functions.{QuantizedCentroid, TextFns, TopK}
import graft.ops.{Audio, Video, Bfs, Blooms, Bpe, Cardinality, CharLm, Classifier, Cogrouped, Contamination, Dedup, DedupClusters, DenseId, Drift, Dsir, FreqSketch, FuzzyJoin, GapFill, JoinEstimate, KCenter, KCore, KMeans, Mixing, ModelStore, Multimodal, NearDup, Nested, Packing, PageRank, ParagraphDedup, Paths, Percentiles, PhraseExcise, ProductQuant, Salting, Sampling, Scd, Selection, Sessionize, Sharding, SetSimJoin, Similarity, Skyline, Snm, SpanDedup, TableDiff, TCloseness, Triangles, Winnowing}
import graft.streaming.{BudgetAdmission, EventStream, IncrementalClusters, NearDupIndex, RateMonitor, SemanticDedupScreen, StatefulSessions, VersionedStore}

/** Gated-query surface, CURATION/GRAPH slice (split from the
  * original single-file TrainQueries): join diagnostics, graph
  * algorithms, curation screens, quality/privacy audits, packing/
  * sharding, early raster ops. See [[TrainQueries]].
  */
private[graft] object TrainQueriesCuration {
  import TrainQueriesCore._
  import TrainQueriesMedia._

  /** Join-size preflight (q154): predict |lineitem ⋈ lineitem on
    * l_partkey| EXACTLY before running it — Σ cnt(k)² over per-key
    * counts — the decision input for broadcast-vs-shuffle-vs-salt on a
    * self-join that can explode quadratically on a hot key. The
    * prediction pass shuffles only (key, cnt) pairs (metadata scale,
    * partial-agg combined) while the join it predicts shuffles data
    * scale; the query then RUNS the count-only join and emits both, so
    * green proves the preflight is exact, not an estimate. Top key by
    * `max(struct(cnt, key))` — one more map-side aggregate, no sort.
    */
  private[graft] def qJoinPreflight(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_partkey"))
    val perKey = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val pred = perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt") * col("cnt")).as("predicted_rows"),
      max(struct(col("cnt"), col("l_partkey"))).as("__top"))
      .select(col("n_keys"), col("predicted_rows"),
        col("__top.l_partkey").as("top_key"),
        col("__top.cnt").as("top_key_rows"))
    val actual = li.as("a").join(li.as("b"), "l_partkey")
      .agg(count(lit(1)).as("actual_rows"))
    pred.crossJoin(broadcast(actual)) // both sides are ONE row
  }

  /** Shuffle-key skew profile (q155): the pre-shuffle diagnostic that
    * decides whether a key needs salting (E16) before it becomes a
    * straggler — per candidate key column: row/key counts, the top
    * key's share in basis points, and max-over-mean occupancy ×100.
    * Pure integer arithmetic (shares as `div` basis points — no float
    * Σ), one partial-agg pass per column over (key, cnt) pairs; the
    * two profiles union into one report. At 100 TB this is the cheap
    * scan you run BEFORE committing to a join strategy, not after the
    * straggler appears.
    */
  private[graft] def qKeySkewProfile(s: SparkSession, dir: String): DataFrame = {
    def profile(c: String): DataFrame =
      t(s, dir, "lineitem").select(col(c).as("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").as("__n"), count(lit(1)).as("n_keys"),
          max("cnt").as("__top"))
        .select(lit(c).as("key_col"), col("__n").as("n_rows"),
          col("n_keys"),
          expr("(__top * 10000) div __n").as("top1_share_bp"),
          expr("(__top * n_keys * 100) div __n").as("max_over_mean_x100"))
    profile("l_partkey").unionByName(profile("l_suppkey"))
      .orderBy("key_col")
  }

  /** One referential-integrity edge for q156: child FK column vs
    * parent PK — ONE (key, cnt) shuffle per edge via a full-outer join
    * of per-key child counts against the parent key set, from which
    * all four audit numbers fall out in a single aggregate (orphan
    * child rows, unreferenced parents, totals). Never materializes a
    * row-level join.
    */
  private[graft] def fkEdge(name: String, child: DataFrame, ck: String,
      parent: DataFrame, pk: String): DataFrame = {
    val c = child.groupBy(col(ck).as("__k")).agg(count(lit(1)).as("__c"))
    val p = parent.select(col(pk).as("__p"))
    c.join(p, col("__k") === col("__p"), "full_outer")
      .agg(
        coalesce(sum("__c"), lit(0L)).as("n_child_rows"),
        coalesce(sum(when(col("__p").isNull, col("__c"))), lit(0L))
          .as("n_orphan_rows"),
        count(col("__p")).as("n_parents"),
        coalesce(sum(when(col("__c").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_unref_parents"))
      .select(lit(name).as("edge"), col("n_child_rows"),
        col("n_orphan_rows"), col("n_parents"), col("n_unref_parents"))
  }

  /** Referential-integrity audit (q156): the data-quality pass a
    * multi-table corpus runs before every release — per FK edge, how
    * many child rows dangle and how many parent keys go unreferenced.
    * Each edge costs one (key, cnt)-sized shuffle (see [[fkEdge]]);
    * a clean report (zero orphans) is the deliverable, and the
    * mechanism is what the oracle proves.
    */
  private[graft] def qFkAudit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    fkEdge("customer.c_nationkey->nation", t(s, dir, "customer"),
        "c_nationkey", t(s, dir, "nation"), "n_nationkey")
      .unionByName(fkEdge("lineitem.l_orderkey->orders", li,
        "l_orderkey", o, "o_orderkey"))
      .unionByName(fkEdge("lineitem.l_suppkey->supplier", li,
        "l_suppkey", t(s, dir, "supplier"), "s_suppkey"))
      .unionByName(fkEdge("orders.o_custkey->customer", o,
        "o_custkey", t(s, dir, "customer"), "c_custkey"))
      .orderBy("edge")
  }

  /** Exact small-domain distinct sets as integer bitmasks (q157): each
    * user's SET of event types folded to one int64 via
    * `bit_or(1 << ordinal)` — 8 bytes of aggregate state per user
    * regardless of activity volume, where `collect_set` state grows
    * with set size and approx_count_distinct is approximate. The
    * ordinal dictionary is the sorted distinct domain (metadata-sized,
    * broadcast); masks then profile into (mask, popcount, n_users) —
    * the exact behavioral-segment histogram. All integer, fully
    * partial-aggregated. Scoped per (user, UTC day) so the histogram
    * profiles daily behavior mixes, not the all-time saturated set.
    */
  private[graft] def qBitsetDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
    val dict = DenseId.withDenseId(
        ev.select("event_type").distinct(), "__id",
        col("event_type").asc)
      .withColumn("__ord", (col("__id") - 1L).cast("int"))
      .select("event_type", "__ord")
    ev.join(broadcast(dict), "event_type")
      .withColumn("__bit", expr("shiftleft(cast(1 as bigint), __ord)"))
      .groupBy("user_id", "day")
      .agg(expr("bit_or(__bit)").as("type_mask"))
      .groupBy("type_mask").agg(count(lit(1)).as("n_user_days"))
      .withColumn("n_types", expr("cast(bit_count(type_mask) as bigint)"))
      .select("type_mask", "n_types", "n_user_days")
      .orderBy("type_mask")
  }

  /** Run-length event collapse (q158) — the gaps-and-islands member of
    * the window family: consecutive same-type events per user collapse
    * into runs via the rn − rn_per_type difference (two per-user
    * windows, frames bounded by one user's stream), profiled as
    * (event_type, run_len) → n_runs. The op behind repeated-ping
    * dedup and burst detection; output stays bounded by the run-length
    * distribution, not the event volume.
    */
  private[graft] def qEventRuns(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    val wt = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__rnt", row_number().over(wt))
      .withColumn("__grp", col("__rn") - col("__rnt"))
      .groupBy("user_id", "event_type", "__grp")
      .agg(count(lit(1)).as("run_len"))
      .groupBy("event_type", "run_len")
      .agg(count(lit(1)).as("n_runs"))
      .orderBy("event_type", "run_len")
  }

  /** Time-weighted average (q159): the telemetry aggregate a plain
    * mean gets wrong — each reading weighted by how long it HELD
    * (until the user's next event), so sparse-but-stable readings
    * aren't drowned by bursts. Durations from one per-user lead
    * window; values milli-quantized via floor(v·1000) (floor-then-cast
    * is portable — a bare double→int cast truncates in Spark but
    * rounds in DuckDB), then pure int64 Σ(vq·dur) div Σdur per
    * event type. Overflow headroom: vq ≤ 5.6·10⁵ here and Σdur ≤
    * users × span, so the weighted sum stays < 2⁶³ up to ~10⁴ user-
    * years of held readings per type; at larger scales drop to
    * centi-quantization or per-partition DECIMAL.
    */
  private[graft] def qTimeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("__dur", lead("ts_ms", 1).over(w) - col("ts_ms"))
      .filter(col("__dur").isNotNull)
      .withColumn("__vq", expr("cast(floor(value * 1000d) as bigint)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_held"),
        sum("__dur").as("total_held_ms"),
        sum(col("__vq") * col("__dur")).as("__wsum"))
      .withColumn("twap_mq", expr("__wsum div total_held_ms"))
      .select("event_type", "n_held", "total_held_ms", "twap_mq")
      .orderBy("event_type")
  }

  /** CDC merge with tombstones (q160): apply a change feed of upserts
    * AND deletes to a stored snapshot in one pass — the maintenance
    * primitive behind every incrementally-maintained corpus table
    * (q77's upsert handles inserts/updates; deletes need the
    * tombstone leg). One full-outer join on the key decides each row:
    * feed delete → drop, feed upsert → new image, untouched → keep.
    * The feed is deterministic synthetic CDC over orders (high keys
    * re-priced +10%, every third of them tombstoned). Money travels as
    * floor-quantized int64 cents (floor-then-cast is the portable
    * quantization; the +10% re-price is exact integer cents × 110
    * div 100), so the post-merge per-status audit sums are
    * order-independent and engine-exact.
    */
  private[graft] def qCdcMerge(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("cast(floor(o_totalprice * 100d) as bigint)").as("cents"))
    val snapshot = o.filter(col("o_orderkey") % 10 < 8)
    val feed = o.filter(col("o_orderkey") % 10 >= 6)
      .withColumn("__op",
        when(col("o_orderkey") % 3 === 0, lit("D")).otherwise(lit("U")))
      .withColumn("cents", expr("(cents * 110) div 100"))
    val merged = snapshot.as("s")
      .join(feed.as("f"), Seq("o_orderkey"), "full_outer")
      .filter(coalesce(col("f.__op"), lit("K")) =!= "D")
      .select(col("o_orderkey"),
        coalesce(col("f.o_orderstatus"), col("s.o_orderstatus"))
          .as("o_orderstatus"),
        coalesce(col("f.cents"), col("s.cents")).as("cents"))
    merged.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        sum("cents").as("total_cents"))
      .orderBy("o_orderstatus")
  }

  /** Point-in-time dimension join (q161) — the leakage-safe feature
    * lookup every ML feature store must get right: each purchase event
    * joined to the user's tier (floor(value/100) of their last
    * STATE-SETTING event — click/view/signup — STRICTLY before the
    * purchase; the purchase itself must not update the state it reads,
    * and same-millisecond states don't apply). Implemented as the
    * scalable union-carry-forward: state rows and fact rows merge into
    * one per-user window ordered (ms, fact-before-state-on-ties,
    * event_id) and `last(tier, ignoreNulls)` carries the state — NO
    * interval/range join, no per-version fan-out. The oracle computes
    * the SAME semantics the STRUCTURALLY OPPOSITE way (explicit
    * validity intervals via lead + a from < ts ≤ to range join), so
    * green proves carry-forward ≡ interval containment, boundary and
    * zero-length-version cases included. Purchases before any state
    * get tier −1.
    */
  private[graft] def qPitJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("ms"))
    val state = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ms"), col("event_id"),
        lit(0).as("__is_fact"),
        expr("cast(floor(value / 100d) as bigint)").as("__tier"),
        lit(null).cast("long").as("__vq"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), col("event_id"),
        lit(1).as("__is_fact"),
        lit(null).cast("long").as("__tier"),
        expr("cast(floor(value * 1000d) as bigint)").as("__vq"))
    // facts sort BEFORE states at equal ms (desc on __is_fact) so a
    // same-ms state never reaches the purchase — the strict rule
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("__is_fact").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    state.unionByName(facts)
      .withColumn("tier",
        coalesce(last("__tier", ignoreNulls = true).over(w), lit(-1L)))
      .filter(col("__is_fact") === 1)
      .groupBy("tier")
      .agg(count(lit(1)).as("n_purchases"), sum("__vq").as("sum_vq"))
      .orderBy("tier")
  }

  /** Reciprocal-rank fusion (q162): combine two retrievers' rankings —
    * the standard score-free ensemble for heterogeneous retrieval
    * (here: a length prior vs the quality heuristic) — as
    * Σ 10⁶ div (60 + rank) over each list's top-20, integer-exact
    * (the float 1/(60+r) sum is order-dependent; the scaled `div`
    * form is portable). Each top-20 comes from TakeOrderedAndProject
    * (no global sort); ranking within 20 rows is metadata-sized.
    */
  private[graft] def qRrfFusion(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("__toks", split(col("text"), " "))
      .select(col("doc_id"), col("n_chars"),
        graft.functions.TextFns.qualityScore("text", "__toks")
          .as("__q"))
    def top20(ord: org.apache.spark.sql.Column*): DataFrame = {
      val w = Window.orderBy(ord: _*)
      docs.orderBy(ord: _*).limit(20)
        .withColumn("rank", row_number().over(w))
        .withColumn("rrf", expr("1000000 div (60 + rank)"))
        .select(col("doc_id"), col("rrf"))
    }
    val byLen = top20(col("n_chars").desc, col("doc_id").asc)
    val byQuality = top20(col("__q").desc, col("doc_id").asc)
    byLen.unionByName(byQuality)
      .groupBy("doc_id").agg(sum("rrf").as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(10)
  }

  /** Dynamic partition pruning (q163): the mechanism that makes a
    * day-partitioned 100 TB fact table affordable to query by a
    * RUNTIME-computed key set — here the 5 busiest purchase days,
    * unknowable at plan time, computed from the raw feed and
    * broadcast; Catalyst injects a `dynamicpruningexpression` on the
    * fact scan so only those 5 of ~30 day-partitions are read at all
    * (PlanSpec-asserted on the executed plan). Like q41, the "query"
    * time includes writing the partitioned table every run — that is
    * the demonstration's setup cost, documented in BASELINE.md.
    */
  private[graft] def qDynamicPruning(s: SparkSession, dir: String): DataFrame = {
    val uid = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
    val tb = s"graft_dpp_ev_$uid"
    t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"),
        expr("cast(floor(value * 1000d) as bigint)").as("vq"))
      .write.mode("overwrite").format("parquet")
      .partitionBy("day").saveAsTable(tb)
    val facts = s.table(tb)
    val busiest = t(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("day").asc)
      .limit(5)
      .select("day")
    facts.join(broadcast(busiest), "day")
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"), sum("vq").as("sum_vq"))
      .orderBy("day")
  }

  /** Mergeable-sketch rollup (q164): the sketch ALGEBRA that makes
    * 100 TB observability affordable — per-day HLL sketches built
    * ONCE (`hll_sketch_agg`, KB-sized state), then weekly distincts
    * from `hll_union_agg` over the seven daily sketches WITHOUT
    * rescanning the week. The query proves the algebra in-engine (the
    * q112 discipline — DuckDB can't replay DataSketches): merged
    * estimate ≡ direct whole-week estimate (same lgK over the same
    * stream of distinct items, MEASURED: bit-identical while the
    * sketches stay in sparse mode — sf0.001/0.01 — and within 0.4%
    * once dense-mode unions round differently at sf0.1, asserted at
    * 1%) and the merged estimate within 3·rsd of the exact count;
    * the oracle replays exact counts and TRUE literals.
    */
  private[graft] def qSketchRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
    val daily = ev.groupBy("day")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("__sk"))
    val merged = daily
      .withColumn("week", expr("day div 7"))
      .groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_union_agg(__sk, true))")
        .as("__merged_est"))
    val direct = ev.withColumn("week", expr("day div 7"))
      .groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
          .as("__direct_est"),
        count_distinct(col("user_id")).as("exact_users"))
    direct.join(merged, "week")
      // 3·rsd for lgK=12 ≈ 4.9% — the published HLL bound
      .withColumn("merge_within_1pct",
        abs(col("__merged_est") - col("__direct_est")) * 100 <=
          col("__direct_est"))
      .withColumn("within_3rsd",
        abs(col("__merged_est") - col("exact_users")) * 1000 <=
          col("exact_users") * 49)
      .select("week", "exact_users", "merge_within_1pct", "within_3rsd")
      .orderBy("week")
  }

  /** Multiset set-ops (q165): EXCEPT ALL / INTERSECT ALL — the
    * §2.5 members q15's distinct-set forms don't cover (multiplicity
    * matters: "remove ONE occurrence per match", the bag semantics
    * dedup ledgers need). Spark plans both as aggregate+generate over
    * per-row counts — no join explosion; profiled per event_type to a
    * bounded report.
    */
  private[graft] def qSetopsAll(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val a = ev.filter(col("value") >= 100d).select("user_id", "event_type")
    val b = ev.filter(col("value") < 400d).select("user_id", "event_type")
    val ex = a.exceptAll(b).groupBy("event_type")
      .agg(count(lit(1)).as("n_except_all"))
    val in = a.intersectAll(b).groupBy("event_type")
      .agg(count(lit(1)).as("n_intersect_all"))
    ex.join(in, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("n_except_all"), lit(0L)).as("n_except_all"),
        coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"))
      .orderBy("event_type")
  }

  /** Bucket-pruned point lookup (q166): the read-side payoff of the
    * q41 bucketed layout — an equality filter on the bucket column
    * reads ONE of 8 bucket files (`SelectedBucketsCount: 1 out of 8`,
    * PlanSpec-asserted), the 100 TB difference between a point lookup
    * scanning 1/8th of the table and scanning all of it. The bucketed
    * table is built once per session (catalog-memoized), so trials
    * measure the pruned READ; the lookup key (max l_orderkey) is one
    * metadata-sized collect.
    */
  private[graft] def qBucketPruning(s: SparkSession, dir: String): DataFrame = {
    val uid = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
    val tb = s"graft_bktp_li_$uid"
    if (!s.catalog.tableExists(tb)) {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").saveAsTable(tb)
    }
    val key = t(s, dir, "lineitem").agg(max("l_orderkey")).head().getLong(0)
    s.table(tb).filter(col("l_orderkey") === key)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"),
        expr("sum(cast(floor(l_quantity * 100d) as bigint))")
          .as("qty_centi"))
  }

  /** Streaming native session windows (q167): see
    * [[EventStream.sessionWindowCounts]] — the engine-managed
    * counterpart of q35's custom-state sessionizer.
    */
  private[graft] def qStreamSessionWindow(s: SparkSession, dir: String): DataFrame =
    EventStream.sessionWindowCounts(s, s"$dir/events.parquet")

  /** Exchange reuse (q168): one shuffle feeds two consumers — the
    * per-(source, lang) aggregate is joined against its own re-
    * aggregation to per-source totals to emit each cell's share in
    * basis points. Catalyst plans the second consumer as a
    * `ReusedExchange` over the first's shuffle (PlanSpec-asserted):
    * at 100 TB the fact scan and its exchange run ONCE, not once per
    * consumer — the fan-out pattern every report-style query hits.
    * Shares are integer `div` basis points (no float Σ).
    */
  private[graft] def qExchangeReuse(s: SparkSession, dir: String): DataFrame = {
    val cell = t(s, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("n_docs"))
    val totals = cell.groupBy("source").agg(sum("n_docs").as("__tot"))
    cell.join(totals, "source")
      .withColumn("share_bp", expr("(n_docs * 10000) div __tot"))
      .select("source", "lang", "n_docs", "share_bp")
      .orderBy("source", "lang")
  }

  /** Incremental gap-free id assignment (q169): stable dense ids that
    * CONTINUE across ingests — history docs hold their ids and a new
    * batch gets max+1… in deterministic (hash, doc_id) order, the
    * id-authority pattern behind stable example ids across daily
    * crawls. Both phases are [[DenseId.withDenseId]] (count-then-
    * offset range exchange, no single-task window); the arrival phase
    * adds the stored max as a broadcast literal — per-ingest cost is
    * the batch's own sort, independent of corpus size. The oracle
    * replays both row_number phases and their concatenation.
    */
  private[graft] def qIncrementalIds(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      expr("""cast(conv(substring(md5(cast(doc_id as string)), 1, 8),
             16, 10) as bigint)""").as("__h"))
    val hist = docs.filter(col("doc_id") % 10 < 8)
    val arr = docs.filter(col("doc_id") % 10 >= 8)
    val histIds = DenseId.withDenseId(hist, "stable_id",
      col("__h").asc, col("doc_id").asc)
    val maxId = histIds.agg(max("stable_id")).head().getLong(0)
    val arrIds = DenseId.withDenseId(arr, "__rk",
        col("__h").asc, col("doc_id").asc)
      .withColumn("stable_id", col("__rk") + lit(maxId))
      .drop("__rk")
    histIds.withColumn("phase", lit("history"))
      .unionByName(arrIds.withColumn("phase", lit("arrival")))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"),
        min("stable_id").as("min_id"), max("stable_id").as("max_id"),
        sum("stable_id").as("id_sum"))
      .orderBy("phase")
  }

  /** Commutative set digests (q170): an order-independent corpus
    * fingerprint — `bit_xor` (and a checked sum) over per-row content
    * hashes — that updates in O(1) per ingest or delete: digest(full)
    * = digest(history) ⊕ digest(arrivals), and deleting a batch is
    * the same XOR applied again. This is the set-reconciliation trick
    * that lets two 100 TB replicas compare WITHOUT a row-level diff
    * (E79's TableDiff is the row-level escalation when digests
    * disagree). The query computes all three digests and asserts the
    * algebra in-engine; the sum variant's overflow caveat (int64
    * wraps differ from HUGEINT at extreme scale — prefer XOR there)
    * is why both are shown. Row hash covers doc_id AND content, so
    * moves, edits, and deletes all perturb it.
    */
  private[graft] def qSetDigest(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      // 32-bit row hashes: the SUM variant stays exact in int64 to
      // ~2^31 rows (XOR has no such bound — width-extend it at scale)
      .select(col("doc_id"), expr(
        """cast(conv(substring(md5(concat(cast(doc_id as string), ':',
          | md5(text))), 1, 8), 16, 10) as bigint)""".stripMargin)
        .as("__h"))
    def digest(df: DataFrame, tag: String): DataFrame =
      df.agg(count(lit(1)).as(s"n_$tag"),
        expr("bit_xor(__h)").as(s"xor_$tag"),
        sum("__h").as(s"sum_$tag"))
    val full = digest(d, "full")
    val hist = digest(d.filter(col("doc_id") % 10 < 8), "hist")
    val arr = digest(d.filter(col("doc_id") % 10 >= 8), "arr")
    full.crossJoin(broadcast(hist)).crossJoin(broadcast(arr))
      .select(col("n_full"), col("xor_full"), col("sum_full"),
        (expr("xor_hist ^ xor_arr") === col("xor_full"))
          .as("xor_composes"),
        (col("sum_hist") + col("sum_arr") === col("sum_full"))
          .as("sum_composes"),
        (expr("xor_full ^ xor_arr") === col("xor_hist"))
          .as("xor_deletes"))
  }

  /** Exact integer Gini coefficient (q171): inequality of user
    * engagement — the balance metric that tells a curation pass
    * whether a head of power users dominates the corpus the way E149
    * tells it a key dominates a shuffle. Fully rational arithmetic on
    * the sorted per-user counts: Gini = (2·Σ i·xᵢ − (n+1)·Σx) /
    * (n·Σx), emitted in milli-units via `div`. The rank comes from
    * the E26 count-then-offset range exchange (no global window) and
    * Σ i·xᵢ from one partial-agg pass — two linear passes at any
    * corpus size. Headroom: Σ i·xᵢ ≤ n²·max_count stays under 2⁶³
    * to ~10⁹ users at 10⁴ events each.
    */
  private[graft] def qGini(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events").groupBy("user_id")
      .agg(count(lit(1)).as("x"))
    val ranked = DenseId.withDenseId(counts, "i",
      col("x").asc, col("user_id").asc)
    ranked.agg(count(lit(1)).as("n_users"), sum("x").as("total_events"),
        sum(col("i") * col("x")).as("__ix"))
      .select(col("n_users"), col("total_events"),
        expr("""((2 * __ix - (n_users + 1) * total_events) * 1000)
               div (n_users * total_events)""").as("gini_milli"))
  }

  /** q172's stored deletion-variant index, built once per (session,
    * corpus) from the history suppliers (s_suppkey % 10 < 8).
    */
  private[graft] val fuzzyIndexCache = scala.collection.mutable.Map
    .empty[(String, String), String]

  private[graft] def fuzzyIndexArtifact(s: SparkSession, dir: String): String =
    sessionFixture(fuzzyIndexCache, s, dir) {
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val path = graft.Scratch.register(
        s"${System.getProperty("java.io.tmpdir")}/graft_fuzzy_idx_$tag")
      graft.streaming.FuzzyNameIndex.writeIndex(
        t(s, dir, "supplier").filter(col("s_suppkey") % 10 < 8),
        "s_name", path)
      path
    }

  /** Streaming fuzzy-name screen (q172,
    * [[graft.streaming.FuzzyNameIndex]]): arriving supplier names
    * (s_suppkey % 10 ≥ 8) probe the STORED deletion-variant index of
    * history names per micro-batch — candidates only where variant
    * keys collide, one `levenshtein` verify each, matches appended
    * replay-safely. The oracle is the full O(|A|·|H|) levenshtein
    * join, so green proves the streamed index loses no true pair.
    */
  private[graft] def qStreamFuzzyNames(s: SparkSession, dir: String): DataFrame =
    graft.streaming.FuzzyNameIndex.run(s, s"$dir/supplier.parquet",
      "s_name", fuzzyIndexArtifact(s, dir),
      arrivalFilter = col("s_suppkey") % 10 >= 8, chunks = 3)

  /** Multi-source BFS hop distances (q173, [[graft.ops.Bfs]]): hop
    * levels from the nation-0 customers over the symmetrized
    * customer–supplier purchase graph (q118's edge construction) —
    * the "within k hops of a trusted seed set" curation filter, with
    * unreached nodes reported as level −1. Per-round cost is
    * frontier-sized (one equi-join + one distinct shuffle + one
    * anti-join against node-sized state), exact integers throughout,
    * and the per-level (count, key-checksum, customer-count) digest
    * the oracle replays is ordering-free.
    */
  private[graft] def qBfsLevels(s: SparkSession, dir: String): DataFrame = {
    val half = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = edges.select(col("src").as("node")).distinct()
    val seeds = nodes.join(
      t(s, dir, "customer").filter(col("c_nationkey") === 0)
        .select((col("c_custkey") * 2).as("node")), Seq("node"))
    val lv = Bfs.levels(edges, "src", "dst", seeds, "node", 3)
    nodes.join(lv, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("level"), lit(-1L)).as("level"))
      .groupBy("level")
      .agg(count(lit(1)).as("n_nodes"),
        sum(expr("node div 2")).as("key_sum"),
        sum(when(col("node") % 2 === 0, 1L).otherwise(0L))
          .as("n_customers"))
      .orderBy("level")
  }

  /** Pareto-frontier document selection (q174,
    * [[graft.ops.Skyline]]): the maximal (token count, lexical
    * diversity) frontier over the corpus — no frontier doc is beaten
    * on BOTH axes by any other, so it is exactly what a
    * Pareto-optimal curation pass may keep without committing to a
    * weighting. Diversity is distinct-token share in integer basis
    * points (`div`); the two-phase partition-skyline shape cuts the
    * corpus to frontier-sized candidates scan-locally before the one
    * metadata-sized merge sweep. The oracle is the O(m²) NOT-EXISTS
    * dominance definition over distinct metric pairs — green proves
    * the two-phase sweep IS the frontier.
    */
  private[graft] def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("x"),
        expr("(cast(size(array_distinct(__t)) as bigint) * 10000)"
          + " div size(__t)").as("y"))
    Skyline.skyline2d(m, "x", "y")
      .join(m.groupBy("x", "y").agg(count(lit(1)).as("n_docs")),
        Seq("x", "y"))
      .select(col("x").as("n_tok"), col("y").as("uniq_bp"),
        col("n_docs"))
      .orderBy(col("n_tok").desc)
  }

  /** Sorted-neighborhood record-linkage screen (q175,
    * [[graft.ops.Snm]]): customers sorted by name, each compared to
    * its 3 successors only — candidate volume EXACTLY n·w − w(w+1)/2
    * (replayed by the oracle), with one codegen'd `levenshtein`
    * verify per candidate. The sort-based blocking family beside the
    * engine's hash families (bands q25, blocks q27, deletion index
    * q146): rank is the E26 range exchange, the window predicate an
    * equi-join on exploded successor ranks — no inequality join, no
    * hot buckets, at any corpus size.
    */
  private[graft] def qSnmDedup(s: SparkSession, dir: String): DataFrame = {
    val cand = Snm.candidates(
      t(s, dir, "customer").select("c_custkey", "c_name"),
      "c_custkey", "c_name", 3).transform(snap)
    val m = cand.filter(levenshtein(col("key_a"), col("key_b")) <= 1)
      .agg(count(lit(1)).as("n_matches"),
        coalesce(sum("id_a"), lit(0L)).as("sum_a"),
        coalesce(sum("id_b"), lit(0L)).as("sum_b"))
    cand.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(broadcast(m))
  }

  /** Bounded per-group top-k (q176, [[graft.functions.TopK]]): each
    * supplier's 3 highest-revenue line items via a typed Aggregator
    * whose state is capped at k entries — map-side partials cut the
    * shuffle to k·|groups| rows and a skewed group costs k per
    * partition, not its row count (the window row_number form the
    * oracle replays pays the full sort). Revenue in exact integer
    * cents (DECIMAL before the cast); (score desc, id asc) total
    * order makes the arrays deterministic.
    */
  private[graft] def qTopKAgg(s: SparkSession, dir: String): DataFrame = {
    val tk = TopK.topK(3)
    t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        expr("cast(cast(l_extendedprice as decimal(18,2)) * 100"
          + " as bigint)").as("cents"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("lid"))
      .groupBy("l_suppkey")
      .agg(tk(col("cents"), col("lid")).as("top"))
      .select(col("l_suppkey"), posexplode(col("top")))
      .select(col("l_suppkey"), (col("pos") + 1).cast("long").as("rank"),
        col("col.score").as("cents"), col("col.id").as("item_id"))
      .orderBy("l_suppkey", "rank")
  }

  /** Skip-gram co-occurrence pair extraction (q177) — the
    * word-embedding training-data construction step (word2vec-style
    * context pairs, PMI/collocation numerators): for every token, its
    * co-occurrences within a ±2 window, counted as unordered
    * (least, greatest) pairs. Pair generation is SCAN-LOCAL — one
    * nested `transform` + `flatten` over the token array inside the
    * projection, so the fanout (n_tokens × window) materializes after
    * the scan with ZERO joins and nothing but (w1, w2) pairs ever
    * shuffles (one partial-agg); top-30 is TakeOrderedAndProject
    * under the full (n desc, w1, w2) tiebreak, never a global sort.
    * The oracle generates the same pairs the structurally opposite
    * way — a positional self-join on unnested (doc, ord) tokens — so
    * green proves the scan-local expression ≡ the join definition.
    */
  private[graft] def skipgramPairCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(split(col("text"), " ").as("toks"))
      .select(explode(expr(
        """flatten(transform(toks, (t, i) ->
          |  transform(slice(toks, i + 2, 2),
          |    c -> struct(least(t, c) as w1, greatest(t, c) as w2))))"""
          .stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_cooc"))

  private[graft] def qSkipgramPairs(s: SparkSession, dir: String): DataFrame =
    skipgramPairCounts(s, dir)
      .orderBy(col("n_cooc").desc, col("w1"), col("w2"))
      .limit(30)

  /** PMI-ordered collocation ranking (q215) — the collocation-strength
    * step on top of q177's co-occurrence numerators (word2vec/PMI
    * consumers rank by p(xy)/(p(x)·p(y)), not raw counts, or frequent
    * words dominate): the ordering is preserved EXACTLY without logs
    * or doubles by the staged integer form
    * pmi_q = ((n_cooc·2^20) div c1 · N_tok) div c2 — n_cooc ≤ 4·c1
    * (each w1 occurrence contributes ≤ 4 window pairs) bounds the
    * first stage at 4·2^20, so the product stays in int64 up to
    * ~2·10^12 corpus tokens; a larger corpus rebases the 2^20. Rare
    * pairs (n_cooc < 5) are floored out first — the standard PMI
    * noise guard, and it keeps truncation meaningful. Vocabulary-sized
    * unigram tables BROADCAST onto the pair counts; top-30 is
    * TakeOrderedAndProject under the full (pmi_q, w1, w2) tiebreak.
    */
  private[graft] def qPmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val uni = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val nTok = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(count(lit(1)).as("n_tok"))
    skipgramPairCounts(s, dir)
      .filter(col("n_cooc") >= 5)
      .join(broadcast(uni.select(col("w").as("w1"), col("cw").as("c1"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cw").as("c2"))),
        Seq("w2"))
      .crossJoin(broadcast(nTok))
      .withColumn("pmi_q",
        expr("(((n_cooc * 1048576L) div c1) * n_tok) div c2"))
      .select("w1", "w2", "n_cooc", "c1", "c2", "pmi_q")
      .orderBy(col("pmi_q").desc, col("w1"), col("w2"))
      .limit(30)
  }

  /** Near-dup component-size histogram (q216) — the "how big are my
    * duplicate clusters" report every dedup run is judged by before
    * choosing keep-rules: sizes of the stored [[fullClusterLabels]]
    * components (metadata-sized group-by over node labels) plus the
    * singleton row (docs in no pair are their own components —
    * counted from two driver-side metadata counts, never a join).
    * The oracle recomputes the closure from scratch (RECURSIVE CTE)
    * and histograms it, so the stored labels are re-proved in the
    * same query that consumes them.
    */
  private[graft] def qClusterSizes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val labels = fullClusterLabels(s, dir)
    val singletons =
      t(s, dir, "documents").count() - labels.count()
    labels
      .groupBy("cluster_rep").agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").cast("long").as("component_size"))
      .agg(count(lit(1)).as("n_components"))
      .unionByName(Seq((1L, singletons)).toDF(
        "component_size", "n_components"))
      .orderBy("component_size")
  }

  /** Bounded-hop weighted shortest distances (q178,
    * [[graft.ops.Paths]]): min-plus Bellman–Ford over the symmetrized
    * customer–supplier purchase graph with exact integer edge weights
    * (floor(min quantity) per partnership — "cheapest connection"),
    * from the nation-0 customer seed set, capped at 4 relaxation
    * rounds — the trust/affinity-distance filter where q173's BFS
    * counts hops but THIS weighs them (the cheapest 3-edge route can
    * beat a direct edge). Delta relaxation keeps per-round cost
    * frontier-sized; the per-distance digest (count, key checksum,
    * customer count; −1 = unreached) is ordering-free, and the oracle
    * unrolls the same 4 rounds as union+min CTEs — green proves delta
    * relaxation ≡ full Bellman–Ford at equal depth.
    */
  private[graft] def qWeightedPaths(s: SparkSession, dir: String): DataFrame = {
    val half = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(floor(min(col("l_quantity"))).cast("long").as("w"))
    val edges = half.union(
      half.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val nodes = edges.select(col("src").as("node")).distinct()
    val seeds = nodes.join(
      t(s, dir, "customer").filter(col("c_nationkey") === 0)
        .select((col("c_custkey") * 2).as("node")), Seq("node"))
    val dist = Paths.boundedDistances(edges, "src", "dst", "w",
      seeds, "node", 4)
    nodes.join(dist, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
      .groupBy("dist")
      .agg(count(lit(1)).as("n_nodes"),
        sum(expr("node div 2")).as("key_sum"),
        sum(when(col("node") % 2 === 0, 1L).otherwise(0L))
          .as("n_customers"))
      .orderBy("dist")
  }

  /** Seasonal-baseline anomaly detection (q179) — the observability
    * pass q126's EWMA can't express: traffic with a DAILY SHAPE
    * (quiet 4am, busy 6pm) needs each (type, day, hour) cell judged
    * against its OWN seasonal slot — the (type, hour-of-day) lower
    * median over the observed days — not against the trailing rate.
    * Cells deviating ≥ 25% from their slot baseline are flagged with
    * the deviation in basis points. All integer: the lower median is
    * an exact rank pick (rn = (n+1) div 2 over the slot's day-counts,
    * full (n, day) tiebreak), deviation is abs-then-div so no
    * engine's negative-integer-division convention is ever in play
    * (both truncate — q181 measured it — but signed div in a
    * portability surface is a hazard, not a dependency to take);
    * the slot windows partition by (type,
    * hour) — 120 metadata-sized partitions of ≤ n_days cells each,
    * never an event-scale frame. Observed cells only (an absent
    * (day, hour) is silence, not a zero sample) — documented.
    */
  private[graft] def qSeasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    val cells = t(s, dir, "events")
      .groupBy(col("event_type"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("day"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type", "hr")
    val ranked = cells
      .withColumn("__rn", row_number().over(
        w.orderBy(col("n_events"), col("day"))))
      .withColumn("__nc", count(lit(1)).over(w))
    val med = ranked
      .filter(col("__rn") === expr("(__nc + 1L) div 2L"))
      .select(col("event_type"), col("hr"),
        col("n_events").as("med_baseline"))
    cells.join(med, Seq("event_type", "hr"))
      .withColumn("dev_bp",
        expr("abs(n_events - med_baseline) * 10000L div med_baseline"))
      .filter(col("dev_bp") >= 2500)
      .select(col("event_type"), col("day"), col("hr"),
        col("n_events"), col("med_baseline"), col("dev_bp"),
        (col("n_events") > col("med_baseline")).as("above"))
      .orderBy("event_type", "day", "hr")
  }

  /** Greedy k-center diversity selection (q180,
    * [[graft.ops.KCenter]]): 5 maximally-spread exemplars over the
    * quantized embeddings via Gonzalez's farthest-point sweep (a
    * 2-approximation of the optimal k-center radius), plus the
    * coverage-reporter row whose d² IS the achieved radius. Each
    * round is one scan-local running-min update against the newest
    * center (a plan literal, the q97 discipline) and one max(struct)
    * partial-agg — k linear scans total, the base never shuffled or
    * self-joined. The oracle unrolls the same 5 rounds in SQL over
    * the shared quantized CTE — green proves the running-min sweep ≡
    * the min-over-selected-set definition, argmax tiebreaks included.
    */
  private[graft] def qKCenter(s: SparkSession, dir: String): DataFrame =
    KCenter.select(
      Similarity.prepare(t(s, dir, "embeddings"), "embedding"),
      "vec_id", 5)

  /** Embedding-space class-separation audit (q181) — the labeled-data
    * health check run before training a classifier on an embedding
    * column: per label, the exact integer centroid (the KMeans update
    * rule: floor-divided per-dimension sums), the intra-class mean
    * squared distance, the nearest OTHER centroid, and the
    * separation ratio in basis points — a label whose nearest foreign
    * centroid sits closer than its own spread (sep_bp low) is
    * mislabeled or unlearnable. One (label, dim) partial-agg pass
    * builds all centroids (metadata-sized: |labels|×64 rows collected
    * like a range partitioner's boundaries); per-vector distance to
    * the OWN centroid is scan-local against label-dispatched plan
    * literals (one codegen'd [[graft.expressions.LongDot]] dot per
    * row); inter-centroid geometry is pure driver arithmetic over the
    * |labels|² metadata. Centroid division TRUNCATES toward zero on
    * both sides (Scala `/`, DuckDB `//` — measured: −4165 // 43 =
    * −96, not the floor −97), the one place a per-dimension sum goes
    * negative — so the replay is bit-identical.
    */
  private[graft] def qClassSeparation(s: SparkSession, dir: String): DataFrame = {
    val prep = Similarity.prepare(t(s, dir, "embeddings"), "embedding")
      .select(col("label").cast("long").as("label"), col("qv"),
        col("qn"))
    val cent = prep
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .collect()
      .groupBy(_.getAs[Long]("label"))
      .map { case (l, rows) =>
        val dims = rows.map(r => r.getAs[Int]("pos") ->
          r.getAs[Long]("s") / r.getAs[Long]("n"))
          .sortBy(_._1).map(_._2)
        l -> dims
      }
    val labels = cent.keys.toSeq.sorted
    // Per-vector d² to the OWN centroid: label-dispatched literals.
    val own = labels.foldLeft(lit(null).cast("long")) { (acc, l) =>
      val c = cent(l)
      val cn = c.map(x => x * x).sum
      when(col("label") === l,
        col("qn") - lit(2L) * LongDot.dot(typedLit(c.toSeq), col("qv"))
          + lit(cn)).otherwise(acc)
    }
    val intra = prep.withColumn("__d2", own)
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(__d2) div count(1)").as("intra_msd"))
    // Nearest foreign centroid: |labels|² pure driver arithmetic.
    val nn = labels.map { l =>
      val best = labels.filter(_ != l).map { m =>
        val d = cent(l).zip(cent(m))
          .map { case (a, b) => (a - b) * (a - b) }.sum
        (d, m)
      }.min
      (l, best._2, best._1)
    }
    val nnDf = s.createDataFrame(nn).toDF("label", "nn_label", "nn_d2")
    intra.join(nnDf, "label")
      .withColumn("sep_bp",
        expr("nn_d2 * 10000L div greatest(intra_msd, 1L)"))
      .orderBy("label")
  }

  /** Interval-union coverage (q182) — the gaps-and-islands member
    * q158 (same-type run collapse) and q83 (gap sessionization) don't
    * cover: each event projects a 5-minute attention interval and the
    * question is each user's UNION length — overlapping intervals
    * must not double-count (a plain SUM of durations overstates
    * exactly where activity is densest). The classic running-max
    * sweep: an interval opens a new island iff its start exceeds the
    * running max end of everything earlier (one per-user lag-frame
    * window, bounded by the user's stream), islands aggregate to
    * (min start, max end), coverage = Σ island lengths. All integer
    * milliseconds under the full (start, event_id) tiebreak, so the
    * DuckDB window replay is exact.
    */
  private[graft] def qIntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    val horizon = 300000L // 5 min
    val iv = t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("s_ms"))
      .withColumn("e_ms", col("s_ms") + horizon)
    val w = Window.partitionBy("user_id")
      .orderBy(col("s_ms"), col("event_id"))
    val isl = iv
      .withColumn("__pmax",
        max("e_ms").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("s_ms") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    isl.groupBy("user_id", "island")
      .agg(count(lit(1)).as("__n"), min("s_ms").as("__is"),
        max("e_ms").as("__ie"))
      .groupBy("user_id")
      .agg(sum("__n").as("n_events"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered_ms"))
      .orderBy("user_id")
  }

  /** Cross-source duplication matrix (q183) — the curation instrument
    * behind "which sources copy which": for every source pair, the
    * number of duplicate 20-token-paragraph DOC PAIRS and the number
    * of distinct shared paragraphs (diagonal = intra-source
    * duplication). The counting is pure ALGEBRA, never a doc-pair
    * materialization: per (paragraph-hash, source) occurrence counts
    * c (32-byte keys, one partial-agg), then per-hash source-pair
    * products c_a·c_b (same source: c(c−1)/2) — per-hash join fanout
    * is bounded by |sources|², NOT occurrences², so a boilerplate
    * paragraph in a thousand docs costs |sources|² rows where the
    * naive pair join pays 10⁶. The oracle IS that naive O(pairs)
    * doc-pair join — green proves the counting algebra ≡ pair
    * materialization.
    */
  private[graft] def qCrossSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val np = ParagraphDedup.paragraphs(docs, "doc_id", "text", 20)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source"), md5(graft.expressions.UnicodeNormalize.nfc(col("para"))).as("ph"))
      .distinct()
    val g = np.groupBy("ph", "source").agg(count(lit(1)).as("c"))
    val a = g.select(col("ph"), col("source").as("sa"), col("c").as("ca"))
    val b = g.select(col("ph"), col("source").as("sb"), col("c").as("cb"))
    a.join(b, Seq("ph"))
      .filter(col("sa") <= col("sb"))
      .withColumn("pairs",
        when(col("sa") === col("sb"),
          expr("ca * (ca - 1L) div 2L"))
          .otherwise(col("ca") * col("cb")))
      .filter(col("pairs") > 0)
      .groupBy(col("sa").as("source_a"), col("sb").as("source_b"))
      .agg(sum("pairs").as("n_pairs"), count(lit(1)).as("n_paras"))
      .orderBy("source_a", "source_b")
  }

  /** Time-series gap fill (q184, [[graft.ops.GapFill]]): each event
    * type's hourly milli-quantized `value` volume densified onto the
    * hour grid — linear interpolation across interior gaps, forward
    * fill after the type's last observation up to the corpus-wide
    * last hour (the common grid END that aligns every key into one
    * feature matrix). Per-key grids and per-key windows only; the
    * interpolation is ONE fixed-shape double expression over
    * integer-valued operands (one multiply, one divide, one add), so
    * the DuckDB window replay is bit-identical, `fill` provenance
    * column included.
    */
  private[graft] def qGapFill(s: SparkSession, dir: String): DataFrame = {
    val obs = t(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("hr"))
      .agg(sum(expr(
        "cast(cast(value as decimal(18,2)) * 100 as bigint) * 10L"))
        .as("v_milli"))
    GapFill.fill(obs, "event_type", "hr", "v_milli")
      .orderBy("event_type", "hr")
  }

  /** Streaming exact top-k leaderboard (q185,
    * [[graft.streaming.Leaderboard]]): the global 20 highest-value
    * events maintained across 3 micro-batches — per-row scores make
    * k stored rows a SUFFICIENT STATISTIC (top-k(A∪B) =
    * top-k(top-k(A)∪B)), so the fold is exact and per-ingest cost is
    * independent of history. Oracle = the one-shot batch top-20 over
    * all events, so green proves streamed fold ≡ batch ranking;
    * LeaderboardSpec drives restart-resume with displacement and
    * no-change batches.
    */
  private[graft] def qStreamTopK(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Leaderboard.run(s, s"$dir/events.parquet", 20,
      chunks = 3)

  /** Functional-dependency audit (q186) — the schema-contract gate
    * beside E150's referential audit: does column A determine column
    * B? Five candidate FDs (two that HOLD — key → attribute — and
    * three plausible-but-false ones a pipeline might wrongly assume),
    * each audited in one (LHS, distinct-RHS) partial-agg pass: LHS
    * key count, violating-key count (distinct RHS > 1), violation
    * share in basis points, worst fanout. At 100 TB this is the scan
    * that decides whether a "join on A, take B from either side"
    * denormalization is safe — run BEFORE the pipeline bakes the
    * assumption in.
    */
  private[graft] def qFdAudit(s: SparkSession, dir: String): DataFrame = {
    def fd(df: DataFrame, name: String, lhs: String,
        rhs: String): DataFrame =
      df.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("__nr"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("__nr") > 1, 1L).otherwise(0L))
            .as("n_violating"),
          max("__nr").as("max_fanout"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          expr("n_violating * 10000L div n_lhs").as("viol_bp"),
          col("max_fanout"))
    fd(t(s, dir, "orders"), "orders: o_orderkey -> o_custkey",
        "o_orderkey", "o_custkey")
      .unionByName(fd(t(s, dir, "lineitem"),
        "lineitem: l_orderkey -> l_suppkey", "l_orderkey", "l_suppkey"))
      .unionByName(fd(t(s, dir, "documents"),
        "documents: doc_id -> lang", "doc_id", "lang"))
      .unionByName(fd(t(s, dir, "documents"),
        "documents: source -> lang", "source", "lang"))
      .unionByName(fd(t(s, dir, "events"),
        "events: user_id -> event_type", "user_id", "event_type"))
      .orderBy("fd")
  }

  /** Streaming incremental skyline (q187,
    * [[graft.streaming.SkylineStream]]): q174's Pareto frontier kept
    * current under document arrivals — dominance is transitive, so
    * the stored frontier is a SUFFICIENT STATISTIC (skyline(A∪B) =
    * skyline(skyline(A)∪B)) and per-ingest cost is the batch's own
    * sweep plus a frontier-sized merge. Oracle = the one-shot
    * NOT-EXISTS dominance frontier over ALL docs, so green proves
    * streamed fold ≡ batch skyline; SkylineStreamSpec drives
    * restart-resume with arrivals that EVICT stored frontier points.
    */
  private[graft] def qStreamSkyline(s: SparkSession, dir: String): DataFrame =
    graft.streaming.SkylineStream.run(s, s"$dir/documents.parquet",
      chunks = 3)

  /** Per-source bottom-k (KMV) sketch (q188) — the deterministic
    * sample-AND-estimator in one k-row state: the k smallest 52-bit
    * md5 hashes of each source's distinct 5-gram shingles are (a) a
    * reproducible uniform sample of the source's content space any
    * engine recomputes bit-identically, and (b) the classic KMV
    * distinct-count estimator est = (k−1)·2⁵²/h_k — REPORTED against
    * the exact count with its error in basis points and the 3·rsd
    * check (rsd ≈ 1/√(k−2)), measured not asserted. Bottom-k rides
    * the E170 bounded aggregate (negated score), so state caps at k
    * per source map-side — no per-group window, no global sort — and
    * the sketch is MERGEABLE (bottom-k(A∪B) = bottom-k(bk(A)∪bk(B)):
    * the merge law is asserted in-engine per source over the
    * doc_id-parity halves (merge_exact, the q164/q170 discipline —
    * DuckDB replays the estimator numerically and gets a TRUE
    * literal for the in-engine law).
    */
  private[graft] def qKmvSketch(s: SparkSession, dir: String): DataFrame = {
    val k = 64
    val scale = 4503599627370496L // 16^13 = 2^52
    val tk = TopK.topK(k)
    def hashes(docs: DataFrame): DataFrame = docs
      .select(col("source"),
        explode(TextFns.shingles("text", 5)).as("g"))
      .distinct()
      .select(col("source"),
        expr("cast(conv(substring(md5(g), 1, 13), 16, 10) as bigint)")
          .as("h"))
      .distinct()
    def bottomK(hs: DataFrame, out: String): DataFrame = hs
      .groupBy("source")
      .agg(tk(-col("h"), col("h")).as(out),
        count(lit(1)).as(out + "_n"))
    val docs = t(s, dir, "documents")
    val whole = bottomK(hashes(docs), "bk")
    // merge law over the doc_id-parity halves: bottom-k of the union
    // of the two k-row states must equal the whole corpus's bottom-k
    val h1 = bottomK(hashes(docs.filter(col("doc_id") % 2 === 0)), "b1")
    val h2 = bottomK(hashes(docs.filter(col("doc_id") % 2 === 1)), "b2")
    val mergedState = h1
      .select(col("source"), explode(col("b1")).as("e"))
      .unionByName(h2.select(col("source"), explode(col("b2")).as("e")))
      .select(col("source"), col("e.id").as("h"))
      .distinct()
    val merged = bottomK(mergedState, "bm")
    val nGrams = t(s, dir, "documents")
      .select(col("source"),
        explode(TextFns.shingles("text", 5)).as("g"))
      .distinct()
      .groupBy("source").agg(count(lit(1)).as("n_grams"))
    whole.join(merged.select("source", "bm"), "source")
      .join(nGrams, "source")
      .select(col("source"), col("n_grams"),
        when(col("bk_n") < k, col("bk_n"))
          .otherwise(expr(s"(${k - 1}L * ${scale}L) div"
            + s" greatest(element_at(bk, $k).id, 1L)")).as("kmv_est"),
        (col("bm") === col("bk")).as("merge_exact"))
      .withColumn("err_bp",
        expr("abs(kmv_est - n_grams) * 10000L div n_grams"))
      .withColumn("within_3rsd", col("err_bp") <= 3810L)
      .select(col("source"), col("n_grams"), col("kmv_est"),
        col("err_bp"), col("within_3rsd"), col("merge_exact"))
      .orderBy("source")
  }

  /** q189's stored bin boundaries, trained once per (session, corpus)
    * on the HISTORY orders (o_orderkey % 10 < 8): the 9 exact
    * lower-decile cents values at ranks ⌈i·n/10⌉ in (cents, orderkey)
    * order — the rank from [[Packing.withRunningSum]]'s range
    * exchange (zero Window operators), boundaries written as a
    * 9-row parquet artifact (bin_idx, bound_cents).
    */
  private[graft] val binArtifactCache = scala.collection.mutable.Map
    .empty[(String, String), String]

  private[graft] def binArtifact(s: SparkSession, dir: String): String =
    sessionFixture(binArtifactCache, s, dir) {
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val hist = t(s, dir, "orders")
        .filter(col("o_orderkey") % 10 < 8)
        .select(expr(
          "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .as("cents"), col("o_orderkey"))
        .withColumn("__one", lit(1L))
      val n = hist.count()
      val ranks = (1 to 9).map(i => (i * n + 9) / 10)
      val byRank = Packing
        .withRunningSum(hist, "rk", "__one",
          col("cents").asc, col("o_orderkey").asc)
        .filter(col("rk").isin(ranks: _*))
        .select(col("rk"), col("cents"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val path = graft.Scratch.register(
        s"${System.getProperty("java.io.tmpdir")}/graft_bins_$tag")
      import s.implicits._
      ranks.zipWithIndex
        .map { case (rk, i) => (i.toLong + 1L, byRank(rk)) }
        .toDF("bin_idx", "bound_cents")
        .coalesce(1).write.mode("overwrite").parquet(path)
      path
    }

  /** Stored equi-depth binning — train once, apply many (q189): the
    * q129 stored-artifact lifecycle applied to feature PREPROCESSING.
    * Decile boundaries are trained on the history orders, persisted
    * as a parquet artifact, and APPLIED to the disjoint arrival batch
    * (o_orderkey % 10 ≥ 8) as plan literals — binning is scan-local
    * codegen'd comparisons, rows never shuffle to learn their bin
    * (the q142 discipline, but with the boundary artifact OUTLIVING
    * the run: at 100 TB the training scan happens once per model
    * version, not once per scoring job). Boundaries are exact-rank
    * integer cents (no interpolated doubles), so the oracle replays
    * train AND apply numerically end-to-end — green proves the
    * parquet roundtrip lossless and the stored-model application
    * identical to an inline recompute.
    */
  private[graft] def qStoredBins(s: SparkSession, dir: String): DataFrame = {
    val bounds = s.read.parquet(binArtifact(s, dir))
      .orderBy("bin_idx").collect().map(_.getAs[Long]("bound_cents"))
    val batch = t(s, dir, "orders")
      .filter(col("o_orderkey") % 10 >= 8)
      .select(expr(
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
        .as("cents"))
    val bin = bounds
      .map(b => when(col("cents") >= b, 1L).otherwise(0L))
      .reduce(_ + _)
    batch.withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"), min("cents").as("min_cents"),
        max("cents").as("max_cents"))
      .orderBy("bin")
  }

  /** Per-group OLS trend fit (q190) — drift detection with an exact
    * replay: per event type, the least-squares slope of value (cents)
    * against time (minutes since the corpus start) from INTEGER
    * sufficient statistics (n, Σx, Σy, Σxy, Σx²) — one partial-agg
    * pass, rebased x so Σx² stays far under 2⁶³ (x ≤ 43 200 minutes;
    * a raw epoch-minute x² would overflow by 10×) — with slope_num =
    * n·Σxy − Σx·Σy and slope_den = n·Σx² − (Σx)² emitted as the
    * exact integers they are and the slope as ONE double division.
    * Built-in regr_slope in either engine accumulates doubles in
    * engine-specific order and is NOT bit-stable across engines; the
    * sufficient-statistic form is.
    */
  private[graft] def qGroupTrend(s: SparkSession, dir: String): DataFrame = {
    val t0 = t(s, dir, "events")
      .agg(min(expr("unix_millis(ts) div 60000"))).head().getLong(0)
    t(s, dir, "events")
      .select(col("event_type"),
        (expr("unix_millis(ts) div 60000") - t0).as("x"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
          .as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy"))
          .as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx"))
          .as("slope_den"))
      .withColumn("slope_cents_per_min",
        col("slope_num").cast("double") / col("slope_den").cast("double"))
      .orderBy("event_type")
  }

  /** LSH operating-curve measurement (q192) — the tuning table that
    * picks (bands, rows) BEFORE committing a 100 TB dedup run: the
    * same 32-hash MinHash signatures banded three ways — (16,2),
    * (8,4), (4,8) — each config's candidate volume, recall and
    * precision measured against the EXACT J ≥ 0.5 ground truth
    * (E134's lossless prefix-filtered join on the same 5-gram unit,
    * so the truth side misses nothing), beside the textbook expected
    * recall at the threshold, 1−(1−t^r)^b — theory and measurement in
    * one table. The collision probability is a property of the
    * signature algebra, so this fixture-scale measurement is the
    * SAME curve a 100 TB corpus sees; candidate volume is what
    * scales, and that is exactly the column the table exposes per
    * config. All three configs run as ONE job — config-tagged band
    * rows, one keyed self-join, one per-config two-counter
    * aggregate; the candidate stream is consumed in a single pass
    * (volume + truth-hit count together), never materialized or
    * rescanned, and only 3 counter rows reach the driver.
    *
    * The exact-truth side AND the shared 32-hash signature table are
    * [[sessionFixture]]s: both are properties of the corpus, not of
    * the banding configs under test ("the same signatures banded
    * three ways" is the query's own contract), so repeated trials
    * (bench median-of-3) measure the three candidate-generation
    * configs — banding, collision join, counts — not E134's exact
    * join or the 2.5M-row md5+min signature build every trial (the
    * q82/q128 stored-fixture discipline; production stores signature
    * tables for exactly this reason).
    */
  private[graft] val lshTruthCache = scala.collection.mutable.Map
    .empty[(String, String), (DataFrame, Long)]

  /** q192's ground truth: exact Jaccard ≥ 0.5 over the 5-CHAR shingle
    * sets — the SAME sets [[lshSigs]]' MinHash signatures sketch, via
    * the lossless prefix-filter join ([[SetSimJoin
    * .prefixJaccardPairsFromGrams]]). It must be char shingles, not
    * [[SetSimJoin.prefixJaccardPairs]]' word grams: truth in a
    * different set space tunes the wrong recall table — word-gram and
    * char-shingle J ≥ 0.5 pair sets happen to coincide on the sf0.01/
    * sf0.1 corpora (every gate hash-matched) but split at sf1 (394
    * word-gram vs ≥ 401 char-shingle true pairs — BASELINE.md r10),
    * which the 10× scale replay caught. Spec-pinned by the planted
    * word-rotated pair. Like every exact truth tool in this family,
    * the prefix join is quadratic-class on vocabulary-dense corpora
    * (1.78×10¹⁰ join rows at sf1) — calibration use only.
    */
  private[graft] def lshTruth(s: SparkSession, dir: String): (DataFrame, Long) =
    sessionFixture(lshTruthCache, s, dir) {
      val grams = t(s, dir, "documents")
        .select(col("doc_id").as("__id"),
          explode(TextFns.shingles("text", 5)).as("__sh"))
        .select(col("__id"), xxhash64(col("__sh")).as("__gh"))
        .localCheckpoint()
      val truth = SetSimJoin.prefixJaccardPairsFromGrams(grams, 0.5)
        .select("id_a", "id_b").localCheckpoint()
      (truth, truth.count())
    }

  private[graft] val lshSigCache = scala.collection.mutable.Map
    .empty[(String, String), DataFrame]

  private[graft] def lshSigs(s: SparkSession, dir: String): DataFrame =
    sessionFixture(lshSigCache, s, dir) {
      val docs = t(s, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("shingles", TextFns.shingles("text", 5))
        .select("doc_id", "shingles")
      NearDup.minHashSigs(docs, "doc_id", "shingles", 32, "sig")
        .localCheckpoint()
    }

  private[graft] def qLshTuning(s: SparkSession, dir: String): DataFrame = {
    val sigs = lshSigs(s, dir)
    val (truth, nTrue) = lshTruth(s, dir)
    val configs = Seq((16, 2), (8, 4), (4, 8))
    // ALL THREE configs ride ONE job: band rows are tagged with their
    // config and unioned, so the collision self-join (config in the
    // key — configs never cross), the per-config pair distinct, the
    // broadcast-truth left join and the two counters are a single
    // pass over the combined candidate stream (4M+ pairs at b16r2 —
    // the flood is that config's own result) instead of three
    // sequential jobs over the same checkpointed signatures. The
    // pair stream is never materialized or rescanned.
    // The pair-dedup shuffle is the flood's cost center (4.3M+ rows
    // at b16r2), so each (id_a < id_b) pair travels as ONE long
    // (id_a<<32 | id_b) and the config as a small int: ~3× fewer
    // shuffled bytes than (string, long, long) rows for the identical
    // distinct. The encoding is exact only for ids in [0, 2^32);
    // pairEnc ENFORCES that per row (two codegen'd comparisons on the
    // flood — negligible) so a larger corpus fails loudly instead of
    // silently merging distinct pairs into one counter row.
    def pairEnc(ia: String, ib: String): Column = expr(
      s"""case when $ia >= 0 and $ia < 4294967296
         |      and $ib >= 0 and $ib < 4294967296
         |then shiftleft($ia, 32) + $ib
         |else raise_error(concat(
         |  'qLshTuning: doc id outside [0, 2^32) breaks the packed ',
         |  'pair encoding: ', cast(greatest($ia, $ib) as string))) end"""
        .stripMargin)
    val allBands = configs.zipWithIndex.map { case ((b, r), ci) =>
      NearDup.bandRows(sigs, "doc_id", "sig", b, r, 32)
        .withColumn("cfg", lit(ci))
    }.reduce(_ unionByName _)
    val a = allBands.select(col("cfg"), col("band"), col("band_key"),
      col("doc_id").as("id_a"))
    val bb = allBands.select(col("cfg"), col("band"), col("band_key"),
      col("doc_id").as("id_b"))
    val truthEnc = truth.select(
      pairEnc("id_a", "id_b").as("pc"),
      lit(1L).as("__t"))
    val counters = a.join(bb, Seq("cfg", "band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cfg"), pairEnc("id_a", "id_b").as("pc"))
      .distinct()
      .join(broadcast(truthEnc), Seq("pc"), "left")
      .groupBy("cfg")
      .agg(count(lit(1)).as("nc"),
        sum(coalesce(col("__t"), lit(0L))).as("nf"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val counterByName = configs.zipWithIndex.map { case ((b, r), ci) =>
      s"b${b}r$r" -> counters.getOrElse(ci, (0L, 0L))
    }.toMap
    val rows = configs.map { case (b, r) =>
      val (nc, nf) = counterByName(s"b${b}r$r")
      (s"b${b}r$r", b.toLong, r.toLong, nc, nTrue, nf,
        if (nTrue > 0) nf * 10000L / nTrue else 10000L,
        if (nc > 0) nf * 10000L / nc else 10000L,
        theoryRecallBp(b, r))
    }
    import s.implicits._
    rows.toDF("config", "bands", "rows_per_band", "n_candidates",
        "n_true", "n_found", "recall_bp", "precision_bp",
        "theory_recall_bp")
      .orderBy("config")
  }

  /** ⌊10⁴·(1−(1−0.5^r)^b)⌋ — the S-curve collision probability at the
    * J = 0.5 threshold. Computed ONCE here and interpolated into the
    * oracle as the identical literal, so no cross-engine `pow` is
    * ever compared.
    */
  private[graft] def theoryRecallBp(b: Int, r: Int): Long =
    math.floor((1.0 - math.pow(1.0 - math.pow(0.5, r), b)) * 10000).toLong

  /** Media near-duplicate detection (q193,
    * [[graft.ops.Multimodal.blockHash]]) — the multimodal × dedup
    * crossover: payloads fingerprint to a LOCALITY-SENSITIVE 60-bit
    * blockhash (chunk-sum profile, not an avalanche digest), then the
    * E9 pigeonhole: 4 blocks of 15 bits as equi-join keys (Hamming ≤ 3
    * ⟹ at least one block matches exactly — zero false negatives at
    * the threshold, by pigeonhole, never an all-pairs product), one
    * codegen'd `bit_count(xor)` verify per candidate. Payloads never
    * shuffle — only (id, fp) longs leave the scan; with a real image
    * pHash the plumbing is IDENTICAL, only the codec changes (the
    * multimodal-stub convention, byte-exact-oracled end to end).
    */
  private[graft] def qMediaNearDup(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val fps = Multimodal
      .blockHash(Multimodal.asMedia(t(s, dir, "documents")))
      .toDF().select(col("doc_id"), col("fp"))
      .transform(snap)
    val blocks = fps.select(col("doc_id"), explode(expr(
      """transform(sequence(0, 3), b -> struct(b as blk,
        | shiftright(fp, b * 15) % 32768 as key))""".stripMargin))
      .as("p"))
      .select(col("doc_id"), col("p.blk").as("blk"),
        col("p.key").as("key"))
    val pairs = blocks
      .select(col("doc_id").as("id_a"), col("blk"), col("key"))
      .join(blocks.select(col("doc_id").as("id_b"), col("blk"),
        col("key")), Seq("blk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    pairs
      .join(fps.select(col("doc_id").as("id_a"), col("fp").as("__fa")),
        "id_a")
      .join(fps.select(col("doc_id").as("id_b"), col("fp").as("__fb")),
        "id_b")
      .withColumn("hamming",
        expr("cast(bit_count(__fa ^ __fb) as bigint)"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** Deterministic synthetic data generation (q194) — the datagen
    * primitive behind every scale test and anonymized-fixture export:
    * 100 000 rows materialized from NOTHING but `spark.range` and
    * md5-derived columns — scan-local, ZERO shuffle until the 8-row
    * shard digest, which is how a 100 TB synthetic corpus generates
    * (range(10¹²) partitioned across the cluster, no data movement at
    * all). Cross-engine REPRODUCIBLE by construction: every derived
    * column is a pure function of the row id through the portable
    * md5-prefix convention, so the oracle regenerates the identical
    * table from DuckDB's own `range` — the digest row set is the
    * proof that "generate the fixture anywhere" holds.
    */
  private[graft] def qDataGen(s: SparkSession, dir: String): DataFrame =
    s.range(100000L).toDF("id")
      .select(col("id"),
        expr("""cast(conv(substring(md5(cast(id as string)), 1, 8),
          | 16, 10) as bigint)""".stripMargin).as("h"),
        expr("""cast(conv(substring(md5(cast(id as string)), 9, 15),
          | 16, 10) as bigint)""".stripMargin).as("h2"))
      .select(col("id"), (col("h") % 97).as("key"),
        (col("h") % 10000).as("amount_cents"), col("h2"))
      .groupBy((col("id") % 8).as("shard"))
      .agg(count(lit(1)).as("n_rows"), sum("key").as("key_sum"),
        sum("amount_cents").as("amount_sum"),
        expr("bit_xor(h2)").as("content_xor"))
      .orderBy("shard")

  /** Source-balanced training-order interleave (q195) — the
    * data-ORDERING construction a training run consumes: documents
    * laid out round-robin across sources in deterministic per-source
    * md5 order, so every window of the training stream sees every
    * source (no source-contiguous runs to bias early optimization —
    * the complement of E143's curriculum, which orders by QUALITY;
    * this orders for BALANCE). Both ranks come from the E26
    * count-then-offset range exchange (per-source rank in md5 order,
    * then the global position over (rank, source) lexicographic order
    * — zero Window operators on the ranking path, so no single-task
    * funnel at any corpus size). The per-source digest (count,
    * min/max position, position checksum, max gap between consecutive
    * appearances) proves the interleave even: max_gap = |sources| for
    * every source is the round-robin signature, and the oracle
    * replays both ranks as row_numbers plus a lag window.
    */
  private[graft] def qInterleave(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat(lit("il|"), col("doc_id").cast("string")))
          .as("__hv"))
      .withColumn("__one", lit(1L))
    val ranked = Packing
      .withRunningSum(docs, "__rs", "__one",
        col("source").asc, col("__hv").asc, col("doc_id").asc)
    // __rs is a GLOBAL running count in (source, hv) order; the
    // per-source 0-based rank = __rs − (count of docs in earlier
    // sources) — a broadcast metadata offset, the E26 discipline.
    val offsets = docs.groupBy("source")
      .agg(count(lit(1)).as("__n")).orderBy("source")
      .collect()
    val offMap = {
      var acc = 0L
      offsets.map { r =>
        val o = r.getString(0) -> acc; acc += r.getLong(1); o
      }.toMap
    }
    val offCol = offsets.map(_.getString(0)).foldLeft(lit(0L)) {
      (a, src) => when(col("source") === src, lit(offMap(src)))
        .otherwise(a)
    }
    val withRank = ranked
      .withColumn("rnk", col("__rs") - lit(1L) - offCol)
      .withColumn("__one2", lit(1L))
    val pos = Packing
      .withRunningSum(withRank, "__ps", "__one2",
        col("rnk").asc, col("source").asc, col("doc_id").asc)
      .withColumn("pos", col("__ps") - 1L)
    val w = Window.partitionBy("source").orderBy("pos")
    pos
      .withColumn("__gap", col("pos") - lag("pos", 1).over(w))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), min("pos").as("min_pos"),
        max("pos").as("max_pos"), sum("pos").as("pos_sum"),
        max("__gap").as("max_gap"))
      .orderBy("source")
  }

  /** Multi-horizon trailing activity features (q196) — the rolling
    * feature matrix behavioral models consume: per event, the user's
    * trailing 1 h / 6 h / 24 h counts and the 24 h DECIMAL-quantized
    * value sum, all four frames riding ONE per-user (ms, event) sort
    * — a single window shuffle feeds every horizon (PlanSpec asserts
    * one Window node), which is the difference between one pass and
    * one pass per horizon at 100 TB. Frames are per-user-bounded
    * RANGE frames (the q90 discipline), peers-at-same-ms included
    * identically by both engines.
    */
  private[graft] def qMultiHorizon(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ms"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
          .as("cents"))
    def frame(h: Long) = Window.partitionBy("user_id").orderBy("ms")
      .rangeBetween(-h * 3600000L, 0)
    e.select(col("event_id"), col("user_id"), col("ms"),
        count(lit(1)).over(frame(1)).as("n_1h"),
        count(lit(1)).over(frame(6)).as("n_6h"),
        count(lit(1)).over(frame(24)).as("n_24h"),
        sum("cents").over(frame(24)).as("cents_24h"))
      .orderBy("event_id")
  }

  /** Integer CUSUM change detection (q197) — the sequential
    * control-chart statistic S_t = max(0, S_{t−1} + x_t − k) that EWMA
    * (E120) and the seasonal median (E173) don't cover: CUSUM
    * accumulates SMALL persistent shifts that never individually trip
    * a threshold. The recurrence looks inherently sequential, but it
    * has the exact closed form S_t = P_t − min(0, min_{j≤t} P_j)
    * (P = prefix sum of x−k) — two running window aggregates, fully
    * parallel over (type, hour) series, no driver loop, exact int64.
    * Per-type digest: max CUSUM + its hour (argmax, min-hour
    * tie-break) + buckets over the 3k alarm line — nondegenerate even
    * when the synthetic corpus never alarms (the max and where it
    * happened IS the monitoring read-out). Allowance k = mean+1
    * (integer div), so drift is absorbed and only sustained excess
    * accumulates. Observed hours only (the q179 convention).
    */
  private[graft] def qCusum(s: SparkSession, dir: String): DataFrame =
    cusumOverHourly(t(s, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 3600000").as("hr"))
      .agg(count(lit(1)).as("n")))

  /** The CUSUM closed form over an hourly (event_type, hr, n) table —
    * shared by q197 (batch group-by input) and q200 (the streamed
    * [[graft.streaming.RateMonitor]] bucket fold), which is why the
    * two share one oracle: counts are a commutative monoid, so the
    * folded buckets are bit-identical to the batch group-by, and any
    * formula over them — this one included — inherits the equality.
    */
  private[graft] def cusumOverHourly(hourly: DataFrame): DataFrame = {
    val tot = hourly.groupBy("event_type")
      .agg(sum("n").as("__tn"), count(lit(1)).as("n_buckets"))
      .withColumn("k", expr("__tn div n_buckets + 1L"))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly.join(broadcast(tot), "event_type")
      .withColumn("__p", sum(col("n") - col("k")).over(w))
      .withColumn("__m", least(lit(0L), min("__p").over(w)))
      .withColumn("__s", col("__p") - col("__m"))
      .groupBy("event_type")
      .agg(first("n_buckets").as("n_buckets"), first("k").as("k"),
        max(struct(col("__s").as("s"), (-col("hr")).as("nh"))).as("__mx"),
        sum(when(col("__s") >= lit(3L) * col("k"), 1L).otherwise(0L))
          .as("n_over_3k"))
      .select(col("event_type"), col("n_buckets"), col("k"),
        col("__mx.s").as("max_cusum"), (-col("__mx.nh")).as("argmax_hr"),
        col("n_over_3k"))
      .orderBy("event_type")
  }

  /** Streaming CUSUM monitoring (q200) — the sequential statistic
    * DEPLOYED: micro-batches fold into [[graft.streaming.RateMonitor]]'s
    * stored hourly buckets (the sufficient statistic, O(types×hours)
    * state, hour-straddling batches merge as a monoid) and the CUSUM
    * read-out is one metadata-sized computation over the folded
    * state — so re-tuning k or the alarm line after the fact costs
    * NOTHING, because the statistic, not the alarm curve, is what's
    * stored. Shares q197's oracle verbatim: green proves streamed
    * fold + formula ≡ batch group-by + formula (the q126/q138
    * discipline applied to the sequential-statistic family).
    */
  private[graft] def qStreamCusum(s: SparkSession, dir: String): DataFrame =
    cusumOverHourly(graft.streaming.RateMonitor
      .run(s, s"$dir/events.parquet", chunks = 3)
      .select(col("event_type"), col("hr"), col("cnt").as("n")))

  /** Bounded-staleness point-in-time join (q198) — q161's leakage-safe
    * carry-forward plus the feature-store TTL every serving layer
    * enforces: a state older than 1 h at fact time must NOT apply (a
    * stale feature is often worse than none). The carry-forward now
    * carries the state's OWN timestamp beside its value — both ride
    * the same `last(ignoreNulls)` frame, so they move in lockstep —
    * and the tier resolves to −1 (never seen) or −2 (seen but stale)
    * at read time. The oracle computes the SAME semantics the
    * structurally opposite way (q161's lead-built validity intervals,
    * now intersected with the staleness cap), so green proves
    * carry-forward + TTL ≡ interval containment + TTL.
    */
  private[graft] def qStalePitJoin(s: SparkSession, dir: String): DataFrame = {
    val ttl = 3600000L
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("ms"))
    val state = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ms"), col("event_id"),
        lit(0).as("__is_fact"),
        expr("cast(floor(value / 100d) as bigint)").as("__tier"),
        col("ms").as("__sms"),
        lit(null).cast("long").as("__vq"))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms"), col("event_id"),
        lit(1).as("__is_fact"),
        lit(null).cast("long").as("__tier"),
        lit(null).cast("long").as("__sms"),
        expr("cast(floor(value * 1000d) as bigint)").as("__vq"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ms").asc, col("__is_fact").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    state.unionByName(facts)
      .withColumn("__ct", last("__tier", ignoreNulls = true).over(w))
      .withColumn("__cs", last("__sms", ignoreNulls = true).over(w))
      .filter(col("__is_fact") === 1)
      .withColumn("tier",
        when(col("__ct").isNull, lit(-1L))
          .when(col("ms") - col("__cs") > ttl, lit(-2L))
          .otherwise(col("__ct")))
      .groupBy("tier")
      .agg(count(lit(1)).as("n_purchases"), sum("__vq").as("sum_vq"))
      .orderBy("tier")
  }

  /** Distributed exact weighted median (q199) — the robust weighted
    * aggregate a plain weighted MEAN gets wrong under heavy tails:
    * per return flag, the unit price (cents) at which cumulative
    * QUANTITY crosses half the total — the "half the goods moved at
    * or below this price" statistic. One global range-exchange prefix
    * sum of integer weights over (flag, price, rowid) order
    * ([[Packing.withRunningSum]] — zero Window operators,
    * PlanSpec-asserted) minus broadcast per-flag offsets; the
    * crossing row (2·cumw ≥ W and 2·(cumw − w) < W) is unique
    * because weights are positive, so the pick is deterministic and
    * the oracle replays it as a per-flag window cumsum with the
    * identical predicate.
    */
  private[graft] def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("cast(cast(l_extendedprice as decimal(18,2)) * 100"
          + " as bigint)").as("v"),
        expr("cast(floor(l_quantity) as bigint)").as("wt"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"))
    val cum = Packing.withRunningSum(li, "__cum", "wt",
      col("flag").asc, col("v").asc, col("rid").asc)
    val offs = li.groupBy("flag").agg(sum("wt").as("__w"))
      .orderBy("flag").collect()
    val offMap = {
      var acc = 0L
      offs.map { r =>
        val o = r.getString(0) -> acc; acc += r.getLong(1); o
      }.toMap
    }
    val wMap = offs.map(r => r.getString(0) -> r.getLong(1)).toMap
    val offCol = offs.map(_.getString(0)).foldLeft(lit(0L)) { (a, f) =>
      when(col("flag") === f, lit(offMap(f))).otherwise(a)
    }
    val wCol = offs.map(_.getString(0)).foldLeft(lit(0L)) { (a, f) =>
      when(col("flag") === f, lit(wMap(f))).otherwise(a)
    }
    cum.withColumn("__cw", col("__cum") - offCol)
      .withColumn("__W", wCol)
      .filter(lit(2L) * col("__cw") >= col("__W") &&
        lit(2L) * (col("__cw") - col("wt")) < col("__W"))
      .select(col("flag"), col("__W").as("w_total"),
        col("v").as("wmedian_cents"))
      .orderBy("flag")
  }

  /** Corpus-refresh capstone v2 (q201) — the DAILY-REFRESH
    * composition wired from this round's machinery the way q100 wired
    * the round-3 surface: exact-dedup keep-first (32-byte fingerprint
    * keys, min-id representative) → quality gate (≥ 0.6, the E1
    * score) → source-balanced round-robin interleave (E189's two
    * range-exchange ranks — the TRAINING ORDER, not just the set) →
    * 20k-token budget admission in that order (the E72 straddle rule
    * over one more range-exchange prefix sum) → per-source manifest
    * digest. Every stage is individually proven elsewhere
    * (q24/q21/q195/q86); the capstone proves the COMPOSITION — four
    * chained shuffles of ids/keys, never text after the scan, no
    * stage that fails at 100 TB — and the oracle replays the full
    * chain end-to-end.
    */
  private[graft] def qRefreshPipeline(s: SparkSession, dir: String): DataFrame = {
    val budget = 20000L
    val docs = t(s, dir, "documents")
      .withColumn("__toks", TextFns.tokens("text"))
      .select(col("doc_id"), col("source"),
        TextFns.fingerprint("text").as("__f"),
        size(col("__toks")).cast("long").as("n_tok"),
        TextFns.qualityScore("text", "__toks").as("__q"))
    val keepIds = docs.groupBy("__f").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val kept = docs.join(keepIds, "doc_id")
      .filter(col("__q") >= 0.6)
      .withColumn("__hv",
        md5(concat(lit("il|"), col("doc_id").cast("string"))))
      .withColumn("__one", lit(1L))
    val ranked = Packing.withRunningSum(kept, "__rs", "__one",
      col("source").asc, col("__hv").asc, col("doc_id").asc)
    val offs = kept.groupBy("source").agg(count(lit(1)).as("__n"))
      .orderBy("source").collect()
    val offMap = {
      var acc = 0L
      offs.map { r =>
        val o = r.getString(0) -> acc; acc += r.getLong(1); o
      }.toMap
    }
    val offCol = offs.map(_.getString(0)).foldLeft(lit(0L)) { (a, f) =>
      when(col("source") === f, lit(offMap(f))).otherwise(a)
    }
    val withRank = ranked
      .withColumn("rnk", col("__rs") - lit(1L) - offCol)
      .withColumn("__one2", lit(1L))
    val pos = Packing.withRunningSum(withRank, "__ps", "__one2",
        col("rnk").asc, col("source").asc, col("doc_id").asc)
      .withColumn("pos", col("__ps") - 1L)
    Packing.withRunningSum(pos, "cum_tok", "n_tok", col("pos").asc)
      .filter(col("cum_tok") - col("n_tok") < budget)
      .groupBy("source")
      .agg(count(lit(1)).as("n_admitted"),
        sum("n_tok").as("tok_admitted"),
        min("pos").as("min_pos"), max("pos").as("max_pos"))
      .orderBy("source")
  }

  /** Digest-driven partition repair (q191) — anti-entropy between two
    * replicas of a day-partitioned table, composing E164's O(1)
    * digests with E79's row diff at the granularity that matters:
    * per-DAY (count, bit_xor-of-row-hash) digests locate divergence
    * for the cost of one aggregate per replica (metadata out), and
    * only the diverged days — here a deterministic corruption: drops
    * on day%7=3 (event_id%97=0), +1-cent flips on day%7=5
    * (event_id%89=0) — pay the row-level join. At 100 TB the digest
    * pass reads both replicas once; the repair join reads 2/7ths of
    * the days instead of all of them (the diverged-day list is a
    * collected metadata literal → partition pruning). Everything
    * md5-hash deterministic, so the oracle replays digest AND diff.
    */
  private[graft] def qPartitionRepair(s: SparkSession, dir: String): DataFrame = {
    def hashed(df: DataFrame): DataFrame = df.withColumn("__rh", expr(
      """cast(conv(substring(md5(concat(cast(event_id as string), ':',
        | cast(cents as string))), 1, 8), 16, 10) as bigint)"""
        .stripMargin))
    val a = hashed(t(s, dir, "events")
      .select(col("event_id"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("day"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
          .as("cents")))
    val b = hashed(a.select(col("event_id"), col("day"),
        (col("cents") + when(col("day") % 7 === 5 &&
          col("event_id") % 89 === 0, 1L).otherwise(0L)).as("cents"))
      .filter(!(col("day") % 7 === 3 && col("event_id") % 97 === 0)))
    def digest(df: DataFrame, tag: String): DataFrame =
      df.groupBy("day").agg(count(lit(1)).as(s"n_$tag"),
        expr("bit_xor(__rh)").as(s"x_$tag"))
    val dg = digest(a, "a").join(digest(b, "b"), Seq("day"), "left")
      .select(col("day"), col("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        (coalesce(col("n_b"), lit(-1L)) =!= col("n_a") ||
          coalesce(col("x_b"), lit(0L)) =!= col("x_a"))
          .as("diverged"))
    val badDays = dg.filter(col("diverged")).select("day")
      .collect().map(_.getLong(0)).toIndexedSeq
    val af = a.filter(col("day").isin(badDays: _*))
    val bf = b.filter(col("day").isin(badDays: _*))
    val miss = af.join(bf.select(col("event_id").as("__eb")),
        col("event_id") === col("__eb"), "left_anti")
      .groupBy("day").agg(count(lit(1)).as("n_missing_b"))
    val changed = af.select(col("day"), col("event_id"),
        col("cents").as("__ca"))
      .join(bf.select(col("event_id"), col("cents").as("__cb")),
        "event_id")
      .filter(col("__ca") =!= col("__cb"))
      .groupBy("day").agg(count(lit(1)).as("n_value_diff"))
    dg.join(miss, Seq("day"), "left").join(changed, Seq("day"), "left")
      .select(col("day"), col("n_a"), col("n_b"), col("diverged"),
        coalesce(col("n_missing_b"), lit(0L)).as("n_missing_b"),
        coalesce(col("n_value_diff"), lit(0L)).as("n_value_diff"))
      .orderBy("day")
  }

  /** q148's stored reference artifacts, built once per (session,
    * corpus): the eval set's distinct paragraph fingerprints as a
    * parquet table (the exact-confirm side) and their Bloom filter
    * (the scan-local pre-filter) — the q110 eval convention
    * (doc_id % 17 == 0, 20-token paragraphs, md5 fps).
    */
  private[graft] val contamScreenCache = scala.collection.mutable.Map
    .empty[(String, String), (String, Array[Byte])]

  private[graft] def contamArtifacts(s: SparkSession,
      dir: String): (String, Array[Byte]) =
    sessionFixture(contamScreenCache, s, dir) {
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val fps = ParagraphDedup.paragraphs(
          t(s, dir, "documents").filter(col("doc_id") % 17 === 0),
          "doc_id", "text", 20)
        .select(md5(graft.expressions.UnicodeNormalize.nfc(col("para"))).as("fp")).distinct().localCheckpoint()
      val path = graft.Scratch.register(
        s"${System.getProperty("java.io.tmpdir")}/graft_contam_ev_$tag")
      fps.write.mode("overwrite").parquet(path)
      (path, Blooms.build(fps, col("fp"), math.max(fps.count(), 1L),
        0.01))
    }

  /** Streaming contamination screen (q148,
    * [[graft.streaming.ContaminationScreen]]): documents arrive in
    * micro-batches and are screened against the STORED eval artifacts
    * — Bloom pre-filter scan-local (the clean common case never leaves
    * the scan), exact confirm against the fingerprint table (no false
    * positives survive, none missed: Blooms have no false negatives) —
    * with per-doc verdicts appended replay-safely per batch. The
    * oracle replays the whole-corpus screen, so green proves streamed
    * screening ≡ batch screening: q110's operator made deployable.
    */
  private[graft] def qStreamContamination(s: SparkSession,
      dir: String): DataFrame = {
    val (evalPath, bloom) = contamArtifacts(s, dir)
    graft.streaming.ContaminationScreen.run(s,
      s"$dir/documents.parquet", evalPath, bloom,
      docFilter = col("doc_id") % 17 =!= 0, parLen = 20, chunks = 3)
  }

  /** Wide→long UNPIVOT (q146) — the inverse of q42's pivot and the
    * remaining §2.5 reshape member: three per-flag money measures
    * melted to (flag, measure, value) rows via Spark's typed
    * `unpivot` (one Expand over the aggregated table — metadata-sized
    * input, the reshape never touches the fact scan). Measure sums use
    * the q74 DECIMAL-before-sum money discipline so the doubles are
    * order-independent.
    */
  private[graft] def qUnpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_price"),
        sum(money(col("l_discount"))).cast("double").as("sum_disc"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "value")
      .orderBy("l_returnflag", "measure")

  /** EXACT cross-corpus contamination screen (q147,
    * [[SetSimJoin.crossJaccardPairs]]): every (arriving, history) pair
    * with true 3-gram Jaccard ≥ 0.5, via side-agnostic prefix
    * filtering over a SHARED df ordering — the lossless counterpart of
    * q99's banded screen (bands can miss true pairs by signature
    * chance; the prefix theorem cannot). The oracle is the full
    * uncapped inverted-index R⋈S join, so a green row is the
    * zero-false-negative proof for the cross-corpus case.
    */
  private[graft] def qCrossSetSim(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    SetSimJoin.crossJaccardPairs(
        docs.filter(col("doc_id") % 5 === 0),
        docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", n = 3, minJaccard = 0.5)
      .orderBy("id_r", "id_s")
  }

  /** Curriculum construction (q144): the whole corpus ordered by
    * quality (desc, doc_id tiebreak) and cut into 4 stages of EQUAL
    * TOKEN MASS — the quality-curriculum recipe (train on the cleanest
    * quartile first, anneal toward the tail). Stage assignment uses a
    * document's START offset in the cumulative token order (the
    * q86/q137 straddle rule) over [[Packing.withRunningSum]]'s
    * distributed range-exchange prefix sum — no single-task window —
    * and `(start · 4) div total` is pure int64 (start < total, so the
    * stage index needs no clamp). Per-stage quality bounds are
    * min/max — order-independent doubles, never a float SUM.
    */
  private[graft] def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .withColumn("__toks", TextFns.tokens("text"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tok"),
        TextFns.qualityScore("text", "__toks").as("quality"))
    val cum = Packing.withRunningSum(docs, "cum_tok", "n_tok",
      col("quality").desc, col("doc_id").asc)
    cum.crossJoin(broadcast(cum.agg(sum("n_tok").as("__tt"))))
      .withColumn("stage", expr("((cum_tok - n_tok) * 4L) div __tt"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("stage_tokens"),
        min("quality").as("min_quality"),
        max("quality").as("max_quality"))
      .orderBy("stage")
  }

  /** Temperature-flattened source mixing (q145) — the standard
    * pretraining mix recipe (weight ∝ count^α, α = ½), where q85
    * balances to the hard cap: small sources are UP-weighted relative
    * to their share so the head domain can't drown them. Everything
    * replayable: weights are floor(sqrt(n)) — IEEE sqrt is correctly
    * rounded and both engines floor the same double, so the weights
    * are identical longs — the weight total and quotas are pure
    * integer arithmetic (no float Σ anywhere), and selection is
    * RATE-based on the portable md5 bucket (keep iff
    * bucket·n_total < quota·10⁴), scan-local with the metadata-sized
    * quota table broadcast — no per-source window, no single-task
    * partition, at any corpus size.
    */
  private[graft] def qTemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "source")
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
      .withColumn("weight",
        expr("cast(floor(sqrt(cast(n_total as double))) as bigint)"))
    val quotas = counts
      .crossJoin(broadcast(counts.agg(sum("weight").as("__w"))))
      .withColumn("quota", expr("(2000L * weight) div __w"))
    val kept = docs
      .withColumn("__b", expr(
        """cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)
          | as bigint) % 10000""".stripMargin))
      .join(broadcast(quotas.select("source", "n_total", "quota")),
        "source")
      .filter(col("__b") * col("n_total") < col("quota") * lit(10000L))
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    quotas.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"), col("weight"), col("quota"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** Seed-personalized trust propagation (q143,
    * [[PageRank.seededRanks]]): total mass starts on (and re-seeds
    * only at) the trusted customer whitelist (custkey % 10 = 0 →
    * node % 20 = 0 in q118's bipartite encoding), so after 3 damped
    * rounds every node's score measures proximity to the trusted set —
    * the TrustRank pass a curation pipeline runs from hand-vetted
    * seeds to score unvetted sources. Same exact integer arithmetic
    * and per-round plan shape as q118 (one equi-join + one partial-agg
    * shuffle, node-sized state).
    */
  private[graft] def qTrustRank(s: SparkSession, dir: String): DataFrame = {
    val half = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = edges.select(col("src").as("node")).distinct()
      .filter(col("node") % 20 === 0)
    PageRank.seededRanks(edges, "src", "dst", seeds, "node", 3)
      .orderBy(col("r").desc, col("node")).limit(20)
      .withColumn("pos", row_number().over(
        Window.orderBy(col("r").desc, col("node"))).cast("long"))
      .select(col("pos"),
        when(col("node") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        expr("node div 2").as("entity_key"),
        col("outdeg").as("degree"), col("is_seed"),
        col("r").as("trust_scaled"))
      .orderBy("pos")
  }

  /** Time travel over q130's versioned label store
    * ([[VersionedStore.readAt]]): the state AS OF micro-batch 1 —
    * clusters after the first two of three ingests — read straight
    * from the stored version, no replay. The oracle recomputes the
    * closure over exactly the first two ntile-chunks of the edge
    * stream, so a green row proves every intermediate version is the
    * true prefix state (the audit/backfill read production runs
    * against yesterday's labels).
    */
  private[graft] def qStateTimeTravel(s: SparkSession, dir: String): DataFrame =
    DedupClusters.withSizes(
        VersionedStore.readAt(s, labHistory(s, dir), 1L).getOrElse(
          sys.error("label version 1 missing")))
      .orderBy("doc_id")

  /** The label store's version history, built by ONE streaming run per
    * (session, corpus) — q135's stored-artifact fixture (the q128/q129
    * discipline): the versions are immutable once the stream commits,
    * so trials measure the time-travel READ, not a pipeline re-run
    * (q130 already measures the pipeline).
    */
  private[graft] val labHistoryCache = scala.collection.mutable.Map
    .empty[(String, String), String]

  private[graft] def labHistory(s: SparkSession, dir: String): String =
    sessionFixture(labHistoryCache, s, dir) {
      IncrementalClusters.runWithHistory(
        s, dedupPairsParquet(s, dir), chunks = 3)._2
    }

  /** Incremental BM25 retrieval-statistics maintenance (q136): the
    * retrieval-index member of the incremental axis. The index state
    * of a search deployment is (a) per-doc postings — APPEND-ONLY, a
    * batch only adds its own rows — and (b) the tiny global stats the
    * scoring function reads (N, Σdl, per-term df), every one a
    * commutative monoid (counts add). So a daily crawl folds into the
    * stored stats WITHOUT rescanning history text — the q121 partial-
    * merge argument applied to retrieval — and scoring with merged
    * stats must be bit-identical to scoring a full recompute, which is
    * exactly what sharing q116's oracle proves (same discipline as
    * q128/q130 sharing q71's). History artifacts (postings + df +
    * stats, the stored index tables) are built once per (session,
    * corpus): the doc_id % 5 != 0 docs, the q67/q128 history/arrival
    * convention.
    */
  private[graft] val bm25StatsCache = scala.collection.mutable.Map
    .empty[(String, String), (String, String, String)]

  private[graft] def bm25HistArtifacts(s: SparkSession,
      dir: String): (String, String, String) =
    sessionFixture(bm25StatsCache, s, dir) {
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val tmp = System.getProperty("java.io.tmpdir")
      val hist = bm25Docs(t(s, dir, "documents")
        .filter(col("doc_id") % 5 =!= 0))
      val postings = bm25Postings(hist).localCheckpoint()
      val pPath = graft.Scratch.register(s"$tmp/graft_bm25_post_$tag")
      val dPath = graft.Scratch.register(s"$tmp/graft_bm25_df_$tag")
      val sPath = graft.Scratch.register(s"$tmp/graft_bm25_stats_$tag")
      postings.write.mode("overwrite").parquet(pPath)
      postings.groupBy("term").agg(count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(dPath)
      hist.agg(count(lit(1)).as("__n"), sum("dl").as("__sumdl"))
        .write.mode("overwrite").parquet(sPath)
      (pPath, dPath, sPath)
    }

  private[graft] def qIncrBm25(s: SparkSession, dir: String): DataFrame = {
    val (pPath, dPath, sPath) = bm25HistArtifacts(s, dir)
    // the arriving batch: only ITS text is scanned
    val batch = bm25Docs(t(s, dir, "documents")
      .filter(col("doc_id") % 5 === 0))
    val bPostings = bm25Postings(batch).transform(snap)
    // stats fold: every piece a monoid — df outer-merges (a term may
    // be new, historical, or both), N and Σdl add
    val mergedDf = s.read.parquet(dPath)
      .select(col("term"), col("df").as("__dh"))
      .join(bPostings.groupBy("term").agg(count(lit(1)).as("__db")),
        Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("__dh"), lit(0L)) + coalesce(col("__db"), lit(0L)))
          .as("df"))
    val mergedStats = s.read.parquet(sPath)
      .unionByName(batch.agg(count(lit(1)).as("__n"),
        sum("dl").as("__sumdl")))
      .agg(sum("__n").as("__n"), sum("__sumdl").as("__sumdl"))
    // postings union: history rows come from the STORED table (no
    // history text in the plan), filtered to the query terms before
    // the union so only metadata-sized rows move
    val tf = s.read.parquet(pPath)
      .filter(col("term").isin(bm25Terms: _*))
      .unionByName(bPostings.filter(col("term").isin(bm25Terms: _*)))
    bm25TopK(tf,
      mergedDf.filter(col("term").isin(bm25Terms: _*)), mergedStats)
  }

  /** Nested build → explode → aggregate (q202, [[graft.ops.Nested]]):
    * the `array<struct>` annotation column is constructed by ONE
    * scan-local O(n) pass of the native
    * [[graft.expressions.TokenSpans]] expression (offsets are an
    * in-expression prefix sum — no window, no join), then exploded
    * and rolled up per label. Only (doc_id, label, span ints) ever
    * shuffle — the text never leaves the scan stage. The oracle
    * rebuilds the identical spans the structurally opposite way
    * (unnest + a windowed prefix sum over token lengths), so green
    * proves the native pass ≡ window.
    */
  private[graft] def qNestedExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("anns", Nested.tokenAnnotations("toks"))
      .select(col("doc_id"), explode(col("anns")).as("a"))
      .groupBy(col("a.label").as("label"))
      .agg(count(lit(1)).as("n_spans"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum((col("a.span_end") - col("a.span_start")).cast("long"))
          .as("sum_len"),
        max(col("a.span_end").cast("long")).as("max_end"))
      .orderBy("label")

  /** The annotated corpus STORED as nested parquet — the fixture for
    * q203's schema-pruned read (and the realistic at-rest shape: a
    * 100 TB annotated corpus is one nested table, not a doc table plus
    * an exploded span table). Built once per (session, corpus); the
    * cache holds only the path — the artifact of record is the parquet.
    */
  private[graft] val nestedFileCache = scala.collection.mutable.Map
    .empty[(String, String), String]

  private[graft] def annotatedDocsParquet(s: SparkSession, dir: String): String =
    sessionFixture(nestedFileCache, s, dir) {
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val path = graft.Scratch.register(
        s"${System.getProperty("java.io.tmpdir")}/graft_nested_docs_$tag")
      t(s, dir, "documents")
        .withColumn("toks",
          expr("filter(split(text, ' '), t -> t <> '')"))
        .withColumn("annotations", Nested.tokenAnnotations("toks"))
        .select("doc_id", "source", "lang", "n_chars", "text",
          "annotations")
        .write.mode("overwrite").parquet(path)
      path
    }

  /** Nested-field projection over the stored annotated corpus (q203):
    * reads ONLY `source` and `annotations.label` — nested schema
    * pruning pushes the sub-field selection into the parquet scan, so
    * neither the span ints nor the (dominant) `text` column is ever
    * decoded (PlanSpec-asserted on the executed ReadSchema). The
    * at-scale point: label statistics over an annotated 100 TB corpus
    * cost a metadata-sized read, not a corpus read. Oracle derives the
    * same counts from the flat table (labels are a deterministic
    * function of the tokens), proving store → prune → explode lost
    * nothing.
    */
  private[graft] def qNestedPrune(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(annotatedDocsParquet(s, dir))
      .select(col("source"), explode(col("annotations.label")).as("label"))
      .groupBy("source", "label")
      .agg(count(lit(1)).as("n_spans"))
      .orderBy("source", "label")

  /** Scan-local nested aggregation (q209): per-document span
    * statistics computed INSIDE the annotation array with
    * size/filter/transform/array_max — no explode, no Generate in the
    * plan (PlanSpec-asserted) — so the shuffle carries three scalars
    * per document instead of one row per span. At 100 TB this is the
    * difference between aggregating a span-count column and first
    * materializing a corpus × avg-spans row explosion; reads the
    * stored nested fixture with the same pruned scan as q203.
    */
  private[graft] def qNestedScanAgg(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(annotatedDocsParquet(s, dir))
      .select(col("source"),
        size(col("annotations")).cast("long").as("ns"),
        expr("cast(size(filter(annotations, a -> a.label = 'long')) " +
          "as bigint)").as("nl"),
        expr("cast(coalesce(array_max(transform(annotations, " +
          "a -> a.span_end - a.span_start)), 0) as bigint)").as("ml"))
      .groupBy("source")
      .agg(sum("ns").as("n_spans"), sum("nl").as("n_long_spans"),
        max("ml").as("max_span_len"))
      .orderBy("source")

  /** Span-level flatten feeding the exact-dedup family (q204): explode
    * the nested annotations, slice each span's text back out of the
    * joined token text by its [span_start, span_end) offsets, md5 it
    * (the [[TextFns]] fingerprint convention), and count total vs
    * distinct spans per source. Only (source, fp) pairs shuffle —
    * span text is hashed inside the scan stage. The oracle fingerprints
    * the TOKENS directly (never touching offsets), so a green hash is
    * an end-to-end proof that every stored offset slices back exactly
    * its own token.
    */
  private[graft] def qSpanDedup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("joined", concat_ws(" ", col("toks")))
      .withColumn("anns", Nested.tokenAnnotations("toks"))
      .select(col("source"), col("joined"), explode(col("anns")).as("a"))
      .select(col("source"), md5(expr(
        "substring(joined, a.span_start + 1, a.span_end - a.span_start)"))
        .as("fp"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_spans"),
        countDistinct(col("fp")).as("n_distinct_spans"))
      .orderBy("source")

  /** Merge-count for the q206/q207 BPE fixture: small enough that the
    * oracle's round-per-CTE replay stays readable, large enough that
    * later merges build on earlier ones (multi-char symbols appear).
    */
  private[graft] val bpeRounds = 6

  /** The corpus word-count table BPE trains on (one shuffle). */
  private[graft] def bpeWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')"))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** BPE merge training + model store roundtrip (q206,
    * [[graft.ops.Bpe]]): train [[bpeRounds]] merges inline (the
    * q71/q118 BSP measurement — like q71, this query IS the
    * full-pipeline demonstration and retrains every trial), persist
    * the chain via [[ModelStore.saveMerges]], read it back, and emit
    * it. The oracle replays the ENTIRE training loop — pair counting,
    * the (count DESC, s1, s2) argmax, and the leftmost-nonoverlapping
    * contraction — round by round in SQL, so green proves the whole
    * iterative computation, not just a summary statistic.
    */
  private[graft] def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    val merges = Bpe.train(bpeWords(s, dir), "w", "cnt", bpeRounds)
    val tag = (s.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val path = Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_bpe_merges_$tag")
    ModelStore.saveMerges(s, path, merges)
    import s.implicits._
    ModelStore.loadMerges(s, path)
      .map(m => (m.rank.toLong, m.s1, m.s2))
      .toDF("rank", "s1", "s2")
      .orderBy("rank")
  }

  /** Stored merge chain, trained once per (session, corpus) — q207's
    * input artifact (q206 keeps retraining inline as the measured
    * demonstration; this is the deployed-tokenizer read path).
    */
  private[graft] val bpeMergeCache = scala.collection.mutable.Map
    .empty[(String, String), Seq[Bpe.Merge]]

  private[graft] def bpeMerges(s: SparkSession, dir: String): Seq[Bpe.Merge] =
    sessionFixture(bpeMergeCache, s, dir) {
      val merges = Bpe.train(bpeWords(s, dir), "w", "cnt", bpeRounds)
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val path = Scratch.register(
        s"${System.getProperty("java.io.tmpdir")}/graft_bpe_model_$tag")
      ModelStore.saveMerges(s, path, merges)
      ModelStore.loadMerges(s, path)
    }

  /** Scan-local BPE application under the stored merge chain (q207):
    * the whole document becomes ONE wrapped symbol string (word
    * boundaries un-fusable by construction) and the chain applies as
    * [[bpeRounds]] composed `replace` calls with the merges as plan
    * literals — fully inside whole-stage codegen, no join, no
    * shuffle; token counts fall out as delimiter arithmetic. This is
    * the deployed-tokenizer cost shape at 100 TB: corpus-sized scan,
    * metadata-sized model.
    */
  private[graft] def qBpeApply(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("seq", Bpe.docSeq("toks"))
      .withColumn("seq2", Bpe.applyMerges("seq", bpeMerges(s, dir)))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_ws_tokens"),
        Bpe.symbolCount("seq2").as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** The q206/q207 oracle's training replay: round r's CTEs compute
    * pair counts over state s(r−1) (p{r}), the deterministic argmax
    * (b{r}), and the contracted state (s{r}) — the same leftmost-
    * nonoverlapping `replace` the engine uses.
    */
  private[graft] def bpeChainCtes(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """wd AS (SELECT w, COUNT(*) AS cnt FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '),
        |        x -> x <> '')) AS w
        |    FROM documents) GROUP BY 1),
        |  s0 AS (SELECT chr(31) || array_to_string(
        |      list_transform(range(1, length(w) + 1),
        |        i -> substr(w, i, 1)), chr(31) || chr(31)) || chr(31)
        |      AS seq,
        |      CAST(cnt AS BIGINT) AS cnt FROM wd)""".stripMargin)
    for (r <- 1 to k) {
      sb.append(s""",
        p$r AS (SELECT list_extract(syms, i) AS s1,
            list_extract(syms, i + 1) AS s2, cnt
          FROM (SELECT syms, cnt,
              unnest(range(1, len(syms))) AS i
            FROM (SELECT string_split(substr(seq, 2, length(seq) - 2),
                chr(31) || chr(31)) AS syms, cnt FROM s${r - 1}))),
        b$r AS (SELECT s1, s2 FROM p$r GROUP BY s1, s2
          ORDER BY SUM(cnt) DESC, s1, s2 LIMIT 1),
        s$r AS (SELECT replace(seq,
            chr(31) || b.s1 || chr(31) || chr(31) || b.s2 || chr(31),
            chr(31) || b.s1 || b.s2 || chr(31)) AS seq, cnt
          FROM s${r - 1}, b$r b)""")
    }
    sb.toString
  }

  /** Real-codec media decode (q208, [[Multimodal.decodePpm]]): every
    * document becomes a genuine binary PPM (P6) file — deterministic
    * dims 4+id%5 × 3+id%4 so header PARSING is actually exercised, a
    * (id·31+j) mod 256 raster — and the real decoder (magic check,
    * whitespace/comment-tolerant header ints, raster walk) extracts
    * dims, per-channel sums, and the whole-file checksum. Same
    * mapPartitions seam as the stub codecs (q30/q61/q193); swapping
    * PPM for JPEG changes only the parser. The oracle recomputes every
    * decoded number from the generation rule (ASCII header sum +
    * closed-form raster sums), so green means the decode is RIGHT, not
    * merely deterministic.
    */
  private[graft] def qPpmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sp: SparkSession = s
    val media = t(s, dir, "documents")
      .select(col("doc_id").cast("long"))
      .repartition(col("doc_id"))
      .as[Long]
      .map { id =>
        Multimodal.MediaRecord(id,
          Multimodal.encodePpm(id, (4 + id % 5).toInt, (3 + id % 4).toInt),
          "ppm")
      }
    Multimodal.decodePpmFeatures(media).toDF().orderBy("doc_id")
  }

  /** Real raster resize through the codec (q210,
    * [[Multimodal.resizePpmHalf]]): encode → decode → nearest-neighbor
    * half-resize ON THE 2-D GRID (out(x,y) = in(2x,2y) — the actual
    * image op the byte-stride stub q61 stands in for) → re-encode a
    * valid P6 → decode THAT for the features, so the whole
    * encode/decode/resize/encode/decode chain is exercised. Oracle
    * recomputes the sampled grid in closed form from the generation
    * rule. Scan shape identical to q208: mapPartitions codec, payloads
    * never shuffle.
    */
  private[graft] def qPpmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sp: SparkSession = s
    val media = t(s, dir, "documents")
      .select(col("doc_id").cast("long"))
      .repartition(col("doc_id"))
      .as[Long]
      .map { id =>
        val full = Multimodal.encodePpm(id,
          (4 + id % 5).toInt, (3 + id % 4).toInt)
        Multimodal.MediaRecord(id,
          Multimodal.resizePpmHalf(id, full), "ppm")
      }
    Multimodal.decodePpmFeatures(media).toDF().orderBy("doc_id")
  }

  /** Char-bigram LM training + model store roundtrip (q211,
    * [[graft.ops.CharLm]]): ONE scan-local bigram expansion into one
    * (c1, c2) partial-agg shuffle, stored as a parquet model table
    * (alphabet² rows — metadata), read back and emitted. Like q206,
    * this query IS the training demonstration and retrains per trial.
    */
  private[graft] def qCharLmTrain(s: SparkSession, dir: String): DataFrame = {
    val model = CharLm.trainBigrams(t(s, dir, "documents"), "text")
    val tag = (s.sparkContext.applicationId + "_" + dir)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val path = Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_charlm_$tag")
    model.coalesce(1).write.mode("overwrite").parquet(path)
    s.read.parquet(path).orderBy("c1", "c2")
  }

  /** Stored char-LM model path, trained once per (session, corpus) —
    * q212's input artifact (the deployed-filter read path).
    */
  private[graft] val charLmCache = scala.collection.mutable.Map
    .empty[(String, String), String]

  private[graft] def charLmModelPath(s: SparkSession, dir: String): String =
    sessionFixture(charLmCache, s, dir) {
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val path = Scratch.register(
        s"${System.getProperty("java.io.tmpdir")}/graft_charlm_m_$tag")
      CharLm.trainBigrams(t(s, dir, "documents"), "text")
        .coalesce(1).write.mode("overwrite").parquet(path)
      path
    }

  /** Statistical quality scoring under the stored char-LM (q212) —
    * the KenLM-filter shape in its exact-integer core: the
    * metadata-sized model BROADCASTS onto the scan-local bigram
    * stream, contributions are (cnt·2^20) div tot truncating longs,
    * and only (doc_id, counters) shuffle. Scoring cost at 100 TB is
    * one corpus scan + one doc-keyed reduce; the model is a stored,
    * versionable table. Oracle re-derives the model AND the scores in
    * SQL, so the whole train → store → score chain is gate-checked.
    */
  private[graft] def qCharLmScore(s: SparkSession, dir: String): DataFrame =
    CharLm.score(t(s, dir, "documents"), "doc_id", "text",
        s.read.parquet(charLmModelPath(s, dir)))
      .orderBy("doc_id")

  /** Streaming LM quality screen (q213,
    * [[graft.streaming.LmScreen]]): documents arrive in 3
    * micro-batches and are gated scan-locally against the STORED
    * char-bigram model (the [[qCharLmScore]] artifact) — the deployed
    * KenLM-filter: training offline, admission a per-batch scan whose
    * cost is independent of corpus history. Verdicts append
    * per batch (docs arrive once → the union is the corpus answer)
    * and the oracle replays model + scores + threshold for every doc.
    */
  private[graft] def qStreamLmScreen(s: SparkSession, dir: String): DataFrame =
    graft.streaming.LmScreen.run(s, s"$dir/documents.parquet",
      s.read.parquet(charLmModelPath(s, dir)), minAvgQ = 270000L)

  /** Winnowing memorization audit (q214, [[graft.ops.Winnowing]]):
    * the top repeated 30-char sequences across the corpus by document
    * count — Schleimer et al.'s guarantee means every shared run of
    * ≥ 37 chars (L + w − 1) surfaces, with NO pairwise comparison:
    * scan-local gram expansion, the per-window-min selection (min of
    * SOME covering w-window — the context-free rule that makes the
    * guarantee hold at the exact boundary), keeping ~2/(w+1) of the
    * stream, then one distinct + one partial-agg shuffle of selected
    * grams only. The boilerplate/license/template detector a 100 TB
    * pretraining corpus is audited with before dedup parameters are
    * chosen. Oracle replays the identical window + selection + count.
    */
  private[graft] def qMemorizationAudit(s: SparkSession, dir: String): DataFrame =
    Winnowing.repeatedGrams(t(s, dir, "documents"), "doc_id", "text",
      l = 30, w = 8, topK = 20)

  /** Directed near-containment pairs (q217,
    * [[NearDup.ngramContainmentPairs]]): the asymmetric dedup
    * predicate at the q64 parameters (3-gram, df ≤ 100) with an 80 %
    * containment floor — catching the excerpt/quote-expansion
    * redundancy symmetric Jaccard dilutes away. Exact-integer
    * predicate and basis-point score; the oracle replays the same
    * inverted index with both directions unioned.
    */
  private[graft] def qContainmentPairs(s: SparkSession, dir: String): DataFrame =
    NearDup.ngramContainmentPairs(t(s, dir, "documents"), "doc_id",
        "text", n = 3, minPct = 80, maxDf = 100L)
      .orderBy("contained", "container")

  /** Per-source diversity profile (q218) — the repetitiveness report
    * beside E-Gopher's per-DOC filters (q55 flags one document's
    * repetition; this profiles a SOURCE'S aggregate diversity, the
    * number a mixing policy weighs): type-token ratio and distinct
    * 3-gram share in exact basis points (truncating div — no
    * doubles), token/type/gram counts. One scan-local token + gram
    * expansion (the q177 discipline), three partial-agg shuffles of
    * (source, token/gram) keyed counts — text never shuffles. A
    * low-diversity source at 100 TB is boilerplate; this is the table
    * that catches it before the mixer trusts its token count.
    */
  private[graft] def qDiversityProfile(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"),
        expr("filter(split(text, ' '), t -> t <> '')").as("toks"))
      .transform(snap)
    val tokenStats = toks
      .select(col("source"), explode(col("toks")).as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("n_types"))
    val gramStats = toks
      .select(col("source"), explode(expr(
        """case when size(toks) < 3
          |  then cast(array() as array<string>)
          |  else transform(sequence(1, size(toks) - 2),
          |    i -> concat_ws(' ', element_at(toks, i),
          |      element_at(toks, i + 1), element_at(toks, i + 2))) end"""
          .stripMargin)).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct_grams"))
    tokenStats.join(gramStats, Seq("source"))
      .withColumn("ttr_bp", expr("(n_types * 10000L) div n_tokens"))
      .withColumn("gram_diversity_bp",
        expr("(n_distinct_grams * 10000L) div n_grams"))
      .orderBy("source")
  }

  /** Purged temporal split with an embargo gap (q219) — the
    * leakage-guard member for TIME: q132 guards identity leakage
    * (cluster-keyed), q161/q198 guard feature-time leakage
    * (point-in-time reads); this guards the SPLIT BOUNDARY itself —
    * an event just before the cutoff leaks into training through any
    * trailing-window feature (q196's 1 h horizons) that straddles it,
    * so the hour before the cutoff is embargoed out of training
    * entirely (the purged-split discipline from financial ML, applied
    * to behavioral pretraining data). Cutoff = lo + (hi − lo)·8 div 10
    * epoch-ms — two driver-side metadata aggregates, then ONE
    * scan-local split assignment and one partial-agg rollup; exact
    * integers throughout.
    */
  private[graft] def qEmbargoSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("unix_millis(ts)").as("ms"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)")
          .as("cents"))
    val mm = ev.agg(min("ms").as("lo"), max("ms").as("hi")).head()
    val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) * 8L / 10L
    val emb = cut - 3600000L
    ev
      .withColumn("split",
        when(col("ms") < emb, "train")
          .when(col("ms") < cut, "embargo")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum("cents").as("sum_cents"),
        min("ms").as("min_ms"), max("ms").as("max_ms"))
      .orderBy("split")
  }

  /** Incremental gram-novelty audit (q220) — "how much NEW text does
    * this crawl actually add": the arriving split's (doc, 3-gram)
    * pairs anti-joined against the STORED corpus gram-hash set (the
    * q67/q128 arrival convention: doc_id % 5 == 0 arrives, the rest
    * is history), per-source novelty in exact basis points. A source
    * whose arrivals are ~0 bp novel is re-crawled duplication — drop
    * it before dedup even runs; this is the cheap pre-dedup triage
    * (one hash anti-join) that saves the expensive pairwise machinery
    * for corpora that need it. Only 32-byte hashes shuffle; the
    * history set is a stored artifact (session fixture), so repeated
    * trials measure the audit, not history construction — and it is
    * stored as a catalog table BUCKETED AND SORTED on `gh` (8
    * buckets), so every probe (this audit and q223's per-micro-batch
    * screen) shuffles only the ARRIVING grams into the history's
    * bucketing: no history re-shuffle, ever (PlanSpec asserts no
    * Exchange above the bucketed scan). At 100 TB the history gram
    * set is trillions of rows — re-shuffling it per probe is the
    * difference between a monitor and a nightly job.
    */
  private[graft] val novHistCache = scala.collection.mutable.Map
    .empty[(String, String), String]

  private[graft] def novHistoryTable(s: SparkSession, dir: String): String =
    sessionFixture(novHistCache, s, dir) {
      val tag = (s.sparkContext.applicationId + "_" + dir)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val tbl = s"graft_novhist_$tag"
      t(s, dir, "documents")
        .filter(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
        .select(explode(Contamination.wordGrams("__toks", 3)).as("__g"))
        .select(md5(col("__g")).as("gh"))
        .distinct()
        // coarse gh-prefix PARTITION column on top of the bucketing:
        // a probe filters the scan to the prefixes its own grams touch
        // (static partition pruning — see NoveltyMonitor.noveltyCounts),
        // so a small batch against a trillion-gram history reads only
        // its prefixes' buckets instead of the whole table
        .withColumn("ghp", substring(col("gh"), 1, 1))
        .write.mode("overwrite").format("parquet")
        .partitionBy("ghp")
        .bucketBy(8, "gh").sortBy("gh").saveAsTable(tbl)
      tbl
    }

  private[graft] def qGramNovelty(s: SparkSession, dir: String): DataFrame = {
    val arriving = graft.streaming.NoveltyMonitor.gramHashes(
      t(s, dir, "documents").filter(col("doc_id") % 5 === 0))
    graft.streaming.NoveltyMonitor
      .noveltyCounts(s, arriving, novHistoryTable(s, dir))
      .orderBy("source")
  }

  /** Quality-signal agreement audit (q221) — before swapping the
    * heuristic filter for the learned one, production asks "do the two
    * signals even agree": the Pearson correlation between the stored
    * char-LM score (E206's avg_q) and each document's surface
    * type-token ratio, computed from exact int64 sufficient statistics
    * (the q190 discipline: both signals REBASED by their minima so
    * n·Σx² stays far under 2⁶³ — x spreads ~10⁴ after rebase, good to
    * ~3·10⁵ docs at these magnitudes; beyond that the quantization
    * must be rebased, and the bound is now ENFORCED by a raise_error
    * guard on every cross product, checked in decimal(38,0))
    * with ONE double expression at the end — identical IEEE ops on
    * identical longs, so the double is bit-stable across engines.
    * One scan + one metadata min-pair + one single-row aggregate.
    */
  /** The exact-integer Pearson numerator/denominator over sufficient
    * statistics (n, sum_x, sum_y, sxy, sxx, syy), with the 2⁶²
    * headroom of every cross product ENFORCED by a raise_error (the
    * PosBits/pairEnc house pattern): the bigint subtractions n·Σxy −
    * Σx·Σy etc. wrap silently in non-ANSI Spark once any product
    * crosses 2⁶³, so each is bound-checked in decimal(38,0) — which
    * cannot itself overflow — before the double arithmetic runs. The
    * guard lives inside the corr expression so column pruning cannot
    * drop it. Package-visible so the spec can drive the raise with
    * synthetic statistics (the corpus fixture never trips it).
    */
  private[graft] val guardedCorrExpr: String =
    """case when cast(n as decimal(38,0)) * sxx
      |         < 4611686018427387904
      |       and cast(n as decimal(38,0)) * syy
      |         < 4611686018427387904
      |       and abs(cast(sum_x as decimal(38,0)) * sum_x)
      |         < 4611686018427387904
      |       and abs(cast(sum_y as decimal(38,0)) * sum_y)
      |         < 4611686018427387904
      |       and abs(cast(n as decimal(38,0)) * sxy)
      |         < 4611686018427387904
      |       and abs(cast(sum_x as decimal(38,0)) * sum_y)
      |         < 4611686018427387904
      |  then cast(n * sxy - sum_x * sum_y as double) /
      |    sqrt(cast(n * sxx - sum_x * sum_x as double) *
      |      cast(n * syy - sum_y * sum_y as double))
      |  else raise_error(concat(
      |    'qSignalCorrelation: sufficient-statistic product ',
      |    'exceeds the 2^62 bigint headroom at n = ',
      |    cast(n as string),
      |    ' - rebase the signal quantization before correlating'))
      |  end""".stripMargin

  private[graft] def qSignalCorrelation(s: SparkSession, dir: String): DataFrame = {
    val lm = CharLm.score(t(s, dir, "documents"), "doc_id", "text",
        s.read.parquet(charLmModelPath(s, dir)))
      .select(col("doc_id"), col("avg_q").as("x"))
    val ttr = t(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"),
        expr("cast(size(array_distinct(tk)) * 10000L div size(tk) " +
          "as bigint)").as("y"))
    val joined = lm.join(ttr, "doc_id").transform(snap)
    val mn = joined.agg(min("x"), min("y")).head()
    joined
      .select((col("x") - mn.getLong(0)).as("x"),
        (col("y") - mn.getLong(1)).as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sum_x"),
        sum("y").as("sum_y"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // the documented Σx² headroom, ENFORCED (the PosBits/pairEnc
      // house pattern) — see [[guardedCorrExpr]]
      .withColumn("corr", expr(guardedCorrExpr))
  }

  /** Winnowing-based PARTIAL contamination detection (q222) — the
    * E208 machinery pointed at the benchmark-leak family: q53/q110
    * match whole word-grams/paragraphs, so an eval item paraphrased
    * around a verbatim 40-char span slips through; winnowing
    * fingerprints guarantee every shared character run ≥ L+w−1 (37
    * chars at L=30, w=8) yields a common selected gram, so PARTIAL
    * verbatim overlap is caught with no pairwise comparison. Same
    * doc_id % 50 eval split as q53; the eval fingerprint set is
    * metadata-sized and the join is one semi-ish equi-join of
    * selected grams — corpus text never shuffles.
    */
  private[graft] def qWinnowContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalFps = Winnowing.selectedGrams(
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
        l = 30, w = 8)
      .select(col("gram")).distinct()
    val corpusFps = Winnowing.selectedGrams(
        docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
        l = 30, w = 8)
    corpusFps
      .join(broadcast(evalFps), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .orderBy("doc_id")
  }

  /** Streaming novelty monitor (q223,
    * [[graft.streaming.NoveltyMonitor]]): q220's audit run LIVE — each
    * arriving micro-batch's per-doc-distinct 3-grams anti-joined
    * against the STORED corpus gram set, per-(batch, source) novelty
    * appended as it lands, so a crawler re-fetching old content is
    * caught batch-by-batch. No history re-shuffle per batch: the
    * stored gram set is the q220 fixture's BUCKETED-on-`gh` catalog
    * table, and the merge-hinted anti-join shuffles only the batch's
    * grams into its bucketing (the history is still scanned per
    * batch — see [[graft.streaming.NoveltyMonitor]] for the precise
    * claim). The oracle replays batch membership via the staging
    * NTILE and the identical anti-join per batch.
    */
  private[graft] def qStreamNovelty(s: SparkSession, dir: String): DataFrame =
    graft.streaming.NoveltyMonitor.run(s, s"$dir/documents.parquet",
      novHistoryTable(s, dir), docFilter = col("doc_id") % 5 === 0)

  /** Row-level snapshot diff classification (q224) — the migration
    * sign-off table: q92 LOCALIZES divergence (bucket checksums say
    * where to look), q160 APPLIES changes (CDC merge); this COUNTS
    * them by kind — added / removed / changed / unchanged — which is
    * the number a cutover is approved on. One full-outer equi-join on
    * the key carrying only 32-byte row hashes (values never shuffle);
    * the same chr(1) null-sentinel discipline as q92 (guard AFTER the
    * mutation on both sides), a deterministic synthetic v2 (mutate
    * %97, drop %89, clone %83 at +10⁶ ids). Exact counts, fully
    * replayable.
    */
  private[graft] def qRowDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    def hashed(df: DataFrame) = df.select(col("doc_id"),
      md5(concat_ws("\u0001",
        coalesce(col("text"), lit("\u0001")),
        coalesce(col("lang"), lit("\u0001")),
        coalesce(col("source"), lit("\u0001")),
        col("n_chars").cast("string"))).as("h"))
    val v2base = docs
      .filter(col("doc_id") % 89 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 97 === 0, concat(col("text"), lit("X")))
          .otherwise(col("text")))
    val additions = docs.filter(col("doc_id") % 83 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    hashed(docs).select(col("doc_id"), col("h").as("h1"))
      .join(hashed(v2base.unionByName(additions))
          .select(col("doc_id"), col("h").as("h2")),
        Seq("doc_id"), "full_outer")
      .select(when(col("h1").isNull, "added")
        .when(col("h2").isNull, "removed")
        .when(col("h1") =!= col("h2"), "changed")
        .otherwise("unchanged").as("change_type"))
      .groupBy("change_type").agg(count(lit(1)).as("n_rows"))
      .orderBy("change_type")
  }

  /** Join-size estimation report (q225, [[graft.ops.JoinEstimate]]):
    * the CMS-inner-product estimate of an equi-join's output
    * cardinality next to the exact recount — once for the reference
    * engine's own star join key (orders ⋈ lineitem on orderkey, the
    * 1:N shape) and once for the skew-sensitive many-many case a
    * planner most needs it (lineitem self-join on partkey, size
    * Σ f(p)²). The sketch is built with the portable md5 bucket
    * hash, so the oracle replays the ESTIMATOR itself — counter
    * matrices, per-depth inner products, min — not just the exact
    * verification columns. d=4 depth rows, w=2²⁴ buckets — the
    * matrix is SPARSE (zero buckets never materialize in a groupBy),
    * so the shuffled counter rows are ≤ d·|distinct keys| regardless
    * of w, while the collision error shrinks as n_A·n_B/w; sizing w
    * ≫ that ratio is what makes the estimate TIGHT (measured err_bp
    * ships in the row), not merely bounded.
    */
  private[graft] def qJoinSizeEstimate(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    val starCase = JoinEstimate.joinSize(
        orders, col("o_orderkey"), lineitem, col("l_orderkey"), 4, 1 << 24)
      .select(lit("orders_x_lineitem_orderkey").as("join_case"),
        col("est_pairs"), col("exact_pairs"),
        col("overestimate_ok"), col("err_bp"))
    val selfCase = JoinEstimate.joinSize(
        lineitem, col("l_partkey"), lineitem, col("l_partkey"), 4, 1 << 24)
      .select(lit("lineitem_self_partkey").as("join_case"),
        col("est_pairs"), col("exact_pairs"),
        col("overestimate_ok"), col("err_bp"))
    starCase.unionByName(selfCase).orderBy("join_case")
  }

  /** Rendezvous-sharding rebalance report (q226,
    * [[graft.ops.Sharding]]): every document routed under 8 and
    * under 9 shards by BOTH routers — HRW and naive mod — and the
    * per-(new-)shard movement counted. The table shows the resize
    * economics a 100 TB store plans around: HRW moves ~1/9 of docs
    * (only keys whose new shard's weight wins), mod remaps ~8/9 (a
    * full corpus rewrite). Each router's movement is grouped by ITS
    * OWN new-shard assignment — two scan-local partial-agg rollups
    * joined on the metadata-sized shard spine; text never shuffles.
    */
  private[graft] def qHrwSharding(s: SparkSession, dir: String): DataFrame = {
    val routed = t(s, dir, "documents").select(
      Sharding.hrwShard("doc_id", 8).as("h8"),
      Sharding.hrwShard("doc_id", 9).as("h9"),
      (col("doc_id") % 8).as("m8"),
      (col("doc_id") % 9).as("m9"))
    val hrw = routed.groupBy(col("h9").as("shard"))
      .agg(count(lit(1)).as("n_docs_hrw"),
        sum(when(col("h8") =!= col("h9"), 1L).otherwise(0L))
          .as("n_moved_hrw"))
    val mod = routed.groupBy(col("m9").as("shard"))
      .agg(count(lit(1)).as("n_docs_mod"),
        sum(when(col("m8") =!= col("m9"), 1L).otherwise(0L))
          .as("n_moved_mod"))
    hrw.join(mod, Seq("shard")).orderBy("shard")
  }

  /** k-anonymity audit with a generalization walk (q227): the
    * governance check beside E38's PII detection — BEFORE releasing a
    * training corpus with quasi-identifier columns, count how many
    * rows sit in QI groups smaller than k (re-identifiable by
    * joining public attributes). Three rungs of the generalization
    * lattice are audited together: L0 (nation, segment) → L1
    * (region, segment) → L2 (region) — the standard Samarati walk:
    * coarsen until every group reaches k. Per level: group count,
    * at-risk group count, rows at risk, and the achieved k (min
    * group size). Each level is one partial-agg rollup over the
    * broadcast nation dim; only (QI, count) pairs shuffle.
    */
  private[graft] def qKAnonymity(s: SparkSession, dir: String): DataFrame = {
    val k = 10L
    val joined = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
    def level(lvl: Long, qi: String, keys: Seq[Column]): DataFrame =
      joined.groupBy(keys: _*).agg(count(lit(1)).as("g"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("g") < k, 1L).otherwise(0L)).as("n_at_risk_groups"),
          sum(when(col("g") < k, col("g")).otherwise(0L))
            .as("n_rows_at_risk"),
          min(col("g")).as("k_achieved"))
        .select(lit(lvl).as("level"), lit(qi).as("qi"),
          col("n_groups"), col("n_at_risk_groups"),
          col("n_rows_at_risk"), col("k_achieved"))
    level(0L, "nation,segment",
        Seq(col("c_nationkey"), col("c_mktsegment")))
      .unionByName(level(1L, "region,segment",
        Seq(col("n_regionkey"), col("c_mktsegment"))))
      .unionByName(level(2L, "region", Seq(col("n_regionkey"))))
      .orderBy("level")
  }

  /** Incrementally-maintained join-size estimate (q228,
    * [[graft.ops.JoinEstimate]]): the q225 sketch under batch
    * arrival, the q67/q121/q136 incremental discipline applied to
    * shuffle planning. CMS counters are LINEAR — counters(history ∪
    * delta) = elementwise sum — so when a new lineitem batch lands,
    * the stored matrix absorbs the delta's d·w counters and the
    * estimate refreshes WITHOUT rescanning history. The gate proves
    * the algebra: the merged-counter estimate must EQUAL the
    * recomputed-from-scratch estimate (`linear_ok` — exact equality,
    * not a tolerance), alongside the measured error vs the exact
    * join size. History/delta split: l_orderkey % 10 (the repo's
    * deterministic batch-arrival convention).
    */
  private[graft] def qIncrJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    val (d, w) = (4, 1 << 24)
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    val history = lineitem.filter(col("l_orderkey") % 10 =!= 0)
    val delta = lineitem.filter(col("l_orderkey") % 10 === 0)
    val co = JoinEstimate.cmsCounters(orders, col("o_orderkey"), d, w)
    val merged = JoinEstimate.mergeCounters(
      JoinEstimate.cmsCounters(history, col("l_orderkey"), d, w),
      JoinEstimate.cmsCounters(delta, col("l_orderkey"), d, w))
    val scratch = JoinEstimate.cmsCounters(lineitem, col("l_orderkey"), d, w)
    val estIncr = JoinEstimate.estimateFromCounters(co, merged, d)
      .select(col("est_pairs").as("est_incr"))
    val estScratch = JoinEstimate.estimateFromCounters(co, scratch, d)
      .select(col("est_pairs").as("est_scratch"))
    val exact = orders.groupBy(col("o_orderkey").as("__k"))
      .agg(count(lit(1)).as("fa"))
      .join(lineitem.groupBy(col("l_orderkey").as("__k"))
        .agg(count(lit(1)).as("fb")), "__k")
      .agg(coalesce(sum(col("fa") * col("fb")), lit(0L)).as("exact_pairs"))
    estIncr.crossJoin(estScratch).crossJoin(exact).select(
      col("est_incr"), col("est_scratch"),
      (col("est_incr") === col("est_scratch")).as("linear_ok"),
      col("exact_pairs"),
      (col("est_incr") >= col("exact_pairs")).as("overestimate_ok"),
      when(col("exact_pairs") === 0L, 0L)
        .otherwise(expr(
          "(est_incr - exact_pairs) * 10000L div exact_pairs"))
        .as("err_bp"))
  }

  /** Exact-substring span excision (q229, [[graft.ops.SpanDedup]]):
    * repeated ≥8-token runs removed from every occurrence but the
    * corpus-first one, per-document removal accounting plus the
    * cleaned text. The published "exact substring dedup" operation
    * (suffix-array pipelines mark the same positions — a maximal
    * repeat of length L ≥ n is the union of its overlapping repeated
    * n-grams), and the surgical complement of q24 (whole-doc) and
    * q101 (whole-paragraph): the near-identical documents the
    * generator plants lose their shared body here but KEEP their
    * novel prefix/suffix tokens — visible in the output as short
    * `text_clean` remnants. Only gram hashes shuffle; the oracle
    * replays occurrences, canonical picks, the covered-token set,
    * island counting, and reconstruction in full.
    */
  private[graft] def qSpanExcision(s: SparkSession, dir: String): DataFrame =
    SpanDedup.excise(t(s, dir, "documents"), "doc_id", "text", n = 8)
      .orderBy("doc_id")

  /** DSIR importance-resampling selection (q230, [[graft.ops.Dsir]]):
    * the raw corpus re-tilted toward the English subset as target —
    * hashed-unigram count tables for target and raw, the scaled
    * smoothed odds model, per-doc truncating-mean scores, and the
    * best-first fill under a 20,000-token budget (q86's
    * [[Selection.underTokenBudget]] prefix-sum machinery — no
    * single-task window). The lang column rides along so the output
    * IS the measurement: the generator's per-language unigram
    * marginals differ, so the en share among selected docs visibly
    * exceeds its corpus share. 2^16 buckets — the model is
    * parameter-bounded and broadcast, never vocabulary-sized.
    */
  private[graft] def qDsirSelection(s: SparkSession, dir: String): DataFrame = {
    val buckets = 1 << 16
    val docs = t(s, dir, "documents")
    val target = Dsir.hashedCounts(
      docs.filter(col("lang") === "en"), "text", buckets)
    val raw = Dsir.hashedCounts(docs, "text", buckets)
    val scored = Dsir.score(docs, "doc_id", "text", target, raw, buckets)
    val withLang = docs.select(col("doc_id"), col("lang")).join(scored, "doc_id")
    Selection.underTokenBudget(withLang, "n_tokens", 20000L,
        col("score_q").desc, col("doc_id").asc)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("score_q"), col("cum_tok"))
      .orderBy("cum_tok")
  }

  /** Hierarchical two-level HRW sharding (q231,
    * [[graft.ops.Sharding.hrwShardWithin]]): the large-n form the
    * flat router's scaladoc prescribes — route over 8 super-shards,
    * then over an inner fan-out WITHIN the winner with a
    * super-shard-salted weight family (16 hashes/row for 64 shards
    * instead of 64). The report routes every document under inner
    * fan-outs 8 AND 9 and proves the per-level minimal-movement
    * property AS DATA: per super-shard, `n_moved_inner_resize` is the
    * ~1/9 HRW expectation and `n_moved_not_to_new` (keys that
    * changed inner shard but NOT onto the newly added one) is
    * structurally zero; movement cannot cross super-shards at all
    * because the super route does not read the inner fan-out. One
    * scan, one partial-agg rollup — shard arithmetic never shuffles
    * rows.
    */
  private[graft] def qHrwTwoLevel(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), Sharding.hrwShard("doc_id", 8).as("sup"))
      .select(col("doc_id"), col("sup"),
        Sharding.hrwShardWithin("doc_id", "sup", 8).as("i8"),
        Sharding.hrwShardWithin("doc_id", "sup", 9).as("i9"))
      .groupBy(col("sup").as("super_shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("i9") =!= col("i8"), 1L).otherwise(0L))
          .as("n_moved_inner_resize"),
        sum(when(col("i9") =!= col("i8") && col("i9") =!= 8L, 1L)
          .otherwise(0L)).as("n_moved_not_to_new"))
      .orderBy("super_shard")

  /** Hashed-vocabulary drift audit (q232, [[graft.ops.Drift]]): the
    * refresh-monitoring question — which parts of the token
    * distribution differ between the English and Chinese slices of
    * the corpus — as a ≤ buckets-row exact-integer report: every
    * hashed bucket whose slice frequency differs at ppm resolution,
    * with the drifted amount. 256 buckets; TV distance =
    * Σ d_ppm / 2·10⁶ is derivable from the rows (spec-pinned).
    */
  private[graft] def qVocabDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Drift.vocabDrift(docs.filter(col("lang") === "en"),
      docs.filter(col("lang") === "zh"), "text", 256)
  }

  /** Deterministic pseudonymization with referential integrity
    * (q233): the release-governance step after E221's k-anonymity
    * audit — user identifiers replaced by a salted-hash pseudonym
    * (md5, 16 hex chars) CONSISTENTLY across tables, so released
    * tables still join on the pseudonym without exposing the raw
    * key. The query proves referential integrity as data: events
    * aggregate under the pseudonym, customers pseudonymize
    * INDEPENDENTLY, and the output joins the two releases ON THE
    * PSEUDONYM — the market segment arrives through that join, and
    * no raw identifier appears in any output column. Injectivity at
    * corpus scale is spec-asserted (distinct pseudonyms = distinct
    * users). Scan-local hashing; one partial-agg + one broadcastable
    * dim join.
    */
  private[graft] def qPseudonymize(s: SparkSession, dir: String): DataFrame = {
    def pseudo(c: Column): Column =
      substring(md5(concat(lit("u#"), c.cast("string"))), 1, 16)
    val perUser = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"))
      .select(pseudo(col("user_id")).as("pseudo_id"),
        col("n_events"), col("n_event_types"))
    val custRelease = t(s, dir, "customer")
      .select(pseudo(col("c_custkey")).as("pseudo_id"),
        col("c_mktsegment").as("segment"))
    perUser.join(custRelease, "pseudo_id")
      .orderBy("pseudo_id")
  }

  /** Dictionary-based document tagging (q234): the lexicon screen a
    * curation pipeline runs for topic routing, blocklists, and
    * compliance terms — match every document against a term
    * dictionary and emit its tags. The dictionary is a BROADCAST
    * literal (parameter-bounded); matching is one scan-local
    * `array_intersect` on the token array — no explode, no join, no
    * shuffle of text; only tagged doc ids and their tag strings
    * leave the scan. At 100 TB this is a map-only pass.
    */
  private[graft] def qDictTags(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "join", "window", "filter", "scan")
    val termsArr = array(terms.map(lit): _*)
    t(s, dir, "documents")
      .select(col("doc_id"),
        array_sort(array_intersect(
          expr("filter(split(text, ' '), t -> t <> '')"), termsArr))
          .as("__tags"))
      .filter(size(col("__tags")) > 0)
      .select(col("doc_id"), size(col("__tags")).cast("long").as("n_tags"),
        array_join(col("__tags"), " ").as("tags"))
      .orderBy("doc_id")
  }

  /** Epoch-seeded deterministic corpus shuffle (q235): the training-
    * order primitive — each epoch's visit order is the ascending
    * md5(epoch # doc_id) hash, so the order is reproducible from the
    * seed alone, decorrelates across epochs, and needs NO stored
    * permutation table. The query emits the first 16 positions of
    * epochs 0–2 (a distributed TakeOrdered per epoch — top-k, never
    * a global sort); the production form for a full-corpus order is
    * a range-partitioned sort by the same hash, noted here rather
    * than run because the ORDER is the operator, not the 100 TB
    * rewrite. The position window runs on 48 surviving rows —
    * k-bounded, not corpus-bounded.
    */
  private[graft] def qEpochOrder(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    (0 to 2).map { e =>
      docs.select(lit(e.toLong).as("epoch"), col("doc_id"),
        md5(concat(lit(s"e$e#"), col("doc_id").cast("string")))
          .as("__h"))
        .orderBy(col("__h").asc, col("doc_id").asc)
        .limit(16)
    }.reduce(_ unionByName _)
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch").orderBy(col("__h").asc,
          col("doc_id").asc)).cast("long"))
      .select("epoch", "pos", "doc_id")
      .orderBy("epoch", "pos")
  }

  /** Source-concentration audit (q236): the mixing-governance
    * counterpart of E71's rebalancing — per-source token counts,
    * integer-ppm corpus shares, and the Herfindahl–Hirschman index
    * (Σ share², the standard concentration measure) over the whole
    * corpus, exact-integer at ppm scale. A training corpus whose
    * HHI approaches 10⁶ ppm is one source wearing a corpus costume;
    * the per-source rows name the offenders. One token-count scan,
    * one ≤ sources-group rollup, two broadcast scalars.
    */
  private[graft] def qSourceHhi(s: SparkSession, dir: String): DataFrame = {
    val perSrc = t(s, dir, "documents")
      .select(col("source"),
        expr("cast(size(filter(split(text, ' '), t -> t <> '')) as long)")
          .as("__ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("n_tokens"))
    val shares = perSrc
      .crossJoin(broadcast(perSrc.agg(sum(col("n_tokens")).as("__tot"))))
      .withColumn("share_ppm", expr("n_tokens * 1000000 div __tot"))
    shares
      .crossJoin(broadcast(shares
        .agg(expr("sum(share_ppm * share_ppm) div 1000000").as("hhi_ppm"))))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("share_ppm"), col("hhi_ppm"))
      .orderBy("source")
  }

  /** Cross-split near-duplicate leakage audit (q237): the check that
    * makes a train/val/test split TRUSTWORTHY — a validation document
    * whose near-duplicate sits in training is memorization leakage
    * regardless of how clean the split arithmetic is (q132 guards
    * cluster-identity leakage, q219 the time boundary; this guards
    * CONTENT). Composition of the q25 banded MinHash screen (exact
    * Jaccard ≥ 0.5 verified on band candidates only — never n² pairs)
    * with q46's md5-bucket split assignment: every verified near-dup
    * pair whose members land in DIFFERENT splits, with both splits
    * named. Split hashing is scan-local on the pair rows (two md5s per
    * surviving pair — pair-bounded, not corpus-bounded). At 100 TB the
    * cost is exactly q25's screen; the audit itself is free.
    */
  private[graft] def qSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    def splitOf(c: String): Column = {
      val bucket = expr(
        s"""cast(conv(substring(md5(cast($c as string)), 1, 8), 16, 10)
           | as bigint) % 100""".stripMargin)
      when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    }
    val docs = t(s, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("shingles", TextFns.shingles("text", 5))
      .select("doc_id", "shingles")
      .transform(snap)
    val sigs = NearDup.minHashSigs(docs, "doc_id", "shingles", 32, "sig")
    val cand = NearDup.candidatePairs(
      NearDup.bandRows(sigs, "doc_id", "sig", 4, 8, 32), "doc_id")
    NearDup.jaccard(cand, docs, "doc_id", "shingles")
      .filter(col("jaccard") >= 0.5)
      .withColumn("split_a", splitOf("id_a"))
      .withColumn("split_b", splitOf("id_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "jaccard", "split_a", "split_b")
      .orderBy("id_a", "id_b")
  }

  /** Length-bucket padding-waste audit (q238): the batch-assembly
    * economics question — pad-to-power-of-2 length bucketing (the
    * standard kernel-friendly batching scheme) costs `bucket_len −
    * n_tok` padding tokens per document; this reports, per bucket,
    * document count, real tokens, padding tokens, and the padding
    * share of bucket capacity in integer basis points. The bucket
    * boundary is an exact-integer `array_min(filter(...))` over the
    * 9 power-of-2 literals (no cross-engine float log2), documents
    * beyond the 4096 cap truncate to it. One scan-local projection,
    * one ≤ 9-group partial-agg rollup — map-only at 100 TB.
    */
  private[graft] def qLengthBuckets(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(expr(
        "cast(size(filter(split(text, ' '), t -> t <> '')) as long)")
        .as("__ntok"))
      .withColumn("__eff", expr("least(__ntok, 4096L)"))
      .withColumn("bucket_len", expr(
        """array_min(filter(
          |  array(16L,32L,64L,128L,256L,512L,1024L,2048L,4096L),
          |  p -> p >= __eff))""".stripMargin))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__eff")).as("n_tokens"),
        sum(expr("bucket_len - __eff")).as("n_padding"))
      .withColumn("waste_bp",
        expr("n_padding * 10000 div (bucket_len * n_docs)"))
      .orderBy("bucket_len")

  /** Data-constrained epoch schedule (q239): the repeat-factor
    * arithmetic a token-budgeted pretraining run does when sources
    * are finite — target budget 2× the corpus, uniform per-source
    * target shares, repeats capped at 4 epochs (the published
    * diminishing-returns knee for repeated data). Per source: the
    * available tokens, the ideal allocation, the granted repeat
    * factor in exact ppm (`least(ideal·10⁶ div avail, 4·10⁶)`), the
    * achieved tokens under it, and the deficit a re-mixing pass
    * would have to cover from elsewhere. Truncating-integer ppm
    * throughout (deficit ≥ 0 by construction). One token-count
    * rollup + one broadcast scalar pair — the schedule itself is
    * ≤ sources rows of arithmetic.
    */
  private[graft] def qEpochSchedule(s: SparkSession, dir: String): DataFrame = {
    val perSrc = t(s, dir, "documents")
      .select(col("source"),
        expr("cast(size(filter(split(text, ' '), t -> t <> '')) as long)")
          .as("__ntok"))
      .groupBy("source")
      .agg(sum(col("__ntok")).as("avail_tokens"))
    perSrc
      .crossJoin(broadcast(perSrc.agg(
        sum(col("avail_tokens")).as("__tot"),
        count(lit(1)).as("__nsrc"))))
      .withColumn("ideal_tokens", expr("__tot * 2 div __nsrc"))
      // the ×10⁶ ppm scaling runs in decimal(38,0): bigint wraps
      // silently past ~9.2e12 tokens (non-ANSI Spark) — real 100 TB
      // corpora are ~10¹³ tokens, inside the wrap zone. IntegralDivide
      // still returns bigint, so the output schema is unchanged.
      .withColumn("repeats_ppm", expr(
        "least(cast(ideal_tokens as decimal(38,0)) * 1000000" +
          " div avail_tokens, 4000000L)"))
      .withColumn("achieved_tokens",
        expr("avail_tokens * repeats_ppm div 1000000"))
      .withColumn("deficit_tokens",
        expr("ideal_tokens - achieved_tokens"))
      .select(col("source"), col("avail_tokens"), col("ideal_tokens"),
        col("repeats_ppm"), col("achieved_tokens"), col("deficit_tokens"))
      .orderBy("source")
  }

  /** l-diversity audit (q240): the release-governance check k-anonymity
    * (q227) cannot make — a quasi-identifier group can be large (k-safe)
    * yet carry ONE sensitive value, so membership alone discloses it
    * (the homogeneity attack l-diversity exists to name). Per
    * (nation, segment) QI group: row count, the number of DISTINCT
    * sensitive account-band values present, and whether the group
    * meets l = 3. The sensitive banding is exact-integer decimal-cents
    * comparison (no float thresholds). One broadcast nation-dim join +
    * one partial-agg rollup; only (QI, count, distinct-count) rows
    * shuffle — the audit is group-bounded at any corpus size.
    */
  private[graft] def qLDiversity(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        col("c_mktsegment").as("segment"),
        expr("""case
          | when cast(c_acctbal as decimal(18,2)) < 0 then 'debt'
          | when cast(c_acctbal as decimal(18,2)) < 5000 then 'mid'
          | else 'high' end""".stripMargin).as("__sens"))
      .groupBy("nation", "segment")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("__sens")).as("l_distinct"))
      .withColumn("l_ok", col("l_distinct") >= 3)
      .orderBy("nation", "segment")

  /** Session-path assembly (q241): the SFT-example primitive — each
    * behavioral session becomes one ordered event-type sequence (the
    * 30-minute-gap sessionization of q32), truncated to its first 8
    * turns, and the corpus's dominant interaction paths are reported
    * with session/user/event counts. Assembly is a deterministic
    * in-group sort (`sort_array(collect_list(struct(ts, id, type)))`
    * — per-session bounded, never a global sort); the path rollup is
    * a partial agg over path strings and the result is the top-20
    * under a total order. At 100 TB: one sessionize shuffle by user,
    * one path-key shuffle of (path, counts) rows, TakeOrdered for
    * the report — no window over the corpus, no driver loop.
    */
  private[graft] def qSessionPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    val sess = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("__prev", lag("ts_ms", 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("ts_ms") - col("__prev") > 30L * 60 * 1000, 1L).otherwise(0L))
      .withColumn("__sess", sum("__new").over(w))
    sess.groupBy("user_id", "__sess")
      .agg(sort_array(collect_list(struct(
        col("ts_ms"), col("event_id"), col("event_type")))).as("__evs"))
      .select(col("user_id"),
        expr("array_join(transform(slice(__evs, 1, 8)," +
          " e -> e.event_type), '>')").as("path"),
        expr("cast(size(__evs) as long)").as("__ne"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("__ne")).as("n_events"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** Normalization-aware decontamination (q242): real benchmark text
    * never arrives formatted like the training corpus — casing,
    * punctuation, and spacing differ — so a RAW n-gram screen (q53)
    * silently misses contaminated pairs. Here the eval set is the
    * q53 holdout re-formatted adversarially IN-QUERY (uppercased,
    * comma-joined, period-terminated: zero raw 4-gram overlap with
    * the corpus — spec-asserted), and both sides pass through the
    * normalizer (lowercase → non-alphanumerics to spaces → collapse →
    * trim) before the [[Contamination.sharedGramCounts]] screen. The
    * normalized screen recovers exactly the q53 pair set — the
    * measured value of normalizing before matching. Normalization is
    * scan-local string work; the join ships only md5 gram hashes.
    */
  private[graft] def qNormDecontam(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val evalRaw = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"),
        expr("concat(upper(array_join(split(text, ' '), ', ')), '.')")
          .as("text"))
    def normalize(df: DataFrame): DataFrame = df
      .withColumn("text", expr(
        """trim(regexp_replace(regexp_replace(lower(text),
          | '[^a-z0-9 ]', ' '), ' +', ' '))""".stripMargin))
    Contamination.sharedGramCounts(
        normalize(docs.filter(col("doc_id") % 50 =!= 0)),
        normalize(evalRaw), "doc_id", "text", 4)
      .orderBy("corpus_id", "eval_id")
  }

  /** Dedup-weighted sampling (q243): sample uniformly over CONTENT,
    * not over copies — a document in a near-dup cluster of size k
    * keeps with probability r/k (exact-integer hash rule:
    * md5 % (10⁴·k) < 2·10³), so every content cluster's total
    * inclusion mass equals a singleton's and duplicated content stops
    * being over-represented in the sample (the soft-dedup discipline
    * of published corpus pipelines, where hard dedup is too blunt).
    * Cluster sizes come from the stored [[fullClusterLabels]] (the
    * q71/q216 component machinery over the exact-Jaccard pair class);
    * unclustered docs are size-1. The report groups by component
    * size: clusters, docs, kept docs, and clusters with ≥ 1 survivor
    * — the flat-across-sizes column that PROVES the content-uniform
    * property as data. Labels/sizes are pair-bounded small join
    * sides (broadcast under AQE); the keep rule is one scan-local
    * md5 per doc.
    */
  private[graft] def qDedupWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val labels = fullClusterLabels(s, dir)
    val sizes = labels.groupBy("cluster_rep").agg(count(lit(1)).as("__sz"))
    t(s, dir, "documents").select(col("doc_id"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"),
        "left")
      .join(sizes, Seq("cluster_rep"), "left")
      .withColumn("__csz", coalesce(col("__sz"), lit(1L)))
      .withColumn("__rep", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("__kept", expr(
        """cast(conv(substring(md5(concat('dws|',
          |  cast(doc_id as string))), 1, 12), 16, 10) as bigint)
          |  % (10000L * __csz) < 2000L""".stripMargin))
      .groupBy(col("__csz"), col("__rep"))
      .agg(count(lit(1)).as("__nd"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("__nk"))
      .groupBy(col("__csz").as("component_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("__nd")).as("n_docs"),
        sum(col("__nk")).as("n_kept"),
        sum(when(col("__nk") > 0, 1L).otherwise(0L))
          .as("n_clusters_hit"))
      .orderBy("component_size")
  }

  /** Tokenizer fertility audit (q244): the tokenizer-economics
    * question a multilingual corpus forces — how many characters one
    * BPE token buys per language (fertility), and how much the
    * trained merges compress over whitespace tokens. Composition of
    * the stored q206 merge chain applied scan-locally (q207's
    * [[graft.ops.Bpe.applyMerges]]) with a per-language rollup:
    * docs, word chars, whitespace tokens, BPE symbols, then
    * chars-per-BPE-token and BPE-per-whitespace-token in exact
    * truncating bp. A language whose fertility is half the others'
    * pays double the sequence length for the same text — this table
    * is the evidence a tokenizer retrain starts from. One scan
    * (merges broadcast as literals), one ≤ langs-group rollup.
    */
  private[graft] def qTokenizerFertility(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("__toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("__seq", Bpe.docSeq("__toks"))
      .withColumn("__seq2", Bpe.applyMerges("__seq", bpeMerges(s, dir)))
      .select(col("lang"),
        expr("aggregate(__toks, 0L, (a, x) -> a + length(x))")
          .as("__chars"),
        size(col("__toks")).cast("long").as("__nws"),
        Bpe.symbolCount("__seq2").as("__nbpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__chars")).as("n_chars"),
        sum(col("__nws")).as("n_ws_tokens"),
        sum(col("__nbpe")).as("n_bpe_tokens"))
      .withColumn("chars_per_bpe_bp",
        expr("n_chars * 10000 div n_bpe_tokens"))
      .withColumn("bpe_per_ws_bp",
        expr("n_bpe_tokens * 10000 div n_ws_tokens"))
      .orderBy("lang")

  /** Checksum-validated identifier screen (q245): the verification
    * layer behind E38's PII detection — a 16-digit run is only a
    * card-number FINDING if it passes the Luhn mod-10 check
    * ([[TextFns.luhnValid]]); random digit runs pass at 1/10, so the
    * checksum cuts false escalations 10× before anything is redacted
    * or reported. The corpus carries no real identifiers (the q52
    * discipline), so each document's candidate is a deterministic
    * 16-digit stand-in derived from its id — the per-source rates
    * then measure exactly the 1/10 background a screen must expect
    * from random digits. Scan-local integer fold per candidate, one
    * ≤ sources-group rollup; real Luhn vectors are spec-pinned.
    */
  private[graft] def qLuhnScreen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("__cand", expr(
        """lpad(cast((doc_id % 1000000007L) * 76695841L
          |  % 10000000000000000L as string), 16, '0')""".stripMargin))
      .withColumn("__ok", TextFns.luhnValid("__cand"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("__ok"), 1L).otherwise(0L)).as("n_luhn_valid"))
      .withColumn("valid_bp",
        expr("n_luhn_valid * 10000 div n_candidates"))
      .orderBy("source")

  /** Blocklist phrase excision (q246, [[graft.ops.PhraseExcise]]):
    * policy scrubbing at span granularity — every occurrence of a
    * blocked multi-word phrase is cut out of the text, surrounding
    * tokens kept, overlapping matches merged into one island (the
    * q229 island discipline driven by a PATTERN list instead of
    * corpus repeats). The phrase list folds into the plan as
    * literals, so the whole operator is a map-only pass: no corpus
    * statistics, no joins, no shuffle of text — the excision costs
    * the scan the corpus already pays at 100 TB.
    */
  private[graft] def qPhraseExcise(s: SparkSession, dir: String): DataFrame =
    PhraseExcise.excise(t(s, dir, "documents"), "doc_id", "text",
        Seq("table scan", "fast sort key", "sort key agg"))
      .orderBy("doc_id")

  /** Mixed-language document audit (q247): monolingual training slices
    * rot when documents code-switch internally — a doc whose PARTS
    * identify as different languages pollutes whichever slice its
    * doc-level tag routes it to. Each document splits into 20-token
    * parts, every part runs the E2 stopword-profile language-ID
    * ([[TextFns.withLanguageId]] — scores materialized once per part),
    * and the per-source rollup reports how many documents are
    * part-consistent vs mixed (any disagreement, 'und' included: an
    * unidentifiable part is exactly the signal an audit must not
    * average away). Chunking and scoring are scan-local; one (doc)
    * partial agg + one (source) rollup shuffle counter rows only.
    */
  private[graft] def qMixedLangAudit(s: SparkSession, dir: String): DataFrame = {
    val parts = t(s, dir, "documents")
      .withColumn("__toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .select(col("doc_id"), col("source"),
        // empty/whitespace-only text yields zero tokens; sequence(1,0)
        // throws in Spark while the oracle's range(1,1,20) is empty, so
        // the chunker guards explicitly (the doc then has no parts and,
        // matching the oracle, no row at all)
        explode(expr(
          "if(size(__toks) > 0," +
            " transform(sequence(1, size(__toks), 20)," +
            " i -> slice(__toks, i, 20))," +
            " cast(array() as array<array<string>>))")).as("__part"))
    TextFns.withLanguageId(parts, "__part", "__plang")
      .groupBy("doc_id", "source")
      .agg(countDistinct(col("__plang")).as("__nl"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__nl") === 1, 1L).otherwise(0L)).as("n_consistent"),
        sum(when(col("__nl") > 1, 1L).otherwise(0L)).as("n_mixed"))
      .withColumn("mixed_bp", expr("n_mixed * 10000 div n_docs"))
      .orderBy("source")
  }

  /** Deletion-compliance re-ingestion screen (q248): honoring a
    * deletion request means more than dropping the row — re-crawls
    * and mirrors re-ingest the SAME CONTENT under new ids, so the
    * compliance screen must match tombstones by content, not by key.
    * The corpus carries no exact duplicates (q24: all fingerprints
    * unique), so the screen is the q25 banded MinHash pipeline with
    * the tombstone set (doc_id % 10 = 0 — the "deleted" docs) on one
    * side: every SURVIVING document that is a verified near-dup
    * (J ≥ 0.5) of a deleted one, with the tombstone named. Cost is
    * the near-dup screen the pipeline already runs; the tombstone
    * predicate is two scan-local mod tests per verified pair.
    */
  private[graft] def qTombstoneScreen(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .repartition(col("doc_id"))
      .withColumn("shingles", TextFns.shingles("text", 5))
      .select("doc_id", "shingles")
      .transform(snap)
    val sigs = NearDup.minHashSigs(docs, "doc_id", "shingles", 32, "sig")
    val cand = NearDup.candidatePairs(
      NearDup.bandRows(sigs, "doc_id", "sig", 4, 8, 32), "doc_id")
    NearDup.jaccard(cand, docs, "doc_id", "shingles")
      .filter(col("jaccard") >= 0.5)
      .filter((col("id_a") % 10 === 0) =!= (col("id_b") % 10 === 0))
      .select(
        when(col("id_a") % 10 === 0, col("id_b")).otherwise(col("id_a"))
          .as("surviving_doc"),
        when(col("id_a") % 10 === 0, col("id_a")).otherwise(col("id_b"))
          .as("tombstone_doc"),
        col("jaccard"))
      .orderBy("surviving_doc", "tombstone_doc")
  }

  /** Deficit-redistributing budget remix (q249): the water-filling
    * round q239's deficit column invites — after the uniform-share
    * pass caps scarce sources at 4 epochs, the UNMET budget
    * redistributes to sources with repeat headroom, proportional to
    * that headroom in exact truncating integers (extra =
    * min(headroom, total_deficit · headroom div total_headroom)).
    * Per source: the round-1 grant, the headroom, the redistributed
    * extra, the final tokens, and the final repeat factor in ppm —
    * one more broadcast scalar pair over q239's rollup; the remix is
    * still ≤ sources rows of arithmetic at any corpus size.
    */
  private[graft] def qBudgetRemix(s: SparkSession, dir: String): DataFrame = {
    val perSrc = t(s, dir, "documents")
      .select(col("source"),
        expr("cast(size(filter(split(text, ' '), t -> t <> '')) as long)")
          .as("__ntok"))
      .groupBy("source")
      .agg(sum(col("__ntok")).as("avail_tokens"))
    val r1 = perSrc
      .crossJoin(broadcast(perSrc.agg(
        sum(col("avail_tokens")).as("__tot"),
        count(lit(1)).as("__nsrc"))))
      .withColumn("ideal_tokens", expr("__tot * 2 div __nsrc"))
      // every ×ppm / cross-scalar product runs in decimal(38,0): at
      // 100 TB token counts (~10¹³) the bigint forms wrap silently in
      // non-ANSI Spark (the q239 fix, applied to all four sites here);
      // IntegralDivide returns bigint, so output schemas are unchanged
      .withColumn("__rp1", expr(
        "least(cast(ideal_tokens as decimal(38,0)) * 1000000" +
          " div avail_tokens, 4000000L)"))
      .withColumn("r1_tokens", expr(
        "cast(avail_tokens as decimal(38,0)) * __rp1 div 1000000"))
      .withColumn("__deficit", expr("ideal_tokens - r1_tokens"))
      .withColumn("headroom_tokens",
        expr("avail_tokens * 4 - r1_tokens"))
    r1.crossJoin(broadcast(r1.agg(
        sum(col("__deficit")).as("__td"),
        sum(col("headroom_tokens")).as("__th"))))
      .withColumn("extra_tokens", expr(
        """least(headroom_tokens,
          |  if(__th > 0,
          |    cast(__td as decimal(38,0)) * headroom_tokens div __th,
          |    0L))"""
          .stripMargin))
      .withColumn("final_tokens", expr("r1_tokens + extra_tokens"))
      .withColumn("final_repeats_ppm",
        expr("cast(final_tokens as decimal(38,0)) * 1000000" +
          " div avail_tokens"))
      .select(col("source"), col("avail_tokens"), col("r1_tokens"),
        col("headroom_tokens"), col("extra_tokens"), col("final_tokens"),
        col("final_repeats_ppm"))
      .orderBy("source")
  }

  /** Corpus-driven stopword discovery (q250): hardcoded stopword
    * lists (E2's profiles) age badly — the corpus's OWN high-df
    * tokens are the boilerplate/function-word vocabulary its filters
    * should use. Per language: every token appearing in ≥ 30% of the
    * language's documents, with document frequency and share in
    * exact bp. The df rollup shuffles (lang, token, count) rows
    * after a scan-local per-doc distinct; the ≥ 30% screen keeps the
    * report vocabulary-bounded (high-df tokens are few by Zipf — at
    * 100 TB the output is still a stopword list, not a corpus).
    */
  private[graft] def qStopwordDiscovery(s: SparkSession, dir: String): DataFrame = {
    val docTokens = t(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        explode(expr(
          "array_distinct(filter(split(text, ' '), t -> t <> ''))"))
          .as("token"))
    val perLang = t(s, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("__nd"))
    docTokens.groupBy("lang", "token")
      .agg(count(lit(1)).as("df"))
      .join(broadcast(perLang), "lang")
      .withColumn("share_bp", expr("df * 10000 div __nd"))
      .filter(col("share_bp") >= 3000)
      .select("lang", "token", "df", "share_bp")
      .orderBy(col("lang"), col("share_bp").desc, col("token"))
  }

  /** Real PNG decode (q251, [[Multimodal.decodePng]]): every document
    * becomes a genuine PNG — encoded through `javax.imageio`
    * (JDK-bundled, zero new dependencies), deterministic dims
    * 4+id%5 × 3+id%4, pixel rule (id·31 + 3·(y·w+x) + c) mod 256, the
    * SAME raster arithmetic as q208's PPM — and decoded back through
    * the real ImageIO PNG reader for dims and per-channel sums. The
    * bytes on the wire are DEFLATE-compressed and encoder-private, so
    * unlike q208 there is no whole-file checksum: the DECODED raster
    * is the cross-engine contract (PNG is lossless), and the oracle
    * recomputes every decoded number in closed form from the
    * generation rule — green means a real inflate + unfilter + pixel
    * walk produced exactly the committed pixels. Same mapPartitions
    * codec seam as q208; payloads never shuffle.
    */
  private[graft] def qPngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sp: SparkSession = s
    val media = t(s, dir, "documents")
      .select(col("doc_id").cast("long"))
      .repartition(col("doc_id"))
      .as[Long]
      .map { id =>
        Multimodal.MediaRecord(id,
          Multimodal.encodePng(id, (4 + id % 5).toInt, (3 + id % 4).toInt),
          "png")
      }
    Multimodal.decodePngFeatures(media).toDF().orderBy("doc_id")
  }

  /** Perceptual fingerprint on REAL pixel rasters (q252,
    * [[Multimodal.toRaster]] + [[Multimodal.blockHash]]): the E187
    * claim — "a real image pHash swaps in, only the codec changes" —
    * made runnable: PNGs decode through `javax.imageio`, the payload
    * swaps for the w·h·3 row-major RGB raster, and the SAME 60-bit
    * blockhash that fingerprints q193's stub bytes fingerprints the
    * decoded pixels. Fingerprinting the raster (never the container)
    * is the load-bearing property: two encoders of one image differ
    * in every container byte and zero raster bytes, so only the
    * raster-side fingerprint deduplicates re-encoded media. The
    * oracle replays chunk sums and threshold bits closed-form from
    * the pixel rule. Scan-local end to end; only (id, fp, n) rows
    * leave the scan.
    */
  private[graft] def qPngBlockhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sp: SparkSession = s
    val media = t(s, dir, "documents")
      .select(col("doc_id").cast("long"))
      .repartition(col("doc_id"))
      .as[Long]
      .map { id =>
        Multimodal.MediaRecord(id,
          Multimodal.encodePng(id, (4 + id % 5).toInt, (3 + id % 4).toInt),
          "png")
      }
    Multimodal.blockHash(Multimodal.toRaster(media))
      .toDF().orderBy("doc_id")
  }

  /** Shard-stitch audit (q253): chunked crawls and sharded exports cut
    * documents at arbitrary boundaries with a safety overlap; before
    * training, the pipeline must REJOIN them (or at minimum know the
    * overlap volume, which double-counts tokens and leaks duplicated
    * spans). Detection is exact and join-shaped: every shard keys its
    * first-20-token window and last-20-token window (md5 of the joined
    * window — 32 bytes, the fingerprint discipline), and a stitch is
    * suffix-key(a) = prefix-key(b) — one hash equi-join, no pairwise
    * text comparison, scan-local key extraction. The shard fixture is
    * derived deterministically in-query (docs %7 with ≥ 50 tokens split
    * into two shards sharing EXACTLY 20 tokens), so the oracle replays
    * generation + detection end to end. At 100 TB: keys are 2×32 bytes
    * per shard, the join is hash-partitioned on the key — map-only
    * until a tiny equi-join.
    */
  private[graft] def qShardStitch(s: SparkSession, dir: String): DataFrame = {
    val sp = t(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> t <> '')").as("__t"))
      .filter(col("doc_id") % 7 === 0 && size(col("__t")) >= 50)
      .withColumn("__m", expr("cast(ceil(size(__t) / 2.0d) as int)"))
    val shards = sp
      .select((col("doc_id") * 2).as("shard_id"), col("doc_id"),
        expr("slice(__t, 1, __m + 10)").as("__st"))
      .unionByName(sp
        .select((col("doc_id") * 2 + 1).as("shard_id"), col("doc_id"),
          expr("slice(__t, __m - 9, size(__t) - __m + 10)").as("__st")))
    val keyed = shards.select(col("shard_id"), col("doc_id"),
      md5(expr("array_join(slice(__st, 1, 20), ' ')")).as("__pk"),
      md5(expr("array_join(slice(__st, -20, 20), ' ')")).as("__sk"))
    keyed
      .select(col("shard_id").as("shard_a"), col("doc_id").as("doc_a"),
        col("__sk").as("__k"))
      .join(keyed.select(col("shard_id").as("shard_b"),
        col("doc_id").as("doc_b"), col("__pk").as("__k")), "__k")
      .filter(col("shard_a") =!= col("shard_b"))
      .select("shard_a", "shard_b", "doc_a", "doc_b")
      .orderBy("shard_a", "shard_b")
  }

  /** Embedding-store hygiene audit (q254): before any ANN index builds
    * (E10–E21), the feature store itself needs screening — zero
    * vectors (failed encoder calls) poison every cosine (0/0), exact
    * duplicate vectors waste index space and bias k-NN votes, and a
    * collapsed norm distribution signals an encoder regression. Per
    * label: vector count, zero-vector count, duplicate-vector count
    * (identical at the engine's own 10⁴ quantization — the E10
    * convention, so "duplicate" here means "indistinguishable to every
    * downstream similarity op"), quantized-norm min/max, and exact
    * LOWER-RANK p10/p50/p90 ([[Percentiles.exactFewGroupsLowerRank]] —
    * two passes, no per-group collect, and interpolation-free: the
    * statistic is an element of the data, so it stays an exact bigint
    * and no type-7 blend arithmetic crosses the oracle boundary).
    * Norms via the codegen'd [[LongDot]]; only (label, hash, norm)
    * rows shuffle — payload vectors never do.
    */
  private[graft] def qEmbeddingHygiene(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        Similarity.quantized("embedding").as("__qv"))
      .withColumn("__qn", Similarity.dot(col("__qv"), col("__qv")))
      .withColumn("__h",
        md5(expr("array_join(transform(__qv, x -> cast(x as string)), ',')")))
    val dups = q.groupBy("label", "__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .groupBy("label").agg(sum("__c").as("n_dup_vecs"))
    val stats = q.groupBy("label").agg(
      count(lit(1)).as("n_vecs"),
      sum(when(expr("forall(__qv, x -> x = 0L)"), 1L).otherwise(0L))
        .as("n_zero_vecs"),
      min("__qn").as("min_qnorm"), max("__qn").as("max_qnorm"))
    val pct = Percentiles.exactFewGroupsLowerRank(q, Seq("label"), "__qn",
        Seq(("p10_qnorm", 0.1), ("p50_qnorm", 0.5), ("p90_qnorm", 0.9)))
      .select(col("label"), col("p10_qnorm").cast("long").as("p10_qnorm"),
        col("p50_qnorm").cast("long").as("p50_qnorm"),
        col("p90_qnorm").cast("long").as("p90_qnorm"))
    stats
      .join(dups, Seq("label"), "left")
      .withColumn("n_dup_vecs", coalesce(col("n_dup_vecs"), lit(0L)))
      .join(pct, "label")
      .select("label", "n_vecs", "n_zero_vecs", "n_dup_vecs",
        "min_qnorm", "max_qnorm", "p10_qnorm", "p50_qnorm", "p90_qnorm")
      .orderBy("label")
  }

  /** Streaming tombstone enforcement (q255,
    * [[graft.streaming.TombstoneScreen]]): q248's deletion-compliance
    * screen moved from audit to GATE — deletion requests (the %97
    * fixture convention) hold canonical-form fingerprints
    * ([[TextFns.fingerprint]]), and every arriving micro-batch is
    * probed at ingestion, so deleted content re-entering via re-crawl
    * is counted (and in production dropped) the moment it lands, not
    * at the next audit. The tombstone store is deletion-request-sized
    * — KB, not corpus — so the probe legitimately BROADCASTS (the
    * ContaminationScreen shape; contrast q223, whose corpus-sized
    * history had to be bucketed instead). The oracle replays batch
    * membership via the staging NTILE and the identical
    * fingerprint join.
    */
  private[graft] def qStreamTombstone(s: SparkSession, dir: String): DataFrame = {
    val tombstones = t(s, dir, "documents")
      .filter(col("doc_id") % 97 === 0)
      .select(TextFns.fingerprint("text").as("fp"))
    graft.streaming.TombstoneScreen.run(s, s"$dir/documents.parquet",
      tombstones)
  }

}
