package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, DenseId, TimeOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry is deterministic (no `monotonically_increasing_id`, no
  * arbitrary-row dedup; ordered `row_number`/`min`-per-key forms instead —
  * SURVEY §5.1) and type-stable across engines:
  *  - derived ints cast to long (DuckDB year()/count() are BIGINT);
  *  - money sums go through DECIMAL so they are exact and
  *    summation-order-independent, then cast back to double;
  *  - timestamps compared as epoch millis (parquet ns vs Spark µs);
  *  - `dayofweek` is Spark 1=Sun…7=Sat; the DuckDB oracle uses
  *    `dayofweek()+1` (0=Sun…6=Sat) to match.
  * Every result carries an ORDER BY on non-null keys in both dialects.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact money arithmetic: the corpus' price/discount/tax doubles carry
    * two decimals, so casting them to DECIMAL *before* any multiplication
    * is unambiguous (no rounding-mode ties), and every product/sum after
    * that is exact and summation-order-independent in both engines.
    */
  private[graft] def money(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")
  private def rate(c: org.apache.spark.sql.Column) = c.cast("decimal(4,2)")

  /** Flagship: multi-hop star join → revenue per nation, on sf=0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    qJoinMultihop(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Reference-parity operators (SURVEY §2) on the driver corpus
  // ---------------------------------------------------------------------

  /** F1 + P1: equality filter then projection (reference `etl.py:109,65`). */
  private def qFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "value")
      .orderBy("event_id")

  /** P3: projection with renaming via selectExpr (reference `etl.py:112–116`). */
  private def qProjectRename(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .selectExpr("c_custkey as id", "c_name as name",
        "c_nationkey as nation_id", "c_acctbal as balance",
        "c_mktsegment as segment")
      .orderBy("id")

  /** A3 intended semantics: latest row per key (reference `etl.py:116`). */
  private def qDedupLatest(s: SparkSession, dir: String): DataFrame =
    Dedup.latestBy(t(s, dir, "events"), Seq("user_id"), "ts", "event_id")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("value").as("last_value"))
      .orderBy("user_id")

  /** A1/A2/A4 deterministic form: first row per key under an explicit order. */
  private def qDedupFirst(s: SparkSession, dir: String): DataFrame =
    Dedup.firstBy(t(s, dir, "lineitem"), Seq("l_orderkey"),
        Seq(col("l_linenumber").asc, col("l_partkey").asc,
          col("l_quantity").asc, col("l_extendedprice").asc))
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey")

  /** U1 + X2–X7: epoch-ms ↔ timestamp + calendar derivations
    * (reference `etl.py:124–133`), via built-ins — no UDF.
    */
  private def qTimeDerive(s: SparkSession, dir: String): DataFrame = {
    val withMs = t(s, dir, "events")
      .withColumn("epoch_ms", TimeOps.toEpochMillis(col("ts")))
      .withColumn("start_time", TimeOps.fromEpochMillis(col("epoch_ms")))
    TimeOps.withCalendarFields(withMs, "start_time")
      .select("event_id", "epoch_ms", "hour", "day", "week", "month",
        "year", "weekday")
      .orderBy("event_id")
  }

  /** X1 intended semantics: surrogate key, deterministic form
    * (`row_number` over an explicit order instead of
    * `monotonically_increasing_id` — reference `etl.py:70,153`).
    * Note: a global row_number is inherently serial; at scale prefer
    * `monotonically_increasing_id` (parallel, but not dense) — this form
    * exists for oracle-checkable parity.
    */
  private def qSurrogateKey(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("surrogate_id",
        row_number().over(Window.orderBy("o_orderkey")).cast("long"))
      .select("o_orderkey", "surrogate_id")
      .orderBy("o_orderkey")

  /** X1 at scale: the same dense deterministic surrogate key as q06,
    * via partition-offset arithmetic ([[DenseId.withDenseId]]) instead
    * of a single-task global window — every partition numbers its own
    * rows after one range exchange. Same oracle as q06.
    */
  private def qSurrogateScalable(s: SparkSession, dir: String): DataFrame =
    DenseId.withDenseId(
        t(s, dir, "orders").select("o_orderkey"),
        "surrogate_id", col("o_orderkey").asc)
      .select("o_orderkey", "surrogate_id")
      .orderBy("o_orderkey")

  /** J1: composite-key inner equi-join with one leg on exact double
    * equality (reference `etl.py:164–168`): dedup'd catalog joined back
    * on (partkey, suppkey, quantity) — quantity is a double, matched
    * bit-for-bit, never tolerance-matched.
    */
  private def qJoinComposite(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val catalog = li.select("l_partkey", "l_suppkey", "l_quantity").distinct()
    li.join(catalog, Seq("l_partkey", "l_suppkey", "l_quantity"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_matches"),
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"))
      .orderBy("l_partkey")
  }

  /** Multi-hop equi-join chain (TPC-H Q5 shape): revenue per nation.
    * Small dims are broadcast (no shuffle); the lineitem⋈orders shuffle
    * is the only exchange on the fact side.
    */
  private def qJoinMultihop(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("revenue"))
      .select("region", "nation", "n_items", "revenue")
      .orderBy("region", "nation")
  }

  /** Broadcast-hint join: customer count per region — both dims shipped
    * to every task, zero shuffle on the build sides.
    */
  private def qJoinBroadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("total_balance"))
      .orderBy("region")

  /** V1/V2/Q1: the SQL surface — temp views + spark.sql join-aggregate
    * (reference `etl.py:149–169`).
    */
  private def qSqlViews(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("v_orders")
    t(s, dir, "customer").createOrReplaceTempView("v_customer")
    s.sql("""
      SELECT c.c_mktsegment AS segment,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM v_orders o
      JOIN v_customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
      ORDER BY segment""")
  }

  /** A5/M2-class global aggregates in one pass (count, distinct count,
    * min/max over timestamps-as-millis and doubles).
    */
  private def qAggGlobal(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      unix_millis(min(col("l_shipdate"))).as("min_ship_ms"),
      unix_millis(max(col("l_shipdate"))).as("max_ship_ms"),
      sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))

  /** TPC-H Q1 shape: grouped aggregation with exact decimal money sums.
    * Partial (map-side) aggregation makes the shuffle carry only
    * #groups × #partitions rows.
    */
  private def qAggGroupBy(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double")
          .as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          * (lit(1) + rate(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(money(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Window top-N: top-3 orders per customer by total price. */
  private def qWindowTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rank")
  }

  /** Window running aggregate: cumulative spend per customer over time.
    * DECIMAL inside the window sum → independent of the engine's
    * accumulation order.
    */
  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_orderkey", "o_custkey", "running_spend")
      .orderBy("o_orderkey")
  }

  /** Set operations: INTERSECT and EXCEPT of two customer key sets,
    * tagged and unioned.
    */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = c.filter(col("c_acctbal") > 5000.0).select("c_custkey")
    a.intersect(b).withColumn("op", lit("intersect"))
      .union(a.except(b).withColumn("op", lit("except")))
      .orderBy("op", "c_custkey")
  }

  /** Global sort + limit: top-100 orders (deterministic tiebreak). */
  private def qSortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Semi/anti joins: customers with vs without orders, tagged. */
  private def qJoinSemiAnti(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey").withColumn("op", lit("has_orders"))
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey").withColumn("op", lit("no_orders"))
    semi.union(anti).orderBy("op", "c_custkey")
  }

  /** JSON extraction from a string column (events.props, e.g. {"k": 87}). */
  private def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .select("event_id", "k")
      .orderBy("event_id")

  /** K4/K5 + S4: dynamic-partitioned parquet sink and scan-back.
    * Writes events bucketed by (year, month) — the reference's layout
    * (`etl.py:139,173`) — reads it back (partition pruning applies to any
    * downstream year=/month= predicate), and aggregates per partition.
    */
  private def qParquetRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = Scratch.register(
      s"${System.getProperty("java.io.tmpdir")}/graft_roundtrip_" +
        s.sparkContext.applicationId)
    val ev = TimeOps.withCalendarFields(t(s, dir, "events"), "ts")
    ev.select("event_id", "value", "year", "month")
      .write.mode("overwrite").partitionBy("year", "month").parquet(out)
    s.read.parquet(out)
      .groupBy(col("year").cast("long").as("year"),
        col("month").cast("long").as("month"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy("year", "month")
  }

  /** The reference's time-dimension (`etl.py:124–140`) on the corpus:
    * dedup per timestamp + calendar fields, keyed by epoch millis.
    */
  private def qTimeDim(s: SparkSession, dir: String): DataFrame = {
    val withTs = t(s, dir, "events")
      .withColumn("epoch_ms", TimeOps.toEpochMillis(col("ts")))
      .withColumn("start_time", TimeOps.fromEpochMillis(col("epoch_ms")))
    TimeOps.withCalendarFields(withTs, "start_time")
      .select("epoch_ms", "hour", "day", "week", "month", "year", "weekday")
      .distinct()
      .orderBy("epoch_ms")
  }

  // ---------------------------------------------------------------------
  // Contract maps
  // ---------------------------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline surface (SURVEY §7.2.8) from [[TrainQueries]].
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = TrainQueries.queries ++ Map(
    "q01_filter_project" -> (qFilterProject _),
    "q02_project_rename" -> (qProjectRename _),
    "q03_dedup_latest" -> (qDedupLatest _),
    "q04_dedup_first" -> (qDedupFirst _),
    "q05_time_derive" -> (qTimeDerive _),
    "q06_surrogate_key" -> (qSurrogateKey _),
    "q06b_surrogate_scalable" -> (qSurrogateScalable _),
    "q07_join_composite" -> (qJoinComposite _),
    "q08_join_multihop" -> (qJoinMultihop _),
    "q09_join_broadcast" -> (qJoinBroadcast _),
    "q10_sql_views" -> (qSqlViews _),
    "q11_agg_global" -> (qAggGlobal _),
    "q12_agg_groupby" -> (qAggGroupBy _),
    "q13_window_topn" -> (qWindowTopN _),
    "q14_window_running" -> (qWindowRunning _),
    "q15_setops" -> (qSetOps _),
    "q16_sort_limit" -> (qSortLimit _),
    "q17_join_semi_anti" -> (qJoinSemiAnti _),
    "q18_json_extract" -> (qJsonExtract _),
    "q19_parquet_roundtrip" -> (qParquetRoundtrip _),
    "q20_time_dim" -> (qTimeDim _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = TrainQueries.oracleSql ++ Map(
    "q01_filter_project" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_type = 'click' ORDER BY event_id""",
    "q02_project_rename" ->
      """SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation_id,
                c_acctbal AS balance, c_mktsegment AS segment
         FROM customer ORDER BY id""",
    "q03_dedup_latest" ->
      """SELECT user_id, event_id AS last_event_id,
                event_type AS last_event_type, value AS last_value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1 ORDER BY user_id""",
    "q04_dedup_first" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY l_orderkey ORDER BY l_linenumber ASC,
                  l_partkey ASC, l_quantity ASC, l_extendedprice ASC) AS rn
               FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""",
    "q05_time_derive" ->
      """SELECT event_id, epoch_ms(ts) AS epoch_ms,
                CAST(hour(ts) AS BIGINT) AS hour,
                CAST(day(ts) AS BIGINT) AS day,
                CAST(weekofyear(ts) AS BIGINT) AS week,
                CAST(month(ts) AS BIGINT) AS month,
                CAST(year(ts) AS BIGINT) AS year,
                CAST(dayofweek(ts) + 1 AS BIGINT) AS weekday
         FROM events ORDER BY event_id""",
    "q06_surrogate_key" ->
      """SELECT o_orderkey, CAST(row_number() OVER (ORDER BY o_orderkey)
                AS BIGINT) AS surrogate_id
         FROM orders ORDER BY o_orderkey""",
    "q06b_surrogate_scalable" ->
      """SELECT o_orderkey, CAST(row_number() OVER (ORDER BY o_orderkey)
                AS BIGINT) AS surrogate_id
         FROM orders ORDER BY o_orderkey""",
    "q07_join_composite" ->
      """WITH catalog AS (SELECT DISTINCT l_partkey, l_suppkey, l_quantity
                          FROM lineitem)
         SELECT l.l_partkey, COUNT(*) AS n_matches,
                CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  AS sum_qty
         FROM lineitem l JOIN catalog c
           ON l.l_partkey = c.l_partkey AND l.l_suppkey = c.l_suppkey
          AND l.l_quantity = c.l_quantity
         GROUP BY l.l_partkey ORDER BY l.l_partkey""",
    "q08_join_multihop" ->
      """SELECT r_name AS region, n_name AS nation, COUNT(*) AS n_items,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                  AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY region, nation""",
    "q09_join_broadcast" ->
      """SELECT r_name AS region, COUNT(*) AS n_customers,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_balance
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY region""",
    "q10_sql_views" ->
      """SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY segment""",
    "q11_agg_global" ->
      """SELECT COUNT(*) AS n_rows,
                COUNT(DISTINCT l_orderkey) AS n_orders,
                epoch_ms(MIN(l_shipdate)) AS min_ship_ms,
                epoch_ms(MAX(l_shipdate)) AS max_ship_ms,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  AS sum_qty,
                MIN(l_extendedprice) AS min_price,
                MAX(l_extendedprice) AS max_price
         FROM lineitem""",
    "q12_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                  AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                  AS sum_disc_price,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))
                  * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
                  AS sum_charge,
                CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  / COUNT(*) AS avg_qty,
                COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q13_window_topn" ->
      """SELECT o_custkey, CAST(rank AS BIGINT) AS rank, o_orderkey,
                o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER
                 (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
               FROM orders)
         WHERE rank <= 3 ORDER BY o_custkey, rank""",
    "q14_window_running" ->
      """SELECT o_orderkey, o_custkey,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                  (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_spend
         FROM orders ORDER BY o_orderkey""",
    "q15_setops" ->
      """SELECT c_custkey, 'intersect' AS op FROM
           (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
         UNION ALL
         SELECT c_custkey, 'except' AS op FROM
           (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            EXCEPT
            SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
         ORDER BY op, c_custkey""",
    "q16_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q17_join_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS op FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         UNION ALL
         SELECT c_custkey, 'no_orders' AS op FROM customer c
         WHERE NOT EXISTS
           (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY op, c_custkey""",
    "q18_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT)
                AS k
         FROM events ORDER BY event_id""",
    "q19_parquet_roundtrip" ->
      """SELECT CAST(year(ts) AS BIGINT) AS year,
                CAST(month(ts) AS BIGINT) AS month,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_value
         FROM events GROUP BY 1, 2 ORDER BY year, month""",
    "q20_time_dim" ->
      """SELECT DISTINCT epoch_ms(ts) AS epoch_ms,
                CAST(hour(ts) AS BIGINT) AS hour,
                CAST(day(ts) AS BIGINT) AS day,
                CAST(weekofyear(ts) AS BIGINT) AS week,
                CAST(month(ts) AS BIGINT) AS month,
                CAST(year(ts) AS BIGINT) AS year,
                CAST(dayofweek(ts) + 1 AS BIGINT) AS weekday
         FROM events ORDER BY epoch_ms""")
}
