package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator pack — the Spark-native re-expression of the
  * reference's scan / filter / projection / aggregation / ordering
  * surface (SURVEY.md §2.1, §2.2, §2.4, §2.5), plus the join /
  * top-k / distinct / rollup operators the Spark rebuild introduces
  * (SURVEY.md §2.8). Every query here is declarative DataFrame API —
  * Catalyst gets full pushdown/pruning/partial-agg freedom — and has
  * a DuckDB oracle twin in [[oracles]].
  *
  * Determinism rules for the oracle hash compare:
  *  - every query ends in a total ORDER BY (unique key included);
  *  - every floating aggregate is rounded (2dp for money, 6dp for
  *    ratios) in BOTH dialects;
  *  - column names are aliased identically in both dialects.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** S1 + F-class: parquet scan with predicate pushdown + column
    * pruning (reference re-reads CSV with inferSchema, darima.py:127-141).
    */
  private val q01ScanFilterProject: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 30 &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** A1: groupBy-sum — Catalyst partial+final hash aggregate replacing
    * the reference's hand-rolled aggregateByKey (darima.py:233-258).
    */
  private val q02AggSum: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A2: groupBy-avg (mean combine, darima.py:260-280). The mean of
    * 2dp money sums as exact DECIMAL first — summation-order
    * independent, and the oracle mirrors Spark's string-based round
    * on the identical quotient bits (see EventsAnalytics.x13 note).
    */
  private val q03AggAvg: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double") / count(lit(1)), 2).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** F1: prefix filter (coefficient-name split, converters.py:91-96). */
  private val q04FilterPrefix: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("text").startsWith("the "))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** F2: zero-pad rename + lexicographic sort (ar7 → ar_00000007,
    * converters.py:92-93).
    */
  private val q05PadSort: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(concat(lit("ar_"),
        lpad(col("l_linenumber").cast("string"), 8, "0")).as("coef"),
        col("l_quantity"))
      .groupBy(col("coef"))
      .agg(round(sum(col("l_quantity")), 2).as("total"))
      .orderBy(col("coef"))

  /** F3: UNION ALL reassembly (converters.py:98). */
  private val q06Union: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_name").as("name"),
        round(col("c_acctbal"), 2).as("acctbal"), lit("cust").as("kind"))
    val p = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
      .select(col("s_name").as("name"),
        round(col("s_acctbal"), 2).as("acctbal"), lit("supp").as("kind"))
    c.unionByName(p).orderBy(col("kind"), col("name"))
  }

  /** F4: value-predicate row split (sigma2 vs rest, darima.py:87-89). */
  private val q07FilterSplit: Q = (s, d) =>
    Tables.events(s, d)
      .select(when(col("event_type") === "error", "err").otherwise("rest")
        .as("grp"), col("value"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("grp"))

  /** C1: timestamp cast + calendar extraction (converters.py:109). */
  private val q08CastTs: Q = (s, d) =>
    Tables.events(s, d)
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("ts").cast("date").as("day"),
        hour(col("ts")).as("hr"))
      .orderBy(col("event_id"))

  /** P1: contiguous time-ordered chunking — the paper-correct fix for
    * the reference's round-robin repartition (SURVEY.md §1.4.2).
    * Exact ntile(K) semantics, computed distributed: range-bucketed
    * row numbers + the SQL NTILE rule (graft.ts.OrderedRank) — no
    * single-partition global sort.
    */
  private val q09Chunk: Q = (s, d) =>
    graft.ts.OrderedRank.withNtile(
      Tables.events(s, d).select(col("ts"), col("event_id"), col("value")),
      col("ts"), col("event_id"), 8, "chunk_id")
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("chunk_id"))

  /** M7: array un-nesting with position (named-vector → KV tuples,
    * converters.py:55-69).
    */
  private val q10Explode: Q = (s, d) =>
    Tables.embeddings(s, d)
      .filter(col("vec_id") < 8)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        round(col("v").cast("double"), 6).as("v"))
      .orderBy(col("vec_id"), col("i"))

  /** A4: DLSA precision-weighted combine, paper-correct form
    * Σ w·θ / Σ w (darima.py:86-93 had it wrong; SURVEY.md §1.4.6).
    */
  private val q11DlsaCombine: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(round(sum(col("value") * (lit(1.0) + col("user_id"))) /
        sum(lit(1.0) + col("user_id")), 6).as("wavg"))
      .orderBy(col("event_type"))

  /** E1-E4 metric columns over an ordered series: seasonal-naive
    * scaling (lag m), MASE, sMAPE, MSIS as window/Column expressions
    * (reference computes these in driver pandas, darima.py:425-488).
    * Scale posture: the series lags come from graft.ts.OrderedLag
    * (range-bucketed parallel windows, no global single-partition
    * sort), and the two global scalars (scale, sd) from a tiny
    * aggregate broadcast-joined back.
    */
  private def metricBase(s: SparkSession, d: String): DataFrame = {
    // the lagged table feeds both the scalar aggregate and the metric
    // projection — materialize it once. (r3 measured the checkpoint
    // a wash when the lag pass cost three full window passes; with
    // the two-pass OrderedLag the duplicated subtree is the larger
    // cost at every scale.)
    val lagged = graft.ts.OrderedLag.withLags(
      Tables.events(s, d).select(col("event_id"), col("ts"), col("value")),
      col("ts"), col("event_id"), "value", Seq(1, 24))
      .select(col("event_id"), col("value").as("v"),
        col("value_lag1").as("pred"), col("value_lag24").as("season"))
      .filter(col("pred").isNotNull && col("season").isNotNull)
      .transform(graft.tools.Materialize(_))
    val scalars = lagged.agg(
      avg(abs(col("v") - col("season"))).as("scale"),
      stddev_samp(col("v")).as("sd"))
    lagged.crossJoin(broadcast(scalars))
      .withColumn("lo", col("pred") - lit(1.28) * col("sd"))
      .withColumn("hi", col("pred") + lit(1.28) * col("sd"))
      .withColumn("mase", abs(col("v") - col("pred")) / col("scale"))
      .withColumn("smape", lit(2) * abs(col("v") - col("pred")) /
        (abs(col("v")) + abs(col("pred"))))
      .withColumn("msis", (col("hi") - col("lo") +
        when(col("v") < col("lo"), (lit(2) / 0.2) * (col("lo") - col("v")))
          .otherwise(0) +
        when(col("v") > col("hi"), (lit(2) / 0.2) * (col("v") - col("hi")))
          .otherwise(0)) / col("scale"))
  }

  private val metricBaseSql: String =
    """WITH base AS (
      |  SELECT event_id, value AS v,
      |         lag(value, 1)  OVER (ORDER BY ts, event_id) AS pred,
      |         lag(value, 24) OVER (ORDER BY ts, event_id) AS season
      |  FROM events
      |), m AS (
      |  SELECT event_id, v, pred,
      |         avg(abs(v - season)) OVER () AS scale,
      |         stddev_samp(v) OVER () AS sd
      |  FROM base WHERE pred IS NOT NULL AND season IS NOT NULL
      |), mm AS (
      |  SELECT event_id, v, pred, scale,
      |         pred - 1.28 * sd AS lo, pred + 1.28 * sd AS hi
      |  FROM m
      |), mx AS (
      |  SELECT event_id,
      |         abs(v - pred) / scale AS mase,
      |         2 * abs(v - pred) / (abs(v) + abs(pred)) AS smape,
      |         (hi - lo
      |          + CASE WHEN v < lo THEN (2 / 0.2) * (lo - v) ELSE 0 END
      |          + CASE WHEN v > hi THEN (2 / 0.2) * (v - hi) ELSE 0 END
      |         ) / scale AS msis
      |  FROM mm
      |)""".stripMargin

  private val q12Metrics: Q = (s, d) =>
    metricBase(s, d)
      .select(col("event_id"), round(col("mase"), 6).as("mase"),
        round(col("smape"), 6).as("smape"), round(col("msis"), 6).as("msis"))
      .orderBy(col("event_id"))

  /** A5: columnar mean of the metric table (darima.py:120). */
  private val q13MetricMeans: Q = (s, d) =>
    metricBase(s, d)
      .agg(round(avg(col("mase")), 6).as("mean_mase"),
        round(avg(col("smape")), 6).as("mean_smape"),
        round(avg(col("msis")), 6).as("mean_msis"))

  /** Join pipeline (engine addition, SURVEY.md §2.8): revenue per
    * region/nation. Small dims are broadcast explicitly; the
    * lineitem⋈orders⋈customer chain shuffles on its keys and AQE
    * re-plans at runtime.
    */
  private val q14JoinRevenue: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("r_name"), col("n_name"))

  /** Top-k per group via rank window (engine addition). */
  private val q15TopK: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
        round(col("c_acctbal"), 2).as("bal"))
      .orderBy(col("c_mktsegment"), col("rn"))

  /** Anti join: customers with no large order, per nation (engine
    * addition). The 250k threshold keeps the result non-empty at all
    * scale factors so the oracle hash is a meaningful check.
    */
  private val q16AntiJoin: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 250000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("n_name"))

  /** DISTINCT (engine addition). */
  private val q17Distinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** ROLLUP grouping sets (engine addition). */
  private val q18Rollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Exact grouped percentiles (engine addition): Spark `percentile`
    * and DuckDB `quantile_cont` share the type-7 linear-interpolation
    * definition, so the values hash-match after rounding.
    */
  private val q19Percentile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      // one percentile agg with an array of fractions: the exact
      // percentile buffers every group value, so asking for both
      // quantiles from ONE buffer instead of two halves the
      // partial-aggregate memory and merge traffic
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"),
        round(col("ps").getItem(0), 4).as("p50"),
        round(col("ps").getItem(1), 4).as("p90"), col("n"))
      .orderBy(col("l_returnflag"))

  /** Pivot (engine addition): Spark's `pivot` relational operator —
    * per-day columns per event type. The oracle is the equivalent
    * conditional aggregation.
    */
  private val q20Pivot: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("ts").cast("date").as("day"), col("event_type"),
        col("value"))
      .groupBy(col("day"))
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(round(sum(col("value")), 2))
      .orderBy(col("day"))

  /** Full cube over two dimensions (engine addition — the reference
    * has no grouping sets at all, SURVEY.md §2.8): one pass, Catalyst
    * expands the grouping sets before the hash aggregate.
    */
  private val q21Cube: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), (col("user_id") % 5).as("ubucket"),
        col("value"))
      .cube(col("event_type"), col("ubucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("event_type").asc_nulls_first,
        col("ubucket").asc_nulls_first)

  /** TPC-H Q22 shape (engine addition): scalar-subquery threshold +
    * semi join — customers whose balance exceeds the average POSITIVE
    * balance and who placed at least one large order, rolled up per
    * market segment. The average is a 1-row broadcast scalar (rounded
    * to 6dp on both sides so the threshold compare cannot flip on
    * summation-order ulps); the order check is a left_semi join (the
    * dual of q16's anti join — Q22's NOT EXISTS side is empty on the
    * harness's dense orders table, so the EXISTS form keeps the hash
    * check meaningful at every scale factor).
    */
  private val q22ScalarSubquery: Q = (s, d) => {
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(round(avg(col("c_acctbal")), 6).as("ab"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 250000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q17 shape (engine addition): correlated-average threshold
    * — lineitems whose quantity is below half their part's average
    * quantity, rolled up per part. Catalyst rewrites the shape into
    * the same self-join the DataFrame states explicitly: one
    * per-part average aggregate joined back on l_partkey (both sides
    * shuffle on the same key, so AQE coalesces into one exchange
    * reuse). Quantities are integral doubles, so the per-part average
    * is an exact-integer sum over a count — no summation-order
    * dependence in the threshold compare.
    */
  private val q23CorrAvg: Q = (s, d) => {
    val l = Tables.lineitem(s, d)
    val avgQty = l.groupBy(col("l_partkey"))
      .agg(avg(col("l_quantity")).as("aq"))
    l.join(avgQty, "l_partkey")
      .filter(col("l_quantity") < lit(0.5) * col("aq"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(col("l_extendedprice")), 2).as("small_rev"))
      .orderBy(col("l_partkey"))
  }

  /** Per-customer order cadence via lag over an event-time window
    * (engine addition — the reference has no window functions,
    * SURVEY.md §2.8): day gaps between consecutive orders, rolled up
    * to min/max per customer. The window partitions on o_custkey —
    * millions of independent keys, so it hash-distributes; nothing
    * single-partition. Gaps are integer day counts (order-stat
    * arithmetic, no float anywhere).
    */
  private val q24OrderGaps: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("od"))
      // long, to line up with DuckDB's BIGINT date_diff
      .withColumn("gap",
        datediff(col("od"), lag(col("od"), 1).over(w)).cast("long"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("gap")).as("min_gap"), max(col("gap")).as("max_gap"))
      .filter(col("n_orders") >= 8)
      .orderBy(col("o_custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q01_scan_filter_project" -> q01ScanFilterProject,
    "q02_agg_sum" -> q02AggSum,
    "q03_agg_avg" -> q03AggAvg,
    "q04_filter_prefix" -> q04FilterPrefix,
    "q05_pad_sort" -> q05PadSort,
    "q06_union" -> q06Union,
    "q07_filter_split" -> q07FilterSplit,
    "q08_cast_ts" -> q08CastTs,
    "q09_chunk" -> q09Chunk,
    "q10_explode" -> q10Explode,
    "q11_dlsa_combine" -> q11DlsaCombine,
    "q12_metrics" -> q12Metrics,
    "q13_metric_means" -> q13MetricMeans,
    "q14_join_revenue" -> q14JoinRevenue,
    "q15_topk" -> q15TopK,
    "q16_anti_join" -> q16AntiJoin,
    "q17_distinct" -> q17Distinct,
    "q18_rollup" -> q18Rollup,
    "q19_percentile" -> q19Percentile,
    "q20_pivot" -> q20Pivot,
    "q21_cube" -> q21Cube,
    "q22_scalar_subquery" -> q22ScalarSubquery,
    "q23_corr_avg" -> q23CorrAvg,
    "q24_order_gaps" -> q24OrderGaps,
  )

  val oracles: Map[String, String] = Map(
    "q01_scan_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_quantity >= 30 AND l_shipdate < TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q03_agg_avg" ->
      """SELECT o_orderpriority,
        |  CAST(round(CAST(CAST(
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS VARCHAR) AS DECIMAL(38,16)), 2) AS DOUBLE)
        |    AS avg_price,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_filter_prefix" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE text LIKE 'the %' ORDER BY doc_id""".stripMargin,
    "q05_pad_sort" ->
      """SELECT 'ar_' || lpad(CAST(l_linenumber AS VARCHAR), 8, '0') AS coef,
        |  round(sum(l_quantity), 2) AS total
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q06_union" ->
      """SELECT c_name AS name, round(c_acctbal, 2) AS acctbal,
        |  'cust' AS kind FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT s_name, round(s_acctbal, 2), 'supp' FROM supplier
        |WHERE s_acctbal > 9000
        |ORDER BY kind, name""".stripMargin,
    "q07_filter_split" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'err' ELSE 'rest' END
        |  AS grp, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_cast_ts" ->
      """SELECT event_id, CAST(ts AS DATE) AS day, hour(ts) AS hr
        |FROM events WHERE event_type = 'click' ORDER BY event_id""".stripMargin,
    "q09_chunk" ->
      """SELECT chunk_id, count(*) AS n, round(sum(value), 2) AS total
        |FROM (SELECT ntile(8) OVER (ORDER BY ts, event_id) AS chunk_id,
        |        value FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_explode" ->
      """SELECT vec_id, i, round(CAST(embedding[i + 1] AS DOUBLE), 6) AS v
        |FROM embeddings, UNNEST(range(len(embedding))) AS r(i)
        |WHERE vec_id < 8 ORDER BY vec_id, i""".stripMargin,
    "q11_dlsa_combine" ->
      """SELECT event_type,
        |  round(sum(value * (1.0 + user_id)) / sum(1.0 + user_id), 6)
        |    AS wavg
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_metrics" ->
      (metricBaseSql +
        """
          |SELECT event_id, round(mase, 6) AS mase, round(smape, 6) AS smape,
          |  round(msis, 6) AS msis
          |FROM mx ORDER BY event_id""".stripMargin),
    "q13_metric_means" ->
      (metricBaseSql +
        """
          |SELECT round(avg(mase), 6) AS mean_mase,
          |  round(avg(smape), 6) AS mean_smape,
          |  round(avg(msis), 6) AS mean_msis
          |FROM mx""".stripMargin),
    "q14_join_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q15_topk" ->
      """SELECT c_mktsegment, rn, c_custkey, round(c_acctbal, 2) AS bal
        |FROM (SELECT c_mktsegment, c_custkey, c_acctbal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |          ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "q16_anti_join" ->
      """SELECT n_name, count(*) AS n_cust
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_totalprice > 250000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,
    "q18_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q19_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 2)
        |    AS click,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 2)
        |    AS view,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2)
        |    AS purchase
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_cube" ->
      """SELECT event_type, user_id % 5 AS ubucket, count(*) AS n,
        |  round(sum(value), 2) AS total
        |FROM events GROUP BY CUBE(event_type, ubucket)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,
    "q22_scalar_subquery" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_totalprice > 250000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q23_corr_avg" ->
      """SELECT l.l_partkey, count(*) AS n_small,
        |       round(sum(l.l_extendedprice), 2) AS small_rev
        |FROM lineitem l
        |JOIN (SELECT l_partkey, avg(l_quantity) AS aq
        |      FROM lineitem GROUP BY l_partkey) t
        |  ON l.l_partkey = t.l_partkey
        |WHERE l.l_quantity < 0.5 * t.aq
        |GROUP BY l.l_partkey ORDER BY l.l_partkey""".stripMargin,
    "q24_order_gaps" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         date_diff('day',
        |           lag(CAST(o_orderdate AS DATE)) OVER
        |             (PARTITION BY o_custkey
        |              ORDER BY CAST(o_orderdate AS DATE), o_orderkey),
        |           CAST(o_orderdate AS DATE)) AS gap
        |  FROM orders
        |)
        |SELECT o_custkey, count(*) AS n_orders,
        |       min(gap) AS min_gap, max(gap) AS max_gap
        |FROM g GROUP BY o_custkey
        |HAVING count(*) >= 8
        |ORDER BY o_custkey""".stripMargin,
  )
}
