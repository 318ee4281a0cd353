package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Windowed / sessionized analytics over `events` (SURVEY.md §2.9 X5)
  * — the batch twins of the streaming operators in graft.streaming.
  */
object EventsAnalytics {

  /** Tumbling 1-hour windows per event type, via Spark's `window`
    * operator (start == date_trunc('hour') for aligned windows, which
    * is what the oracle uses).
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      // values are 2dp by construction: summing them as exact integer
      // cents makes the aggregate independent of float summation
      // order, so both engines round identical input bits (a true
      // .xxxx5 mean at sf0.1 exposed a one-ulp order tie). A LONG sum
      // stays inside codegen — the DECIMAL(14,2) accumulation it
      // replaces was the r3 bench tax on x13/x25.
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("w.start").as("hr"), col("event_type"), col("n"),
        round(col("cents").cast("double") / 100.0, 2).as("total"),
        round(col("cents").cast("double") / 100.0 / col("n"), 4)
          .as("avg_value"))
      .orderBy(col("hr"), col("event_type"))

  /** avg_value rounds through the value's shortest decimal string —
    * Spark's round(double) goes via BigDecimal.valueOf (i.e.
    * Double.toString), so an exact-decimal mean like 47.25375 rounds
    * UP even though its binary double sits just below the boundary;
    * DuckDB's native round works on the raw binary and rounds DOWN.
    * CAST(x AS VARCHAR) is DuckDB's shortest round-trip repr, making
    * the decimal round identical to Spark's. The integer-cents sums
    * make the input bits engine-independent first (summation order);
    * CAST AS DOUBLE before dividing also avoids driver-unsafe HUGEINT.
    */
  val tumblingHourlySql: String =
    """WITH c AS (
      |  SELECT date_trunc('hour', ts) AS hr, event_type,
      |         CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |)
      |SELECT hr, event_type, count(*) AS n,
      |  round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS total,
      |  CAST(round(CAST(CAST(
      |    CAST(sum(cents) AS DOUBLE) / 100.0 / count(*)
      |    AS VARCHAR) AS DECIMAL(38,16)), 4) AS DOUBLE) AS avg_value
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** X5o: DIURNAL event profile — per (event_type, hour-of-day):
    * event count, exact integer-cent value sum, and the share of the
    * type's daily traffic in basis points. x13 buckets by absolute
    * hour (a time series); this FOLDS all days onto the 24-hour
    * clock — the capacity-planning / anomaly-baseline table ("type X
    * peaks at 14:00 with 9% of its traffic") and the seasonality
    * prior a streaming anomaly detector normalizes against.
    * Scale shape: one map-side hour() projection, one hash aggregate
    * to ≤ \|types\|·24 rows, one bounded per-type totals join.
    */
  def diurnalProfile(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("event_type"), hour(col("ts")).as("hr"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("value_cents"))
    val tot = hourly.groupBy(col("event_type").as("et"))
      .agg(sum(col("n")).as("nt"))
    hourly.join(tot, col("event_type") === col("et"))
      .select(col("event_type"), col("hr"), col("n"), col("value_cents"),
        expr("n * 10000 div nt").as("share_bp"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** Oracle: same fold, same integer cents and shares. */
  val diurnalProfileSql: String =
    """WITH h AS (
      |  SELECT event_type, CAST(hour(ts) AS INT) AS hr,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |           AS value_cents
      |  FROM events GROUP BY 1, 2
      |), t AS (
      |  SELECT event_type, CAST(sum(n) AS BIGINT) AS nt
      |  FROM h GROUP BY 1
      |)
      |SELECT h.event_type, hr, n, value_cents,
      |       CAST(n * 10000 // nt AS BIGINT) AS share_bp
      |FROM h JOIN t ON t.event_type = h.event_type
      |ORDER BY h.event_type, hr""".stripMargin

  /** Sliding windows: 2-hour windows every 30 minutes via Spark's
    * native sliding `window` (each event lands in windowSec/slideSec
    * overlapping windows; the explosion happens before the hash
    * aggregate, map-side partial combine keeps the shuffle at
    * |windows| rows). The oracle reproduces the window assignment
    * arithmetic with a positional UNNEST.
    */
  def slidingWindows(events: DataFrame, windowSec: Int,
      slideSec: Int): DataFrame =
    events
      .groupBy(window(col("ts"), s"$windowSec seconds",
        s"$slideSec seconds").as("w"))
      // integer-cents sum: order-independent AND codegen-cheap
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("w.start").as("ws"), col("n"),
        round(col("cents").cast("double") / 100.0, 2).as("total"))
      .orderBy(col("ws"))

  def slidingWindowsSql(windowSec: Int, slideSec: Int): String = {
    val k = windowSec / slideSec
    s"""WITH e AS (
       |  SELECT CAST(floor(epoch(ts) / $slideSec) AS BIGINT) AS slot, value
       |  FROM events
       |), assigned AS (
       |  SELECT make_timestamp((slot - i) * ${slideSec}000000) AS ws,
       |         CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM e, UNNEST(range($k)) AS r(i)
       |)
       |SELECT ws, count(*) AS n,
       |       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS total
       |FROM assigned GROUP BY ws ORDER BY ws""".stripMargin
  }

  /** Rolling 24-event sum over the global time order, computed
    * distributed (graft.ts.OrderedLag.withRollingColumns — bucketed
    * sliding frames + boundary head patch; no single-partition
    * window). Values sum as exact integer cents so the result is
    * independent of float summation order on any engine — and the
    * LONG frame sum stays codegen-cheap where the DECIMAL(14,2) it
    * replaces was the single most expensive bench query.
    */
  def rollingSum(events: DataFrame, window: Int): DataFrame = {
    val built = graft.ts.OrderedLag.withRollingColumns(
      events.select(col("event_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents")),
      col("ts"), col("event_id"),
      (in, w) => in
        .withColumn("__rsum",
          sum(col("cents")).over(w.rowsBetween(-(window - 1), 0)))
        .withColumn("__rcnt",
          count(lit(1)).over(w.rowsBetween(-(window - 1), 0))),
      Seq("__rsum", "__rcnt"), window)
    built.select(col("event_id"),
      round(col("__rsum").cast("double") / 100.0, 2).as("rsum"),
      col("__rcnt").as("rn"))
      .orderBy(col("event_id"))
  }

  def rollingSumSql(window: Int): String =
    s"""WITH c AS (
       |  SELECT event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events
       |)
       |SELECT event_id,
       |  round(CAST(sum(cents) OVER (
       |    ORDER BY ts, event_id
       |    ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW)
       |    AS DOUBLE) / 100.0, 2) AS rsum,
       |  count(*) OVER (
       |    ORDER BY ts, event_id
       |    ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW) AS rn
       |FROM c ORDER BY event_id""".stripMargin

  /** Sessionization: per user, a new session starts after a gap of
    * more than `gapSec`. session index = running count of
    * session-start flags (the standard lag + cumulative-sum
    * rewrite); emits one row per session.
    */
  def sessions(events: DataFrame, gapSec: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    val cum = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .select(col("user_id"), col("event_id"),
        col("ts").cast("double").as("ep"), col("value"))
      .withColumn("prev", lag(col("ep"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("ep") - col("prev") > gapSec, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        round(max(col("ep")) - min(col("ep")), 3).as("dur_sec"),
        round(sum(col("value")), 2).as("total"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  def sessionsSql(gapSec: Int): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch(ts) AS ep, value FROM events
       |), flagged AS (
       |  SELECT user_id, event_id, ep, value,
       |         CASE WHEN lag(ep) OVER w IS NULL
       |                OR ep - lag(ep) OVER w > $gapSec
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
       |), sess AS (
       |  SELECT user_id, ep, value,
       |         -- BIGINT cast: DuckDB sum(int) yields HUGEINT, which the
       |         -- harness hashes differently from Spark's LongType.
       |         CAST(sum(new_s) OVER (PARTITION BY user_id
       |           ORDER BY ep, event_id
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM flagged
       |)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |       round(max(ep) - min(ep), 3) AS dur_sec,
       |       round(sum(value), 2) AS total
       |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** X5': first-touch session attribution — every purchase credited
    * to the FIRST event type of its session (the acquisition-channel
    * report marketing runs on every conversion log): the x14
    * sessionizer's lag + cumulative-sum session ids, a per-session
    * first-event pick as ONE struct-min aggregate (never a
    * per-purchase scan-back), and the purchase rows joined back
    * co-keyed on (user, session). Revenue in exact integer cents.
    * Shape: two per-user bounded windows + two hash aggregates + one
    * co-keyed join — the parallelism unit is the user, same as x14.
    */
  def firstTouchAttribution(events: DataFrame,
      gapSec: Int = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val sess = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("double").as("ep"), col("value"))
      .withColumn("prev", lag(col("ep"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("ep") - col("prev") > gapSec, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_s")).over(cum))
    // (ep, event_id) is unique per user, so the struct min IS the
    // first event — deterministic without a second window pass
    val firsts = sess.groupBy(col("user_id"), col("session_idx"))
      .agg(min(struct(col("ep"), col("event_id"), col("event_type")))
        .as("f"))
      .select(col("user_id"), col("session_idx"),
        col("f.event_type").as("first_touch"))
    sess.filter(col("event_type") === "purchase")
      .join(firsts, Seq("user_id", "session_idx"))
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(floor(col("value") * 100).cast("long")).as("revenue_c"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("first_touch"))
  }

  def firstTouchAttributionSql(gapSec: Int = 1800): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch(ts) AS ep, value
       |  FROM events
       |), flagged AS (
       |  SELECT user_id, event_id, event_type, ep, value,
       |         CASE WHEN lag(ep) OVER w IS NULL
       |                OR ep - lag(ep) OVER w > $gapSec
       |              THEN 1 ELSE 0 END AS new_s
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
       |), sess AS (
       |  SELECT user_id, event_id, event_type, ep, value,
       |         CAST(sum(new_s) OVER (PARTITION BY user_id
       |           ORDER BY ep, event_id
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM flagged
       |), firsts AS (
       |  SELECT user_id, session_idx, event_type AS first_touch FROM (
       |    SELECT user_id, session_idx, event_type,
       |      row_number() OVER (PARTITION BY user_id, session_idx
       |                         ORDER BY ep, event_id) AS rk
       |    FROM sess) WHERE rk = 1
       |)
       |SELECT f.first_touch,
       |  CAST(count(*) AS BIGINT) AS n_purchases,
       |  CAST(sum(CAST(floor(p.value * 100) AS BIGINT)) AS BIGINT)
       |    AS revenue_c,
       |  CAST(count(DISTINCT p.user_id) AS BIGINT) AS n_users
       |FROM sess p
       |JOIN firsts f ON f.user_id = p.user_id
       |  AND f.session_idx = p.session_idx
       |WHERE p.event_type = 'purchase'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** X5': per-type z-score anomaly flags — events whose value sits
    * more than `z` population standard deviations from the type mean.
    * Values are 2dp by construction, so moments are computed from
    * exact integer-cent sums (sum and sum-of-squares as BIGINT, well
    * inside both long and 2^53 at harness scales) and the remaining
    * float math is one fixed IEEE expression evaluated identically in
    * both engines — no parallel-summation-order dependence anywhere.
    * The output z is integer-quantized (ten-thousandths).
    *
    * Shape: one hash aggregate keyed on event_type (map-side
    * partials), a join back against the ≤|event types|-row stats dim
    * (AQE broadcasts it), one filter — linear at any SF.
    */
  def anomalies(events: DataFrame, z: Double = 3.0): DataFrame =
    scoreAnomalies(events,
      anomalyStatsFromMoments(anomalyMoments(events)), z)
      .orderBy(col("event_id"))

  /** The integer-cent projection every anomaly stage shares. */
  private def cents(events: DataFrame): DataFrame =
    events.withColumn("v100", round(col("value") * 100, 0).cast("long"))

  /** Per-type linear TIME TREND — the drift monitor next to x63's
    * level anomalies: closed-form OLS of integer-cent value against
    * event time, slope reported in exact integer nano-cents/second.
    * A type whose mean is stable but whose slope is nonzero is
    * ramping (x63 can't see it until it has ramped); the table an
    * alerting pipeline thresholds.
    *
    * Exactness at scale: times are first re-based to each type's own
    * min (a per-type constant shift — slope-invariant), so the OLS
    * moments grow with the time SPAN, not the epoch: Σt'² ≤ n·span²
    * holds in DECIMAL(38,0) past 10⁹ rows where raw-epoch (Σt)²
    * would overflow near 10⁹. slope = (n·Σt'y − Σt'·Σy) ·10⁹ div
    * (n·Σt'² − (Σt')²) — all-integer, truncation identical in both
    * engines; zero-variance types (one event, or all simultaneous)
    * are excluded in both dialects rather than divided by zero.
    *
    * Scale shape: one per-type min pass + one co-keyed join + one
    * moment aggregate — two hash exchanges on the same key, output
    * ≤|types| rows.
    */
  def typeTrends(events: DataFrame): DataFrame = {
    val e = cents(events)
      .select(col("event_type"), col("ts").cast("long").as("t"),
        col("v100"))
    val tmin = e.groupBy(col("event_type")).agg(min(col("t")).as("t0"))
    val dec = "decimal(38,0)"
    e.join(tmin, "event_type")
      .withColumn("td", (col("t") - col("t0")).cast(dec))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v100")).as("sy"),
        sum(col("td")).as("st"),
        sum(col("td") * col("td")).as("stt"),
        sum(col("td") * col("v100").cast(dec)).as("sty"))
      .withColumn("den", col("n").cast(dec) * col("stt") -
        col("st") * col("st"))
      .filter(col("den") > 0)
      .select(col("event_type"), col("n"),
        expr("sy div n").as("y_mean_c"),
        expr("((cast(n as decimal(38,0)) * sty - st * sy) " +
          "* 1000000000) div den").as("slope_nano_c"))
      .orderBy(col("event_type"))
  }

  /** A/B EXPERIMENT READOUT — per event type, the Welch t statistic
    * on per-user total spend between two deterministic hash arms:
    * the table an experimentation pipeline reads to call a treatment
    * effect, built the scale-safe way (unit-level aggregation FIRST,
    * then arm moments — never a user-level collect). Arms come from
    * the md5 parity of the user id — the same split on any engine,
    * any day, any cluster, with no RNG state to version.
    *
    * Exactness: per-user spend and the arm moments (n, Σs, Σs²) are
    * exact integers (cents; squares in DECIMAL(38,0)); arm means are
    * exact integer division. Floats appear only in the final fixed
    * Welch projection — sample variances, the t statistic, and
    * Welch–Satterthwaite df, each one left-associated IEEE expression
    * rounded at 4dp, identical in both engines. Types where either
    * arm has < 2 users (no variance) are excluded in both dialects.
    *
    * Scale shape: one (type, user) hash aggregate (map-side
    * combinable), one (type, arm) moment aggregate, output
    * ≤\|types\| rows. The user-id hash is the x02-family md5 prefix.
    */
  def abWelch(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val perUser = cents(events)
      .withColumn("arm", pmod(expr(
        Dedup.hash16FastExpr("cast(user_id as string)")), lit(2)))
      .groupBy(col("event_type"), col("arm"), col("user_id"))
      .agg(sum(col("v100")).as("sv"))
    val m = perUser.groupBy(col("event_type"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("sv")).as("s"),
        sum(col("sv").cast(dec) * col("sv").cast(dec)).as("ss"))
      .filter(col("n") >= 2)
      .withColumn("v", (col("ss").cast("double") -
        col("s").cast("double") * col("s").cast("double") /
          col("n").cast("double")) / (col("n") - 1).cast("double"))
    val a = m.filter(col("arm") === 0).select(col("event_type"),
      col("n").as("n_a"), col("s").as("s_a"), col("v").as("v_a"))
    val b = m.filter(col("arm") === 1).select(col("event_type"),
      col("n").as("n_b"), col("s").as("s_b"), col("v").as("v_b"))
    a.join(b, "event_type")
      .withColumn("se2", col("v_a") / col("n_a").cast("double") +
        col("v_b") / col("n_b").cast("double"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("s_a div n_a").as("mean_a_c"),
        expr("s_b div n_b").as("mean_b_c"),
        round((col("s_a").cast("double") / col("n_a").cast("double") -
          col("s_b").cast("double") / col("n_b").cast("double")) /
          sqrt(col("se2")), 4).as("t_welch"),
        round(col("se2") * col("se2") /
          (col("v_a") / col("n_a").cast("double") *
            (col("v_a") / col("n_a").cast("double")) /
            (col("n_a") - 1).cast("double") +
            col("v_b") / col("n_b").cast("double") *
              (col("v_b") / col("n_b").cast("double")) /
              (col("n_b") - 1).cast("double")), 4).as("df_ws"))
      .orderBy(col("event_type"))
  }

  /** Oracle: the same exact moments and the same left-associated
    * float projection.
    */
  val abWelchSql: String = {
    val h = Dedup.hash16Expr("strpos", "CAST(user_id AS VARCHAR)")
    s"""WITH pu AS (
       |  SELECT event_type, $h % 2 AS arm, user_id,
       |         sum(CAST(round(value * 100, 0) AS BIGINT)) AS sv
       |  FROM events GROUP BY 1, 2, 3
       |), m AS (
       |  SELECT event_type, arm, count(*) AS n,
       |         sum(sv) AS s,
       |         sum(CAST(sv AS HUGEINT) * sv) AS ss
       |  FROM pu GROUP BY 1, 2 HAVING count(*) >= 2
       |), mv AS (
       |  SELECT event_type, arm, n, s,
       |    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |       / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS v
       |  FROM m
       |), ab AS (
       |  SELECT a.event_type,
       |    a.n AS n_a, b.n AS n_b, a.s AS s_a, b.s AS s_b,
       |    a.v AS v_a, b.v AS v_b,
       |    a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE) AS se2
       |  FROM mv a JOIN mv b ON a.event_type = b.event_type
       |   AND a.arm = 0 AND b.arm = 1
       |)
       |SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
       |  CAST(n_b AS BIGINT) AS n_b,
       |  CAST(s_a // n_a AS BIGINT) AS mean_a_c,
       |  CAST(s_b // n_b AS BIGINT) AS mean_b_c,
       |  round((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
       |    - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / sqrt(se2), 4)
       |    AS t_welch,
       |  round(se2 * se2 /
       |    (v_a / CAST(n_a AS DOUBLE) * (v_a / CAST(n_a AS DOUBLE))
       |       / CAST(n_a - 1 AS DOUBLE)
       |     + v_b / CAST(n_b AS DOUBLE) * (v_b / CAST(n_b AS DOUBLE))
       |       / CAST(n_b - 1 AS DOUBLE)), 4) AS df_ws
       |FROM ab ORDER BY event_type""".stripMargin
  }

  /** Oracle: identical re-based HUGEINT moments and division. */
  val typeTrendsSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS t,
      |         CAST(round(value * 100, 0) AS BIGINT) AS v100
      |  FROM events
      |), tm AS (
      |  SELECT event_type, min(t) AS t0 FROM e GROUP BY 1
      |), m AS (
      |  SELECT e.event_type, count(*) AS n,
      |         sum(CAST(e.v100 AS HUGEINT)) AS sy,
      |         sum(CAST(e.t - t.t0 AS HUGEINT)) AS st,
      |         sum(CAST(e.t - t.t0 AS HUGEINT) * (e.t - t.t0)) AS stt,
      |         sum(CAST(e.t - t.t0 AS HUGEINT) * e.v100) AS sty
      |  FROM e JOIN tm t USING (event_type) GROUP BY 1
      |)
      |SELECT event_type, CAST(n AS BIGINT) AS n,
      |  CAST(sy // n AS BIGINT) AS y_mean_c,
      |  CAST((n * sty - st * sy) * 1000000000
      |    // (n * stt - st * st) AS BIGINT) AS slope_nano_c
      |FROM m WHERE n * stt - st * st > 0
      |ORDER BY event_type""".stripMargin

  /** Per-type exact integer moments (n, Σv, Σv²) — pure sums, so the
    * same groupBy runs as an UPDATE-mode streaming aggregation whose
    * drained state equals the batch table (streaming twin:
    * `EventsStream.anomalyMomentsRunning`).
    */
  def anomalyMoments(events: DataFrame): DataFrame =
    cents(events)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v100")).as("s"),
        sum(col("v100") * col("v100")).as("ss"))

  /** Moments → (mean, population sd) stats dim, one fixed IEEE
    * expression per column.
    */
  def anomalyStatsFromMoments(moments: DataFrame): DataFrame =
    moments
      .select(col("event_type"),
        (col("s").cast("double") / col("n")).as("mean100"),
        sqrt((col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n"))
          / col("n")).as("sd100"))
      // sd = 0 (constant type, or a single row) admits no anomaly and
      // would divide by zero under ANSI — drop the type up front
      .filter(col("sd100") > 0)

  /** Stateless scoring against a FIXED stats dim — usable on a batch
    * frame or per-row on an ingest stream.
    */
  def scoreAnomalies(events: DataFrame, stats: DataFrame,
      z: Double): DataFrame =
    cents(events).join(stats, "event_type")
      .withColumn("zs",
        (col("v100").cast("double") - col("mean100")) / col("sd100"))
      .filter(abs(col("zs")) > z)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("zs") * 10000, 0).cast("long").as("z4"))

  /** X5'': ordered conversion funnel (view → click → purchase) — the
    * product-analytics staple the events surface lacked. A user
    * reaches step k iff they have a step-k event AFTER their step-
    * (k−1) arrival and within `gapSec` of it; step times are the
    * EARLIEST qualifying events (min-aggregation semantics, the
    * standard funnel definition). Output is always exactly 3 rows:
    * (step_idx, step, users, conv_bp) with conversion from the
    * previous stage in integer basis points (users·10⁴ div prev —
    * exact integers, no float division anywhere; NULL when the
    * previous stage is empty, so the ANSI dialect can't divide by
    * zero on a degenerate corpus).
    *
    * Scale shape: three user_id-keyed aggregates chained by
    * user_id-co-keyed joins (each join key is the previous
    * aggregation's grouping key, so the exchange is reused), then
    * three 1-row counts cross-joined — the allowlisted
    * 1-row-broadcast shape. Linear at any SF.
    */
  def funnel(events: DataFrame, gapSec: Long = 604800L): DataFrame =
    funnelReport(funnelSteps(events, gapSec),
      events.select(col("user_id")).distinct())

  /** The per-user step-completion relation behind [[funnel]]:
    * (user_id, step_idx, t) — one row per step a user reaches, t the
    * earliest qualifying event time. Shared with the streaming
    * funnel-progress twin, whose drained output must equal this
    * relation exactly.
    */
  def funnelSteps(events: DataFrame, gapSec: Long = 604800L): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      col("ts").cast("double").as("ep"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ep")).as("t1"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" && col("ep") > col("t1") &&
        col("ep") <= col("t1") + gapSec)
      .groupBy(col("user_id")).agg(min(col("ep")).as("t2"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" && col("ep") > col("t2") &&
        col("ep") <= col("t2") + gapSec)
      .groupBy(col("user_id")).agg(min(col("ep")).as("t3"))
    v.select(col("user_id"), lit(1).as("step_idx"), col("t1").as("t"))
      .unionByName(c.select(col("user_id"), lit(2).as("step_idx"),
        col("t2").as("t")))
      .unionByName(p.select(col("user_id"), lit(3).as("step_idx"),
        col("t3").as("t")))
  }

  /** The 3-row report finisher over a step relation plus the distinct
    * user dim — shared by the batch operator and the streaming
    * drain-time finisher.
    */
  def funnelReport(steps: DataFrame, users: DataFrame): DataFrame = {
    val row = users.agg(count(lit(1)).as("u0"))
      .crossJoin(steps.filter(col("step_idx") === 1)
        .agg(count(lit(1)).as("u1")))
      .crossJoin(steps.filter(col("step_idx") === 2)
        .agg(count(lit(1)).as("u2")))
      .crossJoin(steps.filter(col("step_idx") === 3)
        .agg(count(lit(1)).as("u3")))
    def bp(num: String, den: String) =
      when(col(den) === 0, lit(null).cast("long"))
        .otherwise(expr(s"10000 * $num div $den"))
    row.select(explode(array(
      struct(lit(1).as("step_idx"), lit("view").as("step"),
        col("u1").as("users"), bp("u1", "u0").as("conv_bp")),
      struct(lit(2).as("step_idx"), lit("click").as("step"),
        col("u2").as("users"), bp("u2", "u1").as("conv_bp")),
      struct(lit(3).as("step_idx"), lit("purchase").as("step"),
        col("u3").as("users"), bp("u3", "u2").as("conv_bp")))).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.users"),
        col("r.conv_bp"))
      .orderBy(col("step_idx"))
  }

  def funnelSql(gapSec: Long = 604800L): String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch(ts) AS ep FROM events
       |), v AS (
       |  SELECT user_id, min(ep) AS t1 FROM e
       |  WHERE event_type = 'view' GROUP BY 1
       |), c AS (
       |  SELECT e.user_id, min(e.ep) AS t2
       |  FROM e JOIN v USING (user_id)
       |  WHERE e.event_type = 'click' AND e.ep > v.t1
       |    AND e.ep <= v.t1 + $gapSec
       |  GROUP BY 1
       |), p AS (
       |  SELECT e.user_id, min(e.ep) AS t3
       |  FROM e JOIN c USING (user_id)
       |  WHERE e.event_type = 'purchase' AND e.ep > c.t2
       |    AND e.ep <= c.t2 + $gapSec
       |  GROUP BY 1
       |), u AS (
       |  SELECT (SELECT count(DISTINCT user_id) FROM e) AS u0,
       |         (SELECT count(*) FROM v) AS u1,
       |         (SELECT count(*) FROM c) AS u2,
       |         (SELECT count(*) FROM p) AS u3
       |)
       |SELECT step_idx, step, users, conv_bp FROM (
       |  SELECT 1 AS step_idx, 'view' AS step,
       |    CAST(u1 AS BIGINT) AS users,
       |    CASE WHEN u0 = 0 THEN NULL
       |         ELSE CAST(10000 * u1 // u0 AS BIGINT) END AS conv_bp
       |  FROM u
       |  UNION ALL
       |  SELECT 2, 'click', CAST(u2 AS BIGINT),
       |    CASE WHEN u1 = 0 THEN NULL
       |         ELSE CAST(10000 * u2 // u1 AS BIGINT) END
       |  FROM u
       |  UNION ALL
       |  SELECT 3, 'purchase', CAST(u3 AS BIGINT),
       |    CASE WHEN u2 = 0 THEN NULL
       |         ELSE CAST(10000 * u3 // u2 AS BIGINT) END
       |  FROM u
       |) ORDER BY step_idx""".stripMargin

  /** X5'': signup-free cohort retention — cohort = each user's first
    * event DATE, and the matrix counts distinct users from each
    * cohort active again `day_off` days later, with retention in
    * integer basis points against the cohort's size (exact integer
    * division; cohort_users ≥ 1 by construction, so no zero guard is
    * needed). The (cohort, day_off) matrix is the table every
    * growth dashboard draws.
    *
    * Scale shape: one user_id aggregate (first date), one co-keyed
    * join back (user_id — the aggregate's own key), one
    * (cohort, day_off) hash aggregate with map-side distinct
    * partials, one ≤|dates|-row cohort-size dim joined on cohort.
    * Linear; no window anywhere.
    */
  def retentionCohorts(events: DataFrame): DataFrame =
    retentionFromPairs(
      events.select(col("user_id"), to_date(col("ts")).as("d")))

  /** The x92 tail over a (user_id, d) activity relation — shared by
    * the batch operator and the streaming drain finisher (duplicate
    * pairs are harmless: first-date is a min, activity a distinct
    * count).
    */
  private[graft] def retentionFromPairs(e: DataFrame): DataFrame = {
    // join-free form: the cohort is a per-user window min, and the
    // cohort size is the day-0 activity (every user is active on
    // their own first day), recovered as a window over the bounded
    // (cohort, day_off) matrix — two exchanges total, no self-join
    // (which both drops two joins from the batch plan and sidesteps
    // Spark's reference-dedup failure on memory-sink relations when
    // the streaming drain finisher runs this over drained pairs)
    val withCohort = e.withColumn("cohort",
      min(col("d")).over(Window.partitionBy(col("user_id"))))
    withCohort
      .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_off"))
      .agg(countDistinct(col("user_id")).as("active"))
      .withColumn("cohort_users",
        sum(when(col("day_off") === 0, col("active")))
          .over(Window.partitionBy(col("cohort"))))
      .select(col("cohort"), col("day_off"), col("active"),
        col("cohort_users"),
        expr("10000 * active div cohort_users").as("ret_bp"))
      .orderBy(col("cohort"), col("day_off"))
  }

  val retentionCohortsSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d FROM events
      |), first AS (
      |  SELECT user_id, min(d) AS cohort FROM e GROUP BY 1
      |), sizes AS (
      |  SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
      |  FROM first GROUP BY 1
      |), act AS (
      |  SELECT first.cohort, date_diff('day', first.cohort, e.d) AS day_off,
      |         CAST(count(DISTINCT e.user_id) AS BIGINT) AS active
      |  FROM e JOIN first USING (user_id)
      |  GROUP BY 1, 2
      |)
      |SELECT cohort, CAST(day_off AS INT) AS day_off, active, cohort_users,
      |       CAST(10000 * active // cohort_users AS BIGINT) AS ret_bp
      |FROM act JOIN sizes USING (cohort)
      |ORDER BY cohort, day_off""".stripMargin

  /** X5'': session path analysis — the event-type transition matrix
    * over CONSECUTIVE events of a user within one session. Two
    * consecutive events share a session iff their gap is ≤ `gapSec`
    * (exactly the x14 sessionization rule: sessions split where the
    * gap exceeds it), so the transition relation needs no session
    * index at all — one lag per user and a gap filter, saving the
    * second exchange a (user, session)-keyed window would force.
    * Output: (src, dst, n, p_bp) — counts plus the row-normalized
    * transition probability in integer basis points (the first-order
    * Markov model of user behavior).
    *
    * Scale shape: one user_id-partitioned window (bounded per-user
    * partitions — no global window), one |types|²-bounded hash
    * aggregate, one ≤|types|-row totals dim joined on src.
    */
  def sessionTransitions(events: DataFrame, gapSec: Int = 1800): DataFrame =
    transitionsFromPairs(transitionPairs(events, gapSec))

  /** The raw (src, dst) transition relation (one row per qualifying
    * consecutive pair) — shared with the streaming twin, whose
    * drained rows must equal this multiset.
    */
  private[graft] def transitionPairs(events: DataFrame,
      gapSec: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ep"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").cast("double").as("ep"))
      .withColumn("prev_t", lag(col("event_type"), 1).over(byUser))
      .withColumn("prev_ep", lag(col("ep"), 1).over(byUser))
      .filter(col("prev_t").isNotNull &&
        col("ep") - col("prev_ep") <= gapSec)
      .select(col("prev_t").as("src"), col("event_type").as("dst"))
  }

  /** The x93 tail over a (src, dst) pair relation — counts +
    * row-normalized p_bp; the per-src total is a window over the
    * bounded |types|² matrix (join-free, the drain-finisher-safe
    * form). Shared by batch and the streaming drain finisher.
    */
  private[graft] def transitionsFromPairs(pairs: DataFrame): DataFrame =
    pairs
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("out_n",
        sum(col("n")).over(Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"), col("n"),
        expr("10000 * n div out_n").as("p_bp"))
      .orderBy(col("src"), col("dst"))

  def sessionTransitionsSql(gapSec: Int = 1800): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch(ts) AS ep FROM events
       |), lagged AS (
       |  SELECT event_type,
       |         lag(event_type) OVER w AS prev_t,
       |         ep, lag(ep) OVER w AS prev_ep
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
       |), pairs AS (
       |  SELECT prev_t AS src, event_type AS dst,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM lagged
       |  WHERE prev_t IS NOT NULL AND ep - prev_ep <= $gapSec
       |  GROUP BY 1, 2
       |), totals AS (
       |  SELECT src, CAST(sum(n) AS BIGINT) AS out_n FROM pairs GROUP BY 1
       |)
       |SELECT src, dst, n, CAST(10000 * n // out_n AS BIGINT) AS p_bp
       |FROM pairs JOIN totals USING (src)
       |ORDER BY src, dst""".stripMargin

  /** X5''/X7: winsorization report — per event type, the exact
    * loPct/hiPct percentile bounds of the 2dp value distribution and
    * what clipping to them does: counts clipped below/above and the
    * exact winsorized sum. The standard outlier treatment before any
    * value feeds a mean-sensitive model; the report is what an
    * operator inspects before enabling it.
    *
    * Exact percentiles the x100 way: values quantize to integer
    * cents, collapse to a per-type (cents, n) HISTOGRAM (bounded by
    * the distinct 2dp values, NOT by row count), and the p-th
    * percentile is the smallest cent value whose cumulative count
    * clears ⌈p·n⌉ — all integer comparisons, windows only over the
    * bounded histogram partitioned by type. One corpus aggregate,
    * one co-keyed histogram join; everything exact.
    */
  def winsorizeReport(events: DataFrame, loPct: Int = 1,
      hiPct: Int = 99): DataFrame = {
    val hist = cents(events)
      .groupBy(col("event_type"), col("v100").as("c"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    val wcum = hist
      .withColumn("cum", sum(col("n")).over(byType.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("n")).over(byType))
    val bounds = wcum.groupBy(col("event_type"))
      .agg(min(when(col("cum") * 100 >= col("tot") * loPct, col("c")))
        .as("p_lo"),
        min(when(col("cum") * 100 >= col("tot") * hiPct, col("c")))
          .as("p_hi"))
    hist.join(bounds, "event_type")
      .groupBy(col("event_type"))
      .agg(min(col("p_lo")).as("p_lo_cents"),
        min(col("p_hi")).as("p_hi_cents"),
        sum(when(col("c") < col("p_lo"), col("n")).otherwise(0L))
          .as("n_clip_low"),
        sum(when(col("c") > col("p_hi"), col("n")).otherwise(0L))
          .as("n_clip_high"),
        sum(col("n") * greatest(least(col("c"), col("p_hi")),
          col("p_lo"))).as("sum_w_cents"))
      .orderBy(col("event_type"))
  }

  def winsorizeReportSql(loPct: Int = 1, hiPct: Int = 99): String =
    s"""WITH hist AS (
       |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS c,
       |         count(*) AS n
       |  FROM events GROUP BY 1, 2
       |), wcum AS (
       |  SELECT event_type, c, n,
       |    sum(n) OVER (PARTITION BY event_type ORDER BY c) AS cum,
       |    sum(n) OVER (PARTITION BY event_type) AS tot
       |  FROM hist
       |), bounds AS (
       |  SELECT event_type,
       |    min(CASE WHEN cum * 100 >= tot * $loPct THEN c END) AS p_lo,
       |    min(CASE WHEN cum * 100 >= tot * $hiPct THEN c END) AS p_hi
       |  FROM wcum GROUP BY 1
       |)
       |SELECT h.event_type,
       |  CAST(min(p_lo) AS BIGINT) AS p_lo_cents,
       |  CAST(min(p_hi) AS BIGINT) AS p_hi_cents,
       |  CAST(sum(CASE WHEN c < p_lo THEN n ELSE 0 END) AS BIGINT)
       |    AS n_clip_low,
       |  CAST(sum(CASE WHEN c > p_hi THEN n ELSE 0 END) AS BIGINT)
       |    AS n_clip_high,
       |  CAST(sum(n * greatest(least(c, p_hi), p_lo)) AS BIGINT)
       |    AS sum_w_cents
       |FROM hist h JOIN bounds USING (event_type)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  def anomaliesSql(z: Double = 3.0): String =
    s"""WITH cents AS (
       |  SELECT event_id, event_type, value,
       |         CAST(round(value * 100, 0) AS BIGINT) AS v100
       |  FROM events
       |), stats AS (
       |  SELECT event_type,
       |         CAST(sum(v100) AS DOUBLE) / count(*) AS mean100,
       |         sqrt((CAST(sum(v100 * v100) AS DOUBLE)
       |               - CAST(sum(v100) AS DOUBLE) * CAST(sum(v100) AS DOUBLE)
       |                 / count(*))
       |              / count(*)) AS sd100
       |  FROM cents GROUP BY event_type
       |  HAVING sqrt((CAST(sum(v100 * v100) AS DOUBLE)
       |               - CAST(sum(v100) AS DOUBLE) * CAST(sum(v100) AS DOUBLE)
       |                 / count(*))
       |              / count(*)) > 0
       |)
       |SELECT event_id, event_type, value,
       |       CAST(round((CAST(v100 AS DOUBLE) - mean100) / sd100 * 10000,
       |                  0) AS BIGINT) AS z4
       |FROM cents JOIN stats USING (event_type)
       |WHERE abs((CAST(v100 AS DOUBLE) - mean100) / sd100) > $z
       |ORDER BY event_id""".stripMargin
}
