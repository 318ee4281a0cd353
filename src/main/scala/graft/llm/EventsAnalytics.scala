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
