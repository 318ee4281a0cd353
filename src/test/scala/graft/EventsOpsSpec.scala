package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.EventsAnalytics

/** Semantic checks for the round-9 event analytics: ordered funnel,
  * cohort retention, and within-session transition paths.
  */
class EventsOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ev(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "ep")
      .withColumn("ts", timestamp_seconds(col("ep")))
      .withColumn("value", lit(1.0))
      .drop("ep")
  }

  test("diurnal profile: hour-of-day fold with exact cents and " +
    "per-type traffic shares") {
    import spark.implicits._
    // type A: 2 events at 01:xx (1.00 + 2.00) and 1 at 02:xx (0.50)
    // over two different DAYS (folded onto the same clock); type B:
    // 1 event at 05:xx (1.25)
    val events = Seq(
      (1L, 1L, "A", 1L * 3600 + 60, 1.0),
      (2L, 1L, "A", 86400L + 1L * 3600 + 120, 2.0),
      (3L, 2L, "A", 2L * 3600, 0.5),
      (4L, 3L, "B", 5L * 3600, 1.25))
      .toDF("event_id", "user_id", "event_type", "ep", "value")
      .withColumn("ts", timestamp_seconds(col("ep"))).drop("ep")
    val rows = EventsAnalytics.diurnalProfile(events).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("hr")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("share_bp"))))
      .toMap
    assert(rows == Map(
      ("A", 1) -> ((2L, 300L, 6666L)),
      ("A", 2) -> ((1L, 50L, 3333L)),
      ("B", 5) -> ((1L, 125L, 10000L))),
      s"got: $rows")
  }

  test("funnel: steps must occur in order — a click before the first " +
    "view does not convert") {
    // user 1: view -> click -> purchase (full funnel)
    // user 2: click at t=0, view at t=10, no later click -> view only
    // user 3: view and click at the SAME second -> strict > excludes it
    val events = ev(Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "click", 110L),
      (3L, 1L, "purchase", 120L),
      (4L, 2L, "click", 0L), (5L, 2L, "view", 10L),
      (6L, 3L, "view", 50L), (7L, 3L, "click", 50L)))
    val out = EventsAnalytics.funnel(events).collect()
      .map(r => r.getAs[Int]("step_idx") ->
        (r.getAs[Long]("users"), r.getAs[Long]("conv_bp"))).toMap
    assert(out(1) == ((3L, 10000L))) // all 3 users viewed
    assert(out(2) == ((1L, 3333L)))  // only user 1 clicked after viewing
    assert(out(3) == ((1L, 10000L)))
  }

  test("funnel: a step arriving after gapSec of the previous step " +
    "does not convert") {
    val events = ev(Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 700000L))) // > 604800
    val out = EventsAnalytics.funnel(events).collect()
      .map(r => r.getAs[Int]("step_idx") -> r.getAs[Long]("users")).toMap
    assert(out(1) == 1L && out(2) == 0L)
  }

  test("funnel: empty input yields 3 rows with null conversions") {
    val events = ev(Seq.empty)
    val out = EventsAnalytics.funnel(events).collect()
    assert(out.length == 3)
    assert(out.forall(r => r.getAs[Long]("users") == 0L &&
      r.isNullAt(r.fieldIndex("conv_bp"))))
  }

  test("retention: cohort is the first event date; ret_bp is exact " +
    "basis points of the cohort size") {
    // users 1,2 first seen day 0; user 1 returns day 1; user 3 first
    // seen day 1 (its own cohort)
    val day = 86400L
    val events = ev(Seq(
      (1L, 1L, "view", 0L), (2L, 2L, "view", 100L),
      (3L, 1L, "click", day + 50L),
      (4L, 3L, "view", day + 60L)))
    val out = EventsAnalytics.retentionCohorts(events).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort").toString,
        r.getAs[Int]("day_off")) ->
        (r.getAs[Long]("active"), r.getAs[Long]("ret_bp"))).toMap
    assert(out(("1970-01-01", 0)) == ((2L, 10000L)))
    assert(out(("1970-01-01", 1)) == ((1L, 5000L)))
    assert(out(("1970-01-02", 0)) == ((1L, 10000L)))
    assert(out.size == 3)
  }

  test("first-touch attribution: purchases credit their session's " +
    "first event type; sessions split at the gap") {
    import spark.implicits._
    // user 1, session A: view -> click -> purchase (credit: view);
    // user 1, session B (after the gap): lone purchase (credits
    // itself); user 2: click -> purchase (credit: click)
    val events = Seq(
      (1L, 1L, "view", 0L, 0.0), (2L, 1L, "click", 10L, 0.0),
      (3L, 1L, "purchase", 20L, 12.34),
      (4L, 1L, "purchase", 10000L, 5.0),
      (5L, 2L, "click", 0L, 0.0), (6L, 2L, "purchase", 30L, 7.005))
      .toDF("event_id", "user_id", "event_type", "ep", "value")
      .withColumn("ts", timestamp_seconds(col("ep"))).drop("ep")
    val out = EventsAnalytics.firstTouchAttribution(events,
      gapSec = 1800).collect()
      .map(r => r.getAs[String]("first_touch") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_c"),
          r.getAs[Long]("n_users"))).toMap
    assert(out("view") == ((1L, 1234L, 1L)))
    assert(out("purchase") == ((1L, 500L, 1L)))
    // floor(7.005 * 100) exercises the exact-cents contract: 700,
    // not a half-up 701 (the double is just under 700.5)
    assert(out("click") == ((1L, 700L, 1L)))
    assert(out.size == 3)
  }

  test("session transitions: cross-session gaps break the chain; " +
    "p_bp row-normalizes per source type") {
    // user 1: view->click within gap, then a >gap pause, then
    // view->purchase — the click->view crossing must NOT count
    val events = ev(Seq(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 10L),
      (3L, 1L, "view", 5000L), (4L, 1L, "purchase", 5010L)))
    val out = EventsAnalytics.sessionTransitions(events, gapSec = 1800)
      .collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("p_bp"))).toMap
    assert(out(("view", "click")) == ((1L, 5000L)))
    assert(out(("view", "purchase")) == ((1L, 5000L)))
    assert(out.size == 2)
  }
}
