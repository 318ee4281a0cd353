package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events schema — the
  * streaming twins of graft.llm.EventsAnalytics (tumbling windows)
  * plus a stateful sessionizer on `flatMapGroupsWithState`. The
  * reference is fully batch (SURVEY.md §2.8); these extend the
  * engine to the readStream → transform → writeStream surface with
  * watermarked event-time state, which is what a 100 TB/day event
  * feed actually needs.
  */
object EventsStream {

  /** Events schema for streaming reads. `ts` has shipped as both raw
    * nanosecond longs (parquet TIMESTAMP(NANOS) under the legacy
    * nanosAsLong knob — same caveat as the batch path, graft.Tables)
    * and plain TIMESTAMP(MICROS) NTZ; [[readEvents]] probes the
    * directory with a one-off batch read to declare the right one.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FileStreamSource needs the schema up front; probe the staged
    // files once (batch) to learn which ts encoding this dir carries.
    // A failed probe (empty / not-yet-populated dir) must NOT fall
    // back silently: declaring LongType against later micros-encoded
    // files fails at runtime with an opaque parquet conversion error.
    val tsType = scala.util.Try(
      spark.read.parquet(dir).schema("ts").dataType).getOrElse(
      throw new IllegalStateException(
        s"cannot probe events ts encoding from '$dir' (empty or " +
          "unreadable) — stage at least one parquet file first"))
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = spark.readStream.schema(schema).parquet(dir)
    tsType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Watermarked tumbling-window aggregation (append mode capable). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("hr"), col("event_type"), col("n"),
        col("total"))

  /** Running per-type anomaly moments — the streaming half of
    * EventsAnalytics.anomalies (x63): the SAME exact integer-cent
    * (n, Σv, Σv²) aggregation, run UPDATE/COMPLETE-mode. State is one
    * row per event type (a dimension, bounded by the type list), and
    * pure integer sums drain to exactly the batch moment table;
    * [[scoreAnomaliesAgainst]] then serves per-arrival scoring
    * against the frozen stats dim with the batch formulas.
    */
  def anomalyMomentsRunning(events: DataFrame): DataFrame =
    graft.llm.EventsAnalytics.anomalyMoments(events)

  /** Running join-key Count–Min grid — the streaming half of x152
    * and the estimator's actual production shape: the FACT side of a
    * join arrives as a stream, the dimension side's sketch is frozen
    * (built batch-side, possibly on another cluster, possibly last
    * week), and the join is priced CONTINUOUSLY without ever running
    * it. The SAME global cm_sketch aggregation as the batch side
    * (HeavyHitters.keySketch), COMPLETE-mode; state is the one
    * depth×width long grid, and elementwise-sum merges make the
    * drained grid bit-equal to the batch sketch over the same feed.
    */
  def joinKeySketchRunning(events: DataFrame, depth: Int,
      width: Int): DataFrame =
    graft.llm.HeavyHitters.keySketch(
      events.select(col("user_id").cast("string").as("k")), depth, width)

  /** Drain-time finisher: the x152 report from a drained fact-side
    * sketch against the frozen dimension side — per-row inner
    * products through the SAME `joinSizeFromCells` code path as the
    * batch query; the exact verify pass recomputes from the batch
    * frames (exactness over an unbounded stream is precisely what
    * the sketch replaces).
    */
  def joinSizeAtDrain(drainedSketch: DataFrame, batchA: DataFrame,
      b: DataFrame, depth: Int, width: Int): DataFrame =
    graft.llm.HeavyHitters.joinSizeFromCells(
      graft.llm.HeavyHitters.keySketchCells(drainedSketch),
      graft.llm.HeavyHitters.keySketchCells(
        graft.llm.HeavyHitters.keySketch(b, depth, width)),
      width,
      batchA.join(b, "k").agg(count(lit(1)).as("exact")))

  /** Stateless scoring of a feed against a FIXED stats dim (built by
    * [[graft.llm.EventsAnalytics.anomalyStatsFromMoments]] from
    * drained moments) — per-row math identical to batch x63.
    */
  def scoreAnomaliesAgainst(events: DataFrame, stats: DataFrame,
      z: Double): DataFrame =
    graft.llm.EventsAnalytics.scoreAnomalies(events, stats, z)

  /** Watermarked sliding-window aggregation — the streaming twin of
    * EventsAnalytics.slidingWindows (each event contributes to
    * window/slide overlapping windows; state per open window is one
    * partial aggregate, retired by the watermark).
    */
  def slidingWindows(events: DataFrame, windowSec: Int,
      slideSec: Int): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), s"$windowSec seconds",
        s"$slideSec seconds").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("ws"), col("n"), col("total"))

  /** Streaming exact dedup: watermarked `dropDuplicates` on the
    * event id — the streaming twin of Dedup.exactGroups' key-group
    * shape. The watermark bounds the dedup state: ids older than the
    * horizon are dropped from state, which is what makes exact dedup
    * feasible on an unbounded feed.
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the static side (a dimension
    * table, e.g. per-user aggregates) is broadcast to every
    * micro-batch — no stream-side state, no shuffle of the stream.
    * The standard shape for joining a 100 TB/day feed against a
    * small dimension.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stateless activity pairs on ingest — the stream half of x92
    * (EventsAnalytics.retentionCohorts): each arrival projects to its
    * (user_id, activity date) pair, map-only. The drain finisher is
    * the SHARED batch tail (retentionFromPairs — min first-date,
    * distinct-count matrix), which tolerates the per-event duplicate
    * pairs by construction, so the drained retention matrix EQUALS
    * batch x92 row-for-row.
    */
  def activityPairsOnIngest(events: DataFrame): DataFrame =
    events.select(col("user_id"), to_date(col("ts")).as("d"))

  def retentionAtDrain(drained: DataFrame): DataFrame =
    graft.llm.EventsAnalytics.retentionFromPairs(drained)

  final case class FunnelState(t1: Option[Double], t2: Option[Double],
      t3: Option[Double])
  final case class FunnelStepOut(user_id: Long, step_idx: Int, t: Double)

  /** Stateful funnel-progress tracking — the stream half of x91
    * (EventsAnalytics.funnel): per-user state is the three earliest
    * qualifying step times (three optional doubles — BOUNDED state,
    * |users|·24 bytes, never grows with event volume), and a row is
    * emitted the moment a user first completes a step. Within a
    * micro-batch events sort by (event time, event_id); across
    * batches the feed is assumed per-user event-time ordered (the
    * post-watermark contract a funnel tracker runs behind) — under
    * that order the greedy "first qualifying event wins" rule is
    * EXACTLY the batch min-aggregation semantics, so the drained
    * step table equals EventsAnalytics.funnelSteps row-for-row and
    * the shared funnelReport finisher reproduces x91 at drain.
    */
  def funnelProgress(spark: SparkSession, events: DataFrame,
      gapSec: Long = 604800L): Dataset[FunnelStepOut] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_type"),
        col("ts").cast("double").as("ep"), col("event_id"))
      .as[(Long, String, Double, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelStepOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, String, Double, Long)],
            state: GroupState[FunnelState]) =>
          val evs = it.toArray.sortBy(t => (t._3, t._4))
          var s = state.getOption.getOrElse(FunnelState(None, None, None))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[FunnelStepOut]
          evs.foreach { case (_, et, ep, _) =>
            et match {
              case "view" if s.t1.isEmpty =>
                s = s.copy(t1 = Some(ep))
                out += FunnelStepOut(uid, 1, ep)
              case "click" if s.t1.nonEmpty && s.t2.isEmpty &&
                  ep > s.t1.get && ep <= s.t1.get + gapSec =>
                s = s.copy(t2 = Some(ep))
                out += FunnelStepOut(uid, 2, ep)
              case "purchase" if s.t2.nonEmpty && s.t3.isEmpty &&
                  ep > s.t2.get && ep <= s.t2.get + gapSec =>
                s = s.copy(t3 = Some(ep))
                out += FunnelStepOut(uid, 3, ep)
              case _ =>
            }
          }
          state.update(s)
          out.iterator
      }
  }

  final case class PathState(ep: Double, et: String)
  final case class TransitionOut(src: String, dst: String)

  /** Stateful session-path tracking — the stream half of x93
    * (EventsAnalytics.sessionTransitions): per-user state is the LAST
    * event's (time, type) — one tiny row per user, bounded — and each
    * arrival within `gapSec` of it emits its (src, dst) transition.
    * Within a micro-batch events sort by (time, event_id); across
    * batches the feed is assumed per-user event-time ordered (the
    * same post-watermark contract as funnelProgress), under which the
    * emitted multiset EQUALS the batch lag-window relation
    * (transitionPairs) and the shared transitionsFromPairs finisher
    * reproduces x93 at drain.
    */
  def transitionsOnIngest(spark: SparkSession, events: DataFrame,
      gapSec: Int = 1800): Dataset[TransitionOut] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("event_type"),
        col("ts").cast("double").as("ep"), col("event_id"))
      .as[(Long, String, Double, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[PathState, TransitionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[(Long, String, Double, Long)],
            state: GroupState[PathState]) =>
          val evs = it.toArray.sortBy(t => (t._3, t._4))
          var prev = state.getOption
          val out = scala.collection.mutable.ArrayBuffer
            .empty[TransitionOut]
          evs.foreach { case (_, et, ep, _) =>
            prev.foreach { p =>
              if (ep - p.ep <= gapSec) out += TransitionOut(p.et, et)
            }
            prev = Some(PathState(ep, et))
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  def transitionsAtDrain(drained: DataFrame): DataFrame =
    graft.llm.EventsAnalytics.transitionsFromPairs(drained)

  final case class SessionEvent(user_id: Long, ep: Double, value: Double)
  final case class SessionState(start: Double, last: Double, n: Long,
      total: Double)
  final case class SessionOut(user_id: Long, n_events: Long,
      dur_sec: Double, total: Double)

  /** Stream-stream inner join with an event-time range condition:
    * each view pairs with the same user's purchases in the following
    * `rangeSec` seconds (attribution join). Watermarks on BOTH sides
    * plus the time bound are what let Spark expire join state — the
    * only stream-stream join shape whose state stays bounded on an
    * unbounded feed. Batch twin: the same join predicate on the
    * static frame (StreamingSpec proves parity).
    */
  def viewPurchaseJoin(events: DataFrame, rangeSec: Int): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_val"))
      .withWatermark("p_ts", "2 hours")
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $rangeSec SECONDS"))
      .select(col("view_id"), col("v_user"), col("p_ts"), col("p_val"))
  }

  /** Stateful sessionization: per-user state closed either by a
    * larger-gap event or by an event-time timeout once the watermark
    * passes last+gap — so quiet users' final sessions ARE emitted and
    * their state is freed (unbounded per-user state would be an OOM
    * on a real feed). Batch twin: graft.llm.EventsAnalytics.sessions.
    */
  def sessionize(spark: SparkSession, events: DataFrame, gapSec: Int)
      : Dataset[SessionOut] = {
    import spark.implicits._
    // keep the watermarked ts column all the way into the stateful op:
    // dropping it would detach the watermark EventTimeTimeout needs
    val typed = events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts").cast("double").as("ep"),
        col("value"), col("ts"))
      .as[(Long, Double, Double, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, tuples: Iterator[(Long, Double, Double, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          val it = tuples.map(t => SessionEvent(t._1, t._2, t._3))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.n, s.last - s.start, s.total))
          } else {
            // events within a micro-batch arrive unordered: sort by time
            val evs = it.toArray.sortBy(_.ep)
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            evs.foreach { e =>
              cur match {
                case Some(s) if e.ep - s.last <= gapSec =>
                  cur = Some(SessionState(s.start, e.ep, s.n + 1,
                    s.total + e.value))
                case Some(s) =>
                  out += SessionOut(userId, s.n, s.last - s.start, s.total)
                  cur = Some(SessionState(e.ep, e.ep, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ep, e.ep, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once event time passes last+gap
              state.setTimeoutTimestamp((s.last * 1000).toLong + gapSec * 1000L)
            }
            out.iterator
          }
      }
  }
}
