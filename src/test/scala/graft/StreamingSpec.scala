package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  // Every stateful query in this suite runs on the RocksDB state
  // store — the provider a production deployment uses (state spills
  // to local disk instead of growing the JVM heap), so the
  // bounded-state claims below are validated against the real store.
  spark.conf.set("spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** FileStreamSource needs a directory; stage the single parquet
    * file into one.
    */
  lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf + "/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling agg over events matches the batch twin") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    assert(stream.isStreaming)
    val agg = EventsStream.tumblingHourly(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT count(*), sum(n) FROM tumbling_out").collect()(0)
      val batch = graft.llm.EventsAnalytics
        .tumblingHourly(Tables.events(spark, sf))
      assert(got.getLong(0) == batch.count())
      assert(got.getLong(1) == 1000L) // every event in exactly one window
    } finally q.stop()
  }

  test("streaming sliding agg matches the batch twin") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val agg = EventsStream.slidingWindows(stream, 7200, 1800)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT count(*), sum(n) FROM sliding_out").collect()(0)
      val batch = graft.llm.EventsAnalytics
        .slidingWindows(Tables.events(spark, sf), 7200, 1800)
      assert(got.getLong(0) == batch.count())
      assert(got.getLong(1) == 4000L) // every event in exactly 4 windows
    } finally q.stop()
  }

  test("stream-static enrichment join stays broadcast, no stream shuffle") {
    import org.apache.spark.sql.functions._
    val dim = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(col("value")).as("lifetime_value"))
    val stream = EventsStream.readEvents(spark, eventsDir)
    val joined = EventsStream.enrich(stream, dim, "user_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT count(*), count(lifetime_value) FROM enrich_out").collect()(0)
      assert(got.getLong(0) == 1000L)
      assert(got.getLong(1) == 1000L) // every event's user has a dim row
    } finally q.stop()
  }

  test("streaming watermarked dedup emits each event id once") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val deduped = EventsStream.dedupEvents(stream)
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT count(*), count(DISTINCT event_id) FROM dedup_out")
        .collect()(0)
      assert(got.getLong(0) == got.getLong(1))
      assert(got.getLong(0) == 1000L)
    } finally q.stop()
  }

  test("stateful sessionizer emits closed sessions") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val sess = EventsStream.sessionize(spark, stream, gapSec = 1800)
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM sessions_out")
        .collect()(0).getLong(0)
      val batchSessions = graft.llm.EventsAnalytics
        .sessions(Tables.events(spark, sf), 1800).count()
      val users = Tables.events(spark, sf)
        .select("user_id").distinct().count()
      // gap-closed sessions all emit; event-time timeouts additionally
      // close final sessions older than the watermark, so the count
      // lands between (all minus one open per user) and all
      assert(n >= batchSessions - users, s"emitted $n of $batchSessions")
      assert(n <= batchSessions, s"emitted $n of $batchSessions")
      // at least some final sessions must have timed out and emitted
      assert(n > batchSessions - users, s"no timeouts fired (n=$n)")
    } finally q.stop()
  }

  test("stream-stream range join matches the batch twin") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val joined = EventsStream.viewPurchaseJoin(stream, rangeSec = 3600)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT count(*) FROM ssjoin_out")
        .collect()(0).getLong(0)
      // batch twin: identical predicate on the static frame
      import org.apache.spark.sql.functions._
      val ev = Tables.events(spark, sf)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("value").as("p_val"))
      val want = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 3600 SECONDS"))
        .count()
      assert(got == want, s"stream $got vs batch $want")
      assert(want > 0)
    } finally q.stop()
  }

  test("stream-stream join state stays bounded over a 10x-longer feed") {
    import org.apache.spark.sql.functions._
    // Ten month-shifted copies of the 30-day feed, one file each ->
    // ten micro-batches in event-time order. The 2h watermark + 1h
    // join range must evict each month's state before the next lands,
    // so the RocksDB state footprint stays ~one copy no matter how
    // long the feed runs. Month shifts >> the 1h range also mean the
    // join output is exactly 10x the single-copy result.
    val dir = java.nio.file.Files.createTempDirectory("events-10x")
    // read through the normalized accessor (handles both ts encodings)
    // and stage month-shifted copies with ts as plain TIMESTAMP
    val raw = graft.Tables.events(spark, sf)
    (0 until 10).foreach { k =>
      val tmp = dir.resolve(s"stage$k")
      raw.select(
        (col("event_id") + lit(k * 10_000_000L)).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${k * 31} DAYS")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get()
      val dst = dir.resolve(f"day$k%02d.parquet")
      java.nio.file.Files.move(part, dst)
      // FileStreamSource orders batches by mtime; the stage writes all
      // land in the same instant, so pin strictly increasing stamps or
      // days replay out of order and fall behind the watermark
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1_000_000_000_000L + k * 60_000L))
    }
    val stagedSchema = org.apache.spark.sql.types.StructType(
      EventsStream.rawSchema.map(f =>
        if (f.name == "ts")
          f.copy(dataType = org.apache.spark.sql.types.TimestampType)
        else f))
    val stream = spark.readStream
      .schema(stagedSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val joined = EventsStream.viewPurchaseJoin(stream, rangeSec = 3600)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin10_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT count(*) FROM ssjoin10_out")
        .collect()(0).getLong(0)
      // per-batch state-store rows from the progress metrics
      val stateRows = q.recentProgress.toSeq
        .filter(_.stateOperators.nonEmpty)
        .map(p => p.stateOperators.map(_.numRowsTotal).sum)
      val ev = Tables.events(spark, sf)
      val perCopy = ev.filter(col("event_type").isin("view", "purchase"))
        .count()
      val want1 = {
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        views.join(purchases,
          col("v_user") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") <= col("v_ts") + expr("INTERVAL 3600 SECONDS"))
          .count()
      }
      assert(got == 10 * want1, s"stream $got vs 10x batch ${10 * want1}")
      // the load-bearing claim: after 10 copies of feed, live join
      // state never exceeds ~a copy of view/purchase rows (the
      // watermark evicts the rest between batches); without eviction
      // it would reach 10 * perCopy
      assert(stateRows.nonEmpty)
      assert(stateRows.max <= 2 * perCopy,
        s"state grew to ${stateRows.max} rows (copy=$perCopy) — not bounded")
      assert(stateRows.last <= 2 * perCopy,
        s"final state ${stateRows.last} rows (copy=$perCopy) — not evicted")
    } finally q.stop()
  }

  test("running anomaly moments drain to batch moments; scoring " +
    "against them matches x63") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val q = EventsStream.anomalyMomentsRunning(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("anom_moments").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT event_type, n, s, ss FROM anom_moments")
      val ev = Tables.events(spark, sf)
      def asMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // pure integer sums: drained state equals the batch moment table
      val batchMoments =
        asMap(graft.llm.EventsAnalytics.anomalyMoments(ev).collect())
      assert(asMap(drained.collect()) == batchMoments)
      // frozen stats dim + stateless scorer reproduce batch x63 exactly
      val stats = graft.llm.EventsAnalytics.anomalyStatsFromMoments(drained)
      val fromStream = EventsStream.scoreAnomaliesAgainst(ev, stats, 3.0)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      val batch = graft.llm.EventsAnalytics.anomalies(ev, 3.0)
        .collect().map(_.toSeq).toSeq
      assert(fromStream == batch)
    } finally q.stop()
  }

  test("running join-key sketch drains bit-equal to batch; drain " +
    "finisher against the frozen dimension sketch reproduces x152") {
    val depth = 4; val width = 64
    val stream = EventsStream.readEvents(spark, eventsDir)
    val q = EventsStream.joinKeySketchRunning(stream, depth, width)
      .writeStream.outputMode("complete")
      .format("memory").queryName("jk_sketch").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT sk FROM jk_sketch")
      import org.apache.spark.sql.functions.col
      val a = Tables.events(spark, sf)
        .select(col("user_id").cast("string").as("k"))
      val b = Tables.orders(spark, sf)
        .select(col("o_custkey").cast("string").as("k"))
      // elementwise-sum merges: the drained grid equals the batch one
      val batchSk = graft.llm.HeavyHitters.keySketch(a, depth, width)
        .collect()(0).getSeq[Long](0)
      assert(drained.collect()(0).getSeq[Long](0) == batchSk)
      // shared finisher against the frozen orders-side sketch
      // reproduces the batch x152 report bit-for-bit
      val fromStream = EventsStream
        .joinSizeAtDrain(drained, a, b, depth, width)
        .collect().map(_.toSeq).toSeq
      val batch = graft.llm.HeavyHitters
        .joinSizeEstimate(a, b, depth, width)
        .collect().map(_.toSeq).toSeq
      assert(fromStream == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateful funnel progress: drained steps equal batch " +
      "funnelSteps; shared report finisher reproduces x91") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val steps = EventsStream.funnelProgress(spark, stream)
    val q = steps.toDF.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT user_id, step_idx, t FROM funnel_out")
      val ev = Tables.events(spark, sf)
      val got = drained.collect().map(_.toSeq).toSet
      val batch = graft.llm.EventsAnalytics.funnelSteps(ev)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(got == batch,
        s"drained≠batch: only-drained=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
      // shared finisher over the drained table == the declared x91
      import org.apache.spark.sql.functions.col
      val report = graft.llm.EventsAnalytics
        .funnelReport(drained, ev.select(col("user_id")).distinct())
        .collect().map(_.toSeq).toSeq
      val x91 = graft.llm.EventsAnalytics.funnel(ev)
        .collect().map(_.toSeq).toSeq
      assert(report == x91)
    } finally q.stop()
  }

  test("funnel progress holds state across micro-batches: a " +
      "time-split two-batch replay emits the same steps") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"event_type",
        $"ts".cast("double").as("ep"), $"event_id")
      .as[(Long, String, Double, Long)]
      .collect().sortBy(t => (t._3, t._4))
    val mid = rows(rows.length / 2)._3
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String, Double, Long)]
    val events = ms.toDF
      .toDF("user_id", "event_type", "ep", "event_id")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds($"ep"))
    val q = EventsStream.funnelProgress(spark, events).toDF
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_2b_out").start()
    try {
      ms.addData(rows.filter(_._3 <= mid).toIndexedSeq)
      q.processAllAvailable()
      ms.addData(rows.filter(_._3 > mid).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, step_idx, t FROM funnel_2b_out")
        .collect().map(_.toSeq).toSet
      val batch = graft.llm.EventsAnalytics
        .funnelSteps(Tables.events(spark, sf))
        .collect().map(_.toSeq).toSet
      assert(got == batch,
        s"two-batch≠batch: only-stream=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("activity pairs on ingest + shared drain finisher reproduce " +
      "the batch retention matrix") {
    val stream = EventsStream.readEvents(spark, eventsDir)
    val q = EventsStream.activityPairsOnIngest(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("retention_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT user_id, d FROM retention_out")
      val got = EventsStream.retentionAtDrain(drained)
        .collect().map(_.toSeq).toSet
      val batch = graft.llm.EventsAnalytics
        .retentionCohorts(Tables.events(spark, sf))
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(got == batch)
    } finally q.stop()
  }

  test("stateful transitions on ingest: drained pairs + shared " +
      "finisher reproduce x93 across micro-batches") {
    // full replay
    val stream = EventsStream.readEvents(spark, eventsDir)
    val q = EventsStream.transitionsOnIngest(spark, stream).toDF
      .writeStream.outputMode("append")
      .format("memory").queryName("paths_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT src, dst FROM paths_out")
      val got = EventsStream.transitionsAtDrain(drained)
        .collect().map(_.toSeq).toSeq
      val batch = graft.llm.EventsAnalytics
        .sessionTransitions(Tables.events(spark, sf))
        .collect().map(_.toSeq).toSeq
      assert(batch.nonEmpty)
      assert(got == batch)
    } finally q.stop()
    // two-batch time-split replay: last-event state must carry over
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"event_type",
        $"ts".cast("double").as("ep"), $"event_id")
      .as[(Long, String, Double, Long)]
      .collect().sortBy(t => (t._3, t._4))
    val mid = rows(rows.length / 2)._3
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, String, Double, Long)]
    val events = ms.toDF
      .toDF("user_id", "event_type", "ep", "event_id")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds($"ep"))
    val q2 = EventsStream.transitionsOnIngest(spark, events).toDF
      .writeStream.outputMode("append")
      .format("memory").queryName("paths_2b_out").start()
    try {
      ms.addData(rows.filter(_._3 <= mid).toIndexedSeq)
      q2.processAllAvailable()
      ms.addData(rows.filter(_._3 > mid).toIndexedSeq)
      q2.processAllAvailable()
      val got2 = EventsStream.transitionsAtDrain(
        spark.sql("SELECT src, dst FROM paths_2b_out"))
        .collect().map(_.toSeq).toSeq
      val batch2 = graft.llm.EventsAnalytics
        .sessionTransitions(Tables.events(spark, sf))
        .collect().map(_.toSeq).toSeq
      assert(got2 == batch2)
    } finally q2.stop()
  }
}
