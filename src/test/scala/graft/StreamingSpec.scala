package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

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
}
