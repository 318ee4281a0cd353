package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.{DocumentsStream, EventsStream}

/** Checkpoint-restart e2e (VERDICT r9 #6): the parity specs prove
  * drain ≡ batch within one process; these kill the query mid-stream
  * and resume from the RocksDB checkpoint, asserting the resumed run
  * emits exactly what an uninterrupted run would have — state
  * recovery for the stateful sessionizer, offset exactness (no
  * replays, no losses) for the stateless fuzzy-ingest twin.
  */
class RestartRecoverySpec extends AnyFunSuite {
  import SparkTestSession._

  spark.conf.set("spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private def ckpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"$tag-ckpt").toString

  test("sessionizer restarted from checkpoint mid-stream emits the " +
      "same sessions as an uninterrupted run") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables.events(spark, sf)
      .select($"user_id", $"ts".cast("double").as("ep"), $"value",
        $"event_id")
      .as[(Long, Double, Double, Long)]
      .collect().sortBy(t => (t._2, t._4))
    val mid = rows(rows.length / 2)._2
    val part1 = rows.filter(_._2 <= mid).toIndexedSeq
    val part2 = rows.filter(_._2 > mid).toIndexedSeq

    def sessStream(
        ms: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
          (Long, Double, Double, Long)]) =
      EventsStream.sessionize(spark,
        ms.toDF.toDF("user_id", "ep", "value", "event_id")
          .withColumn("ts", timestamp_seconds($"ep")),
        gapSec = 1800)

    // reference: uninterrupted two-micro-batch run through the
    // exactly-once FILE sink (the memory sink refuses checkpoint
    // recovery, and the file sink's _spark_metadata commit log is
    // what production restart semantics rest on anyway)
    val outRef = ckpt("sess-ref-out")
    val msRef = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double, Double, Long)]
    val qRef = sessStream(msRef).writeStream.outputMode("append")
      .option("checkpointLocation", ckpt("sess-ref"))
      .format("parquet").option("path", outRef).start()
    val want =
      try {
        msRef.addData(part1); qRef.processAllAvailable()
        msRef.addData(part2); qRef.processAllAvailable()
        spark.read.parquet(outRef).collect()
          .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      } finally qRef.stop()

    // restart run: same checkpoint + sink dir, query KILLED between
    // the batches
    val cp = ckpt("sess-res")
    val outRes = ckpt("sess-res-out")
    val msRes = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double, Double, Long)]
    val q1 = sessStream(msRes).writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("parquet").option("path", outRes).start()
    val pre =
      try {
        msRes.addData(part1); q1.processAllAvailable()
        spark.read.parquet(outRes).collect().length
      } finally q1.stop()
    // resume from the checkpoint: open sessions (e.g. one spanning
    // the split) must come back from RocksDB state, committed offsets
    // must not replay
    val q2 = sessStream(msRes).writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("parquet").option("path", outRes).start()
    val got =
      try {
        msRes.addData(part2); q2.processAllAvailable()
        spark.read.parquet(outRes).collect()
          .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      } finally q2.stop()
    assert(got == want,
      s"restart≠uninterrupted: only-restart=${(got.keySet -- want.keySet).take(3)} " +
        s"only-ref=${(want.keySet -- got.keySet).take(3)}")
    assert(want.nonEmpty)
    assert(got.values.sum > pre, "no sessions emitted after restart")
  }

  test("fuzzy-ingest restarted from checkpoint: every arrival probed " +
      "exactly once, verdicts equal the uninterrupted batch twin") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s0"),
      (2L, "alpha beta gamma delta epsilon zeta", "s0"),
      (9L, "utterly different content entirely here now", "s2"))
      .toDF("doc_id", "text", "source")
    val buckets = graft.llm.Dedup
      .repSignatureBuckets(corpus, maxDist = 3)
    val arrivals = Seq(
      (101L, "alpha beta gamma delta epsilon zeta"),
      (102L, "wholly novel arrival content nothing matches"),
      (103L, "utterly different content entirely here now"),
      (104L, "alpha beta gamma delta epsilon zet"),
      (105L, "another novel arrival with fresh words only"))
    val cp = ckpt("fuzzy-res")
    val out = ckpt("fuzzy-res-out")
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    def probe() = DocumentsStream.fuzzyMatchesOnIngest(
      ms.toDF.toDF("doc_id", "text"), buckets, maxDist = 3)
    val q1 = probe().writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("parquet").option("path", out).start()
    try {
      ms.addData(arrivals.take(3)); q1.processAllAvailable()
    } finally q1.stop()
    val q2 = probe().writeStream.outputMode("append")
      .option("checkpointLocation", cp)
      .format("parquet").option("path", out).start()
    val all =
      try {
        ms.addData(arrivals.drop(3)); q2.processAllAvailable()
        spark.read.parquet(out).collect().map(_.toSeq)
      } finally q2.stop()
    // offset exactness: the committed first batch must not replay
    // after the restart, and nothing may be lost
    val arrDf = arrivals.toDF("doc_id", "text")
    val wantMatches = graft.llm.Dedup
      .fuzzyProbe(arrDf, buckets, maxDist = 3)
      .collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    val gotMatches = all.toSeq
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(gotMatches == wantMatches)
    // shared finisher over the union reproduces the batch verdicts
    val drained = all.toSeq.map(s =>
      (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long],
        s(2).asInstanceOf[Int]))
      .toDF("doc_id", "rep_id", "dist")
    val got = DocumentsStream.fuzzyVerdictsAtDrain(arrDf, drained)
      .collect().map(_.toSeq).toSet
    val want = graft.llm.Dedup.fuzzyVerdicts(arrDf,
      graft.llm.Dedup.fuzzyProbe(arrDf, buckets, maxDist = 3))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(want.exists(_(1) == false) && want.exists(_(1) == true))
  }
}
