package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ts.OrderedLag

class OrderedLagSpec extends AnyFunSuite {
  import SparkTestSession._

  test("distributed lag equals global-window lag on the events series") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    val global = ev
      .withColumn("value_lag1",
        lag(col("value"), 1).over(Window.orderBy(col("ts"), col("event_id"))))
      .withColumn("value_lag24",
        lag(col("value"), 24).over(Window.orderBy(col("ts"), col("event_id"))))
      .select(col("event_id"), col("value_lag1"), col("value_lag24"))
    val dist = OrderedLag.withLags(ev, col("ts"), col("event_id"),
      "value", Seq(1, 24), buckets = 8)
      .select(col("event_id"), col("value_lag1"), col("value_lag24"))
    val g = global.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap
    val d = dist.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(g.size == d.size)
    g.foreach { case (k, v) => assert(d(k) == v, s"event $k: ${d(k)} vs $v") }
  }

  test("no single-partition exchange in the distributed-lag plan") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("value"))
    val plan = OrderedLag.withLags(ev, col("ts"), col("event_id"),
      "value", Seq(1), buckets = 8)
      .queryExecution.executedPlan.toString
    // the only SinglePartition allowed is the 1-row quantile agg done
    // before planning; the lag path itself must partition by bucket
    assert(!plan.contains("SinglePartition"), plan.linesIterator
      .filter(_.contains("SinglePartition")).mkString("\n"))
  }
}
