package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing demo: two tables bucketed+sorted on the join key join
  * with ZERO shuffle exchanges — the co-located-join layout that a
  * 100 TB warehouse uses to amortize one write-time shuffle across
  * every downstream join/aggregate on that key.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("co-bucketed sorted tables join with no shuffle exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed")
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
    ev.write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .option("path", s"$tmp/ev_a").saveAsTable("ev_a")
    ev.groupBy(col("user_id")).agg(sum(col("value")).as("total"))
      .write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .option("path", s"$tmp/ev_b").saveAsTable("ev_b")
    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_a")
        .join(spark.table("ev_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.linesIterator
        .filter(_.contains("Exchange")).mkString("\n"))
      // and the result is still right
      val n = joined.count()
      assert(n == Tables.events(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_a")
      spark.sql("DROP TABLE IF EXISTS ev_b")
    }
  }
}
