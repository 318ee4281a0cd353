package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val q = graft.SparkEntry.queries
    def time(name: String, label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    q("q12_metrics")(spark, sf).write.format("noop").mode("overwrite").save()
    time("q12", "q12 full")(q("q12_metrics")(spark, sf))
    // lag stage only
    val ev = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("value"))
    time("lag", "ordered-lag only")(
      graft.ts.OrderedLag.withLags(ev,
        org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"),
        "value", Seq(1, 24)))
    spark.stop()
  }
}
