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
    val names = Seq("d07_fitted_residuals", "x32_rolling_sum")
    for (name <- names)
      q(name)(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    for (name <- names) {
      val t0 = System.nanoTime()
      q(name)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
