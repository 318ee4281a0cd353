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
    for (name <- Seq("q09_chunk", "q09_chunk", "q09_chunk",
        "d05_ar1_ols", "d05_ar1_ols")) {
      val t0 = System.nanoTime()
      q(name)(spark, sf).write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
