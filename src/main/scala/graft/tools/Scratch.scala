package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    val q = graft.SparkEntry.queries
    for (name <- Seq("q01_scan_filter_project", "q04_filter_prefix",
        "x21_sample_hash")) {
      val plan = q(name)(spark, sf).queryExecution.executedPlan.toString
      val scans = plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim.take(160))
      println(s"== $name"); scans.foreach(println)
    }
    spark.stop()
  }
}
