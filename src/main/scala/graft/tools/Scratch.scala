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
    // drop experiments here; run with tools/spark-run.sh graft.tools.Scratch
    val sf = "/root/testdata/sf0.001"
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val q = graft.SparkEntry.queries
    // warm
    q("x09_text_tokens")(spark, sf).write.format("noop").mode("overwrite").save()
    for (n <- Seq("x10_text_fingerprint", "x01_dedup_exact", "x10_text_fingerprint"))
      time(n)(q(n)(spark, sf).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
