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
    graft.SparkEntry.entry(spark).show(5)
    spark.stop()
  }
}
