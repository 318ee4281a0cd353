package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Darima, DarimaConfig}
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val series = graft.Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("ts").cast("double").as("time"), col("value"))
    val cfg = DarimaConfig(numChunks = 4, freq = 24, tol = 24,
      maxP = 3, maxQ = 2, fitter = "arma")
    val (model, fc) = Darima.run(spark, series, h = 24, cfg)
    println(s"arma pipeline: p=${model.p} sigma2=${model.sigma2} fc0=${fc.mean(0)}")
    // degenerate probe: constant series through the arma fitter
    import spark.implicits._
    val const = spark.range(500).select(col("id").cast("double").as("time"),
      lit(5.0).as("value"))
    val (m2, fc2) = Darima.run(spark, const, h = 5, cfg)
    println(s"constant series: sigma2=${m2.sigma2} forecasts=${fc2.mean.mkString(",")}")
    spark.stop()
  }
}
