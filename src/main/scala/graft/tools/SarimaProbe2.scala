package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.{Darima, DarimaConfig}
import graft.eval.Metrics

/** Diagnostic: forecast-shape comparison on NEMASSBOST — sarima
  * (stationary cap + harmonics) vs the shipped longar default. Prints
  * horizon-sliced MASE and the daily amplitude of each forecast.
  */
object SarimaProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/reference/data"
    val train = Darima.loadSeriesCsv(spark, s"$dir/NEMASSBOST_train.csv")
    val test = Darima.loadSeriesCsv(spark, s"$dir/NEMASSBOST_test.csv")
      .orderBy("time").select("value").collect().map(_.getDouble(0))
    val h = test.length
    val scale = Darima.seasonalNaiveScaleDF(train, 24)
    def report(tag: String, cfg: DarimaConfig): Unit = {
      val (_, fc) = Darima.run(spark, train, h, cfg)
      val mase = Metrics.mean(Metrics.maseScaled(test, fc.mean, scale))
      // horizon slices: day 1, week 1, rest
      def sliceMase(a: Int, b: Int): Double =
        Metrics.mean(Metrics.maseScaled(test.slice(a, b),
          fc.mean.slice(a, b), scale))
      // daily amplitude of the forecast tail (last week)
      val tail = fc.mean.takeRight(168)
      val amp = tail.max - tail.min
      val actualAmp = test.takeRight(168).max - test.takeRight(168).min
      println(f"$tag: MASE=$mase%.3f d1=${sliceMase(0, 24)}%.3f " +
        f"w1=${sliceMase(0, 168)}%.3f rest=${sliceMase(168, h)}%.3f " +
        f"tailAmp=$amp%.0f (actual $actualAmp%.0f) " +
        f"fcMean=${fc.mean.sum / h}%.0f " +
        f"(actual ${test.sum / h}%.0f)")
    }
    report("sarima+capD0      ", DarimaConfig(fitter = "sarima"))
    report("sarima+capD0+harm ", DarimaConfig(fitter = "sarima",
      harmDaily = 3, harmWeekly = 2))
    report("sarima+harm+anchY ", DarimaConfig(fitter = "sarima",
      harmDaily = 3, harmWeekly = 2, anchorWindow = 8766))
    report("sarima+harm+anchM ", DarimaConfig(fitter = "sarima",
      harmDaily = 3, harmWeekly = 2, anchorWindow = 672))
    report("sarima+harmY+anchY", DarimaConfig(fitter = "sarima",
      harmDaily = 3, harmWeekly = 2, harmYearly = 3,
      anchorWindow = 8766))
    report("longar default    ", DarimaConfig(fitter = "longar",
      harmYearly = 3))
    spark.stop()
  }
}
