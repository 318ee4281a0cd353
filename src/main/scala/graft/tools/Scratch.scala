package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.{Darima, DarimaConfig}
import graft.eval.Metrics
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dataDir = "/root/reference/data"
    for (zone <- Seq("VT", "ME", "NEMASSBOST", "TOTAL")) {
      val train = Darima.loadSeriesCsv(spark, s"$dataDir/${zone}_train.csv")
      val test = Darima.loadSeriesCsv(spark, s"$dataDir/${zone}_test.csv")
      val testVals = test.orderBy("time").select("value").collect()
        .map(_.getDouble(0))
      val trainVals = train.orderBy("time").select("value").collect()
        .map(_.getDouble(0))
      for ((label, cfg) <- Seq(
        ("decay1.0", DarimaConfig(harmYearly = 3)),
        ("decay0.8", DarimaConfig(harmYearly = 3, recencyDecay = 0.8)),
        ("decay0.5", DarimaConfig(harmYearly = 3, recencyDecay = 0.5)),
        ("decay0.25", DarimaConfig(harmYearly = 3, recencyDecay = 0.25)))) {
        val (_, fc) = Darima.run(spark, train, testVals.length, cfg)
        val mase = Metrics.mean(Metrics.mase(trainVals, testVals, fc.mean, 24))
        val msis95 = Metrics.mean(Metrics.msis(trainVals, testVals,
          fc.lower(1), fc.upper(1), 95, 24))
        println(f"$zone $label: MASE $mase%.4f MSIS95 $msis95%.3f")
      }
    }
    spark.stop()
  }
}
