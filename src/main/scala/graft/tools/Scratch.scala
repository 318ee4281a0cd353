package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline.{Darima, DarimaConfig}
import graft.eval.Metrics
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val train = Darima.loadSeriesCsv(spark, "/root/reference/data/NEMASSBOST_train.csv")
    val test = Darima.loadSeriesCsv(spark, "/root/reference/data/NEMASSBOST_test.csv")
    val testVals = test.orderBy("time").select("value").collect().map(_.getDouble(0))
    val trainVals = train.orderBy("time").select("value").collect().map(_.getDouble(0))
    for ((lag, k, meth) <- Seq((176,4,"dlsa"), (344,4,"dlsa"), (512,4,"dlsa"), (344,8,"dlsa"), (344,4,"mean"))) {
      val cfg = DarimaConfig(numChunks=k, method=meth, maxLag=lag)
      val (_, fc) = Darima.run(spark, train, testVals.length, cfg)
      val mase = Metrics.mean(Metrics.mase(trainVals, testVals, fc.mean, 24))
      val smape = Metrics.mean(Metrics.smape(testVals, fc.mean))
      val msis95 = Metrics.mean(Metrics.msis(trainVals, testVals, fc.lower(1), fc.upper(1), 95, 24))
      println(f"lag=$lag%4d k=$k meth=$meth%5s  MASE=$mase%.4f sMAPE=$smape%.4f MSIS95=$msis95%.2f")
    }
    spark.stop()
  }
}
