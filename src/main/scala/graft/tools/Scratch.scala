package graft.tools
import org.apache.spark.sql.SparkSession
import graft.pipeline._
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val train = Darima.loadSeriesCsv(spark, "/root/reference/data/NEMASSBOST_train.csv")
    for (fitter <- Seq("longar", "sarima")) {
      val cfg = DarimaConfig(fitter = fitter, harmYearly = 3)
      val (model, fc) = Darima.run(spark, train, 48, cfg)
      println(f"$fitter: sigma2=${model.sigma2}%.2f p=${model.p} " +
        f"se1=${fc.se(0)}%.2f se48=${fc.se(47)}%.2f beta1=${model.beta1}%.6f")
    }
    spark.stop()
  }
}
