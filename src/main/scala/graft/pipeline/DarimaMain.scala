package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.eval.Metrics

/** CLI entry point mirroring the reference's single executable run
  * (reference: `python darima.py`, darima.py:492-493 → darima.py:50-125):
  * load train/test CSVs, distributed fit + combine, forecast h = |test|,
  * write forecast.json, print mean MASE/sMAPE/MSIS.
  *
  * Usage: DarimaMain <train.csv> <test.csv> <outDir> [numChunks] [method]
  *    or: DarimaMain --config <darima_config.json> <outDir>
  *        (reference-format config, darima_config.json:1-9)
  */
object DarimaMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: DarimaMain <train.csv> <test.csv> <outDir> [numChunks] [method]" +
        " | DarimaMain --config <config.json> <outDir>")
    val (trainPath, testPath, outDir, cfg0) =
      if (args(0) == "--config") {
        val rc = DarimaConfigIO.load(args(1))
        (rc.trainPath, rc.testPath, args(2), rc.cfg)
      } else {
        val k = if (args.length > 3) args(3).toInt else 4
        val method = if (args.length > 4) args(4) else "dlsa"
        // production default: 3 yearly Fourier pairs (RESULTS.md)
        (args(0), args(1), args(2),
          DarimaConfig(numChunks = k, method = method, harmYearly = 3))
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-darima")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val cfg = cfg0
      val train = Darima.loadSeriesCsv(spark, trainPath)
      val test = Darima.loadSeriesCsv(spark, testPath)
      val testVals = test.orderBy("time").select("value").collect()
        .map(_.getDouble(0))
      val (model, fc) = Darima.run(spark, train, testVals.length, cfg)
      new java.io.File(outDir).mkdirs()
      // Scale-safe sink: fitted/residuals inline in forecast.json
      // (reference byte parity) up to GRAFT_FR_INLINE_MAX train rows
      // (default 1M — well above the 121k-row fixtures); beyond
      // that they go to parquet distributed and the JSON carries a
      // pointer (Darima.writeForecastOutputs, VERDICT r9 #5).
      val inlineMax =
        sys.env.getOrElse("GRAFT_FR_INLINE_MAX", "1000000").toLong
      Darima.writeForecastOutputs(fc,
        Darima.fittedResidualsDF(train, model), model.n, outDir,
        inlineMax): Unit
      // MASE/MSIS scaling from one distributed aggregate — the train
      // series never reaches the driver (only the test tail does).
      val scale = Darima.seasonalNaiveScaleDF(train, cfg.freq)
      val mase = Metrics.mean(Metrics.maseScaled(testVals, fc.mean, scale))
      val smape = Metrics.mean(Metrics.smape(testVals, fc.mean))
      val msis80 = Metrics.mean(Metrics.msisScaled(testVals,
        fc.lower(0), fc.upper(0), 80, scale))
      val msis95 = Metrics.mean(Metrics.msisScaled(testVals,
        fc.lower(1), fc.upper(1), 95, scale))
      println(f"""{"p":${model.p},"sigma2":${model.sigma2}%.4f,""" +
        f""""mase":$mase%.4f,"smape":$smape%.4f,""" +
        f""""msis_80":$msis80%.4f,"msis_95":$msis95%.4f}""")
    } finally spark.stop()
  }
}
