package graft.pipeline

import org.apache.spark.sql.SparkSession
import graft.eval.Metrics

/** Evaluate the pipeline over the reference's whole test corpus — all
  * 10 GEFCom2017-style electricity zones (reference: data/ listing,
  * SURVEY.md §5.2) — and print one JSON metrics line per zone plus a
  * mean row. Usage: ZonesEval [dataDir] (default /root/reference/data).
  */
object ZonesEval {
  val allZones: Seq[String] = Seq("CT", "MASS", "ME", "NEMASSBOST", "NH",
    "RI", "SEMASS", "TOTAL", "VT", "WCMASS")

  /** GRAFT_ZONES=NEMASSBOST,VT narrows the run (single-zone fitter
    * measurements); default is the full 10-zone corpus.
    */
  def zones: Seq[String] = sys.env.get("GRAFT_ZONES")
    .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    .getOrElse(allZones)

  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/reference/data")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-zones")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val harmEnv0 = sys.env.getOrElse("GRAFT_HARM_YEARLY", "3")
      val cfg = DarimaConfig(
        fitter = sys.env.getOrElse("GRAFT_FITTER", "longar"),
        harmDaily = sys.env.getOrElse("GRAFT_HARM_DAILY", "0").toInt,
        harmWeekly = sys.env.getOrElse("GRAFT_HARM_WEEKLY", "0").toInt,
        harmYearly = if (harmEnv0 == "auto") 3 else harmEnv0.toInt,
        maxLag = sys.env.getOrElse("GRAFT_MAX_LAG", "0").toInt,
        recencyDecay = sys.env.getOrElse("GRAFT_DECAY", "1.0").toDouble,
        decayScope = sys.env.getOrElse("GRAFT_DECAY_SCOPE", "all"),
        seasonalWeighting = sys.env.getOrElse("GRAFT_SEASONAL_W", "off"))
      val rows = zones.map { zone =>
        val train = Darima.loadSeriesCsv(spark, s"$dataDir/${zone}_train.csv")
        val test = Darima.loadSeriesCsv(spark, s"$dataDir/${zone}_test.csv")
        val testVals = test.orderBy("time").select("value").collect()
          .map(_.getDouble(0))
        // distributed scale — no full-train collect (VERDICT r2 #2)
        val scale = Darima.seasonalNaiveScaleDF(train, cfg.freq)
        val harmEnv = sys.env.getOrElse("GRAFT_HARM_YEARLY", "3")
        val (_, fc) =
          if (harmEnv == "auto") {
            val (chosen, m, f) = Darima.runAutoHarmonics(spark, train,
              testVals.length, cfg)
            println(s"""{"zone":"$zone","harm_yearly_auto":$chosen}""")
            (m, f)
          } else Darima.run(spark, train, testVals.length, cfg)
        val mase = Metrics.mean(Metrics.maseScaled(testVals, fc.mean, scale))
        val smape = Metrics.mean(Metrics.smape(testVals, fc.mean))
        val msis80 = Metrics.mean(Metrics.msisScaled(testVals,
          fc.lower(0), fc.upper(0), 80, scale))
        val msis95 = Metrics.mean(Metrics.msisScaled(testVals,
          fc.lower(1), fc.upper(1), 95, scale))
        println(f"""{"zone":"$zone","mase":$mase%.4f,"smape":$smape%.4f,""" +
          f""""msis_80":$msis80%.4f,"msis_95":$msis95%.4f}""")
        (mase, smape, msis80, msis95)
      }
      val n = rows.length
      println(f"""{"zone":"MEAN","mase":${rows.map(_._1).sum / n}%.4f,""" +
        f""""smape":${rows.map(_._2).sum / n}%.4f,""" +
        f""""msis_80":${rows.map(_._3).sum / n}%.4f,""" +
        f""""msis_95":${rows.map(_._4).sum / n}%.4f}""")
    } finally spark.stop()
  }
}
