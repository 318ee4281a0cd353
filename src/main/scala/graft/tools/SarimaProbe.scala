package graft.tools

import org.apache.spark.sql.SparkSession
import graft.arima._

/** Diagnostic: per-chunk SARIMA order selection on an electricity
  * zone, with and without the total-differencing cap — prints the
  * (d, D, p, q, P, Q) each chunk selects and the linearized
  * interval-growth proxy sqrt(Σψ²) at the test horizon. Usage:
  *   tools/spark-run.sh graft.tools.SarimaProbe [zoneCsv] [chunks]
  */
object SarimaProbe {
  def main(args: Array[String]): Unit = {
    val csv = args.headOption.getOrElse(
      "/root/reference/data/NEMASSBOST_train.csv")
    val k = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vals = graft.pipeline.Darima.loadSeriesCsv(spark, csv)
      .orderBy("time").select("value").collect().map(_.getDouble(0))
    val n = vals.length
    println(s"n=$n, chunks=$k")
    (0 until k).foreach { c =>
      val chunk = vals.slice(c * n / k, (c + 1) * n / k)
      Seq(2, 1, 0).foreach { cap =>
        val m = ArimaFit.fitSeasonal(chunk, 24, maxP = 5, maxQ = 5,
          maxSP = 2, maxSQ = 2, maxTotalD = cap)
        val ar = Sarima2Ar.toAr(m, 2000)
        val psi = graft.forecast.Forecast.psiWeights(ar.pi, 2879)
        val g = math.sqrt(psi.map(p => p * p).sum)
        println(f"chunk $c cap=$cap: d=${m.d} D=${m.bigD} " +
          f"(p,q,P,Q)=(${m.phi.length},${m.theta.length}," +
          f"${m.sphi.length},${m.stheta.length}) sigma2=${m.sigma2}%.1f " +
          f"growth=$g%.1f")
      }
    }
    spark.stop()
  }
}
