package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev scratchpad main for quick local experiments (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    println("z80 = " + graft.forecast.Forecast.probit((1.0 + 0.80) / 2.0))
    println("z95 = " + graft.forecast.Forecast.probit((1.0 + 0.95) / 2.0))
  }
}
