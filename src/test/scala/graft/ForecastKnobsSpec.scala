package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.arima.ArLinearModel
import graft.forecast.Forecast
import graft.pipeline.Darima

class ForecastKnobsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dampTrend=1 reproduces the undamped linear trend exactly") {
    val model = ArLinearModel(1.0, 0.5, Array.empty, 1.0, 10)
    val x = Array(1.0, 2.0, 3.0)
    val a = Forecast.forecast(model, x, 5, Array(80, 95), startIndex = 7)
    val b = Forecast.forecast(model, x, 5, Array(80, 95), startIndex = 7,
      dampTrend = 1.0)
    assert(a.mean.sameElements(b.mean))
  }

  test("damped trend converges instead of growing linearly") {
    val model = ArLinearModel(0.0, 1.0, Array.empty, 1.0, 10)
    val x = Array(0.0)
    val phi = 0.5
    val fc = Forecast.forecast(model, x, 4, Array(80, 95), startIndex = 0,
      dampTrend = phi)
    // beta1=1: step i mean = n + sum_{j=1..i} phi^j with n = 1
    val expect = Array(1.5, 1.75, 1.875, 1.9375)
    fc.mean.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"$g vs $e")
    }
  }

  test("holdout auto-selection picks a harmonic count that fits the data") {
    import spark.implicits._
    // hourly series with a strong "yearly" cycle (period scaled down
    // so the test stays fast): candidates with harmonics must beat 0
    val n = 6000
    val df = (0 until n).map { t =>
      (t.toDouble, 50.0 + 10.0 * math.sin(2 * math.Pi * t / 8766.0) +
        math.sin(t * 0.7))
    }.toDF("time", "value")
    val cfg = graft.pipeline.DarimaConfig(numChunks = 2, freq = 24,
      tol = 48, maxLag = 48)
    val (chosen, model, fc) = graft.pipeline.Darima
      .runAutoHarmonics(spark, df, h = 200, cfg, candidates = Seq(0, 1))
    assert(Seq(0, 1).contains(chosen))
    assert(fc.mean.length == 200 && fc.mean.forall(!_.isNaN))
    assert(model.p > 0)
  }

  test("recency decay reweights the DLSA combine toward recent chunks") {
    import spark.implicits._
    // two chunks, equal precision: undecayed combine averages them;
    // decay λ=0.5 weights chunk 1 twice chunk 0
    val coefs = Seq(
      (0, "ar1", 1, 0.0, 1.0, 100L),
      (1, "ar1", 1, 3.0, 1.0, 100L))
      .toDF("chunk_id", "coef", "lag_idx", "value", "weight", "n")
    val plain = Darima.combine(coefs, "dlsa")
      .collect()(0).getDouble(2)
    val decayed = Darima.combine(coefs, "dlsa", 0.5, 2)
      .filter(col("coef") === "ar1").collect()(0).getDouble(2)
    assert(math.abs(plain - 1.5) < 1e-12)
    assert(math.abs(decayed - 2.0) < 1e-12) // (0.5*0 + 1*3)/(0.5+1)
  }
}
