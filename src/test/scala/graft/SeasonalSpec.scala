package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.arima.{HarmCoef, Seasonal}
import graft.forecast.Forecast
import graft.arima.ArLinearModel

class SeasonalSpec extends AnyFunSuite {

  test("fitHarmonics recovers known cos/sin coefficients exactly") {
    val ps = Seasonal.pairs(24, harmDaily = 2, harmWeekly = 0)
    val n = 24 * 50
    val tau = Array.tabulate(n)(_.toDouble + 1000.0)
    val y = tau.map { t =>
      5.0 + 0.01 * t +
        3.0 * math.cos(2 * math.Pi * t / 24) -
        1.5 * math.sin(2 * math.Pi * t / 24) +
        0.8 * math.sin(2 * math.Pi * 2 * t / 24)
    }
    val hs = Seasonal.fitHarmonics(y, tau, ps)
    assert(hs.length == 2)
    assert(math.abs(hs(0).cos - 3.0) < 1e-8)
    assert(math.abs(hs(0).sin - (-1.5)) < 1e-8)
    assert(math.abs(hs(1).cos) < 1e-8)
    assert(math.abs(hs(1).sin - 0.8) < 1e-8)
  }

  test("too-short series returns no harmonics (safe no-op)") {
    val ps = Seasonal.pairs(24, 3, 2)
    val hs = Seasonal.fitHarmonics(Array(1.0, 2.0, 3.0),
      Array(1.0, 2.0, 3.0), ps)
    assert(hs.isEmpty)
  }

  test("coefficient names round-trip through parseName") {
    assert(Seasonal.parseName(Seasonal.coefName("cos", 8766, 3))
      .contains(("cos", 8766, 3)))
    assert(Seasonal.parseName("ar17").isEmpty)
    assert(Seasonal.parseName("beta0").isEmpty)
  }

  test("forecast re-adds the seasonal over the horizon") {
    // pure seasonal signal, AR part zero: forecast must reproduce the
    // cosine at future phases
    val harm = Array(HarmCoef(24, 1, 2.0, 0.0))
    val model = ArLinearModel(0.0, 0.0, Array.empty, 1.0, 100,
      harmonics = harm)
    val tauStart = 240.0
    val x = Array.tabulate(24)(j =>
      2.0 * math.cos(2 * math.Pi * (tauStart + j) / 24))
    val fc = Forecast.forecast(model, x, h = 12, Array(80, 95),
      startIndex = 0, tauStart = tauStart)
    var j = 0
    while (j < 12) {
      val expected = 2.0 * math.cos(2 * math.Pi * (tauStart + 24 + j) / 24)
      assert(math.abs(fc.mean(j) - expected) < 1e-9,
        s"step $j: ${fc.mean(j)} vs $expected")
      j += 1
    }
  }

  test("NaN tauStart disables the seasonal term (round-1 behavior)") {
    val harm = Array(HarmCoef(24, 1, 2.0, 0.0))
    val model = ArLinearModel(1.0, 0.0, Array.empty, 1.0, 100,
      harmonics = harm)
    val fc = Forecast.forecast(model, Array(1.0, 1.0), h = 3,
      Array(80, 95))
    assert(fc.mean.forall(v => math.abs(v - 1.0) < 1e-12))
  }
}
