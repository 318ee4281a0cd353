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

  test("modulated pairs recover a season-varying diurnal shape " +
      "exactly, and drop when the modulator period exceeds the span") {
    import graft.arima.HarmSpec
    // "yearly" cycle 480 on a daily cycle 24: amplitude of the daily
    // cos swings with the season — y = (3 + 2cos(w_y t))·cos(w_d t),
    // i.e. plain (24,1).cos = 3 and the cos-modulated pair = 2
    val specs = Seasonal.specs(24, harmDaily = 1, harmWeekly = 0,
      harmYearly = 0, modDaily = 1, modYearly = 1)
      .map(s => if (s.mcycle > 0) s.copy(mcycle = 480) else s)
    val n = 480 * 4
    val tau = Array.tabulate(n)(_.toDouble + 500.0)
    val y = tau.map { t =>
      (3.0 + 2.0 * math.cos(2 * math.Pi * t / 480)) *
        math.cos(2 * math.Pi * t / 24)
    }
    val hs = Seasonal.fitHarmonics(y, tau, specs, withDrift = false)
    assert(hs.length == 3, hs.mkString(","))
    val plain = hs.find(_.mcycle == 0).get
    val mc = hs.find(h => h.mcycle == 480 && !h.msin).get
    val ms = hs.find(h => h.mcycle == 480 && h.msin).get
    assert(math.abs(plain.cos - 3.0) < 1e-7 &&
      math.abs(plain.sin) < 1e-7, plain.toString)
    assert(math.abs(mc.cos - 2.0) < 1e-7 &&
      math.abs(mc.sin) < 1e-7, mc.toString)
    assert(math.abs(ms.cos) < 1e-7 && math.abs(ms.sin) < 1e-7,
      ms.toString)
    // Seasonal.value reproduces the signal through the mod factor
    val maxErr = tau.indices.map(i =>
      math.abs(Seasonal.value(hs, tau(i)) - y(i))).max
    assert(maxErr < 1e-6, s"maxErr=$maxErr")
    // under one modulator period observed, the interaction pairs are
    // near-collinear with the base pair and must drop out
    val short = Seasonal.fitHarmonics(y.take(240), tau.take(240), specs,
      withDrift = false)
    assert(short.forall(_.mcycle == 0), short.mkString(","))
  }

  test("explicit modDaily is honored independent of harmDaily") {
    // a sideband is a regressor in its own right — modDaily=2 with NO
    // plain daily pairs must still yield 2·modYearly·2 interaction
    // specs, not silently drop to zero
    val specs = Seasonal.specs(24, harmDaily = 0, harmWeekly = 0,
      harmYearly = 1, modDaily = 2, modYearly = 1)
    assert(specs.count(_.mcycle > 0) == 4, specs.mkString(","))
    assert(specs.count(_.mcycle == 0) == 1)
  }

  test("modulated coefficient names round-trip with distinct slots") {
    val h = HarmCoef(24, 2, 1.0, 0.0, mcycle = 8766, mk = 1, msin = true)
    val name = Seasonal.coefName("sin", h)
    assert(name == "sin_24_2_ms_8766_1")
    val parsed = Seasonal.parseNameFull(name)
    assert(parsed.exists { case (t, s) => t == "sin" &&
      s == graft.arima.HarmSpec(24, 2, 8766, 1, msin = true) })
    // plain parseName must NOT mistake a modulated name for a plain
    // pair (it would corrupt the AR map fallback otherwise)
    assert(Seasonal.parseName(name).isEmpty)
    // slots: distinct across msin/variant/mk and disjoint from the
    // plain range
    val slots = for {
      trig <- Seq("cos", "sin"); mk <- 1 to 3; msin <- Seq(false, true)
    } yield Seasonal.lagIdx(
      HarmCoef(24, 2, 0, 0, mcycle = 8766, mk = mk, msin = msin), trig)
    assert(slots.distinct.length == slots.length)
    assert(slots.forall(s => s <= -50000000))
    assert(Seasonal.lagIdx(8766, 252, "dsin") > -50000000)
  }

  test("GLS refit under AR(1) errors beats OLS on the harmonic " +
      "coefficients and recovers a clean signal exactly") {
    import graft.arima.HarmSpec
    val n = 24 * 80
    val tau = Array.tabulate(n)(_.toDouble)
    val specs = Array(HarmSpec(24, 1))
    // clean signal: GLS with ANY filter must still recover exactly
    val clean = tau.map(t => 2.0 * math.cos(2 * math.Pi * t / 24)
      - 0.7 * math.sin(2 * math.Pi * t / 24))
    val hsClean = Seasonal.fitHarmonicsGls(clean, tau, specs,
      withDrift = false, pi = Array(0.9))
    assert(math.abs(hsClean(0).cos - 2.0) < 1e-8)
    assert(math.abs(hsClean(0).sin + 0.7) < 1e-8)
    // AR(1) errors, phi = 0.95: strongly autocorrelated noise
    val rng = new scala.util.Random(42)
    val e = new Array[Double](n)
    var prev = 0.0
    for (i <- 0 until n) {
      prev = 0.95 * prev + rng.nextGaussian()
      e(i) = prev
    }
    val y = Array.tabulate(n)(i => clean(i) + e(i))
    def err(h: Array[HarmCoef]): Double =
      math.abs(h(0).cos - 2.0) + math.abs(h(0).sin + 0.7)
    val ols = Seasonal.fitHarmonics(y, tau, specs, withDrift = false)
    val gls = Seasonal.fitHarmonicsGls(y, tau, specs,
      withDrift = false, pi = Array(0.95))
    assert(err(gls) < err(ols),
      s"GLS ${err(gls)} not better than OLS ${err(ols)}")
    // empty π ≡ OLS bit-for-bit
    val viaEmpty = Seasonal.fitHarmonicsGls(y, tau, specs,
      withDrift = false, pi = Array.empty)
    assert(viaEmpty(0).cos == ols(0).cos && viaEmpty(0).sin == ols(0).sin)
    // an over-long filter leaves too few whitened rows: safe empty
    assert(Seasonal.fitHarmonicsGls(y.take(16), tau.take(16), specs,
      withDrift = false, pi = Array.fill(14)(0.1)).isEmpty)
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
