package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.arima._
import graft.forecast.Forecast
import graft.eval.Metrics

class ArimaCoreSpec extends AnyFunSuite {

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  /** Deterministic Gaussian-ish noise via a fixed-seed LCG + CLT sum. */
  def noise(n: Int, seed: Long = 42L): Array[Double] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(n) { var s = 0.0; var i = 0; while (i < 12) { s += next(); i += 1 }; s }
  }

  def simulateAr(phi: Array[Double], c: Double, n: Int, seed: Long = 42L)
      : Array[Double] = {
    val e = noise(n + 200, seed)
    val x = new Array[Double](n + 200)
    var t = 0
    while (t < x.length) {
      var v = c + e(t)
      var i = 0
      while (i < phi.length && t - 1 - i >= 0) { v += phi(i) * x(t - 1 - i); i += 1 }
      x(t) = v
      t += 1
    }
    x.drop(200)
  }

  test("polynomial multiply and pow") {
    // (1 - B)^2 = 1 - 2B + B^2
    assert(Polynomial.pow(Array(1.0, -1.0), 2).sameElements(Array(1.0, -2.0, 1.0)))
    // (1+B)(1-B) = 1 - B^2
    assert(Polynomial.multiply(Array(1.0, 1.0), Array(1.0, -1.0))
      .sameElements(Array(1.0, 0.0, -1.0)))
  }

  test("divideSeries geometric: 1/(1-aB)") {
    val s = Polynomial.divideSeries(Array(1.0), Array(1.0, -0.5), 6)
    (0 until 6).foreach(j => assert(approx(s(j), math.pow(0.5, j))))
  }

  test("pi weights: AR(1) is phi then zeros") {
    val m = SarimaModel(Array(0.7), 0, Array.empty, Array.empty, 0,
      Array.empty, 1, 0.0, 0.0, 1.0, 100)
    val ar = Sarima2Ar.toAr(m, 10)
    assert(approx(ar.pi(0), 0.7))
    (1 until 10).foreach(i => assert(approx(ar.pi(i), 0.0)))
  }

  test("pi weights: ARIMA(0,1,0) is single unit weight") {
    val m = SarimaModel(Array.empty, 1, Array.empty, Array.empty, 0,
      Array.empty, 1, 0.0, 0.0, 1.0, 100)
    val ar = Sarima2Ar.toAr(m, 10)
    assert(approx(ar.pi(0), 1.0))
    (1 until 10).foreach(i => assert(approx(ar.pi(i), 0.0)))
  }

  test("pi expansion reconstructs AR polynomial through the MA polynomial") {
    // ARIMA(1,1,1): (1 - pi1 B - pi2 B^2 - ...)(1 + thetaB) == (1-phiB)(1-B)
    val phi = 0.5; val theta = 0.4
    val m = SarimaModel(Array(phi), 1, Array(theta), Array.empty, 0,
      Array.empty, 1, 0.0, 0.0, 1.0, 100)
    val ar = Sarima2Ar.toAr(m, 50)
    val piPoly = 1.0 +: ar.pi.map(-_)
    val recon = Polynomial.multiply(piPoly, Array(1.0, theta))
    val want = Polynomial.multiply(Array(1.0, -phi), Array(1.0, -1.0))
    (0 until want.length).foreach(i => assert(approx(recon(i), want(i), 1e-8)))
    // invertible model → summable pi weights, tail vanishes
    assert(math.abs(ar.pi.last) < 1e-3)
  }

  test("beta0/beta1 from mean and drift") {
    val m = SarimaModel(Array(0.6), 0, Array.empty, Array.empty, 0,
      Array.empty, 1, 10.0, 0.0, 1.0, 100)
    val ar = Sarima2Ar.toAr(m, 10)
    assert(approx(ar.beta0, 10.0 * (1 - 0.6)))
    assert(approx(ar.beta1, 0.0))
    val md = SarimaModel(Array.empty, 1, Array.empty, Array.empty, 0,
      Array.empty, 1, 0.0, 2.0, 1.0, 100)
    val ard = Sarima2Ar.toAr(md, 10)
    // d=1: pi1=1 → beta1 = drift*(1-Σπ) = 0, beta0 = drift*Σ i·π_i = 2
    assert(approx(ard.beta1, 0.0))
    assert(approx(ard.beta0, 2.0))
  }

  test("psi weights of AR(1) are powers of phi") {
    val psi = Forecast.psiWeights(Array(0.8), 6)
    (0 until 6).foreach(j => assert(approx(psi(j), math.pow(0.8, j))))
  }

  test("probit checkpoints") {
    assert(approx(Forecast.probit(0.90), 1.281552, 1e-5))
    assert(approx(Forecast.probit(0.95), 1.644854, 1e-5))
    assert(approx(Forecast.probit(0.975), 1.959964, 1e-5))
    assert(approx(Forecast.probit(0.995), 2.575829, 1e-5))
  }

  test("OLS AR fit recovers simulated coefficients") {
    val x = simulateAr(Array(0.6, -0.3), 2.0, 20000)
    val fit = ArFit.olsAr(x, 2, trend = false)
    assert(math.abs(fit.pi(0) - 0.6) < 0.03, s"phi1=${fit.pi(0)}")
    assert(math.abs(fit.pi(1) + 0.3) < 0.03, s"phi2=${fit.pi(1)}")
    assert(math.abs(fit.sigma2 - 1.0) < 0.1, s"sigma2=${fit.sigma2}")
  }

  test("Levinson-Durbin matches OLS on AR(2)") {
    val x = simulateAr(Array(0.5, 0.2), 0.0, 20000)
    val (phis, _) = ArFit.levinsonDurbin(ArFit.autocovariances(x, 2), 2)
    val ols = ArFit.olsAr(x, 2, trend = false)
    assert(math.abs(phis(2)(0) - ols.pi(0)) < 0.01)
    assert(math.abs(phis(2)(1) - ols.pi(1)) < 0.01)
  }

  test("KPSS: stationary vs random walk, and d selection") {
    val stat = noise(2000)
    val walk = stat.scanLeft(0.0)(_ + _).drop(1)
    assert(ArimaFit.kpssStat(stat) < 0.463)
    assert(ArimaFit.kpssStat(walk) > 0.463)
    assert(ArimaFit.selectD(stat) == 0)
    assert(ArimaFit.selectD(walk) >= 1)
  }

  test("auto fit recovers AR(1) structure on simulated data") {
    val x = simulateAr(Array(0.7), 5.0, 8000)
    val mod = ArimaFit.fit(x)
    assert(mod.d == 0, s"d=${mod.d}")
    val ar = Sarima2Ar.toAr(mod, 50)
    // one-step prediction quality: forecast variance close to noise var
    assert(mod.sigma2 < 1.2, s"sigma2=${mod.sigma2}")
    // implied unconditional mean close to the simulated one: c/(1-phi)=5/(0.3)
    val uncond = ar.beta0 / (1.0 - ar.pi.sum)
    assert(math.abs(uncond - 5.0 / 0.3) < 1.5, s"mean=$uncond")
  }

  test("CSS optimization recovers ARMA(1,1) parameters from an HR start") {
    // simulate ARMA(1,1): x_t = 0.6 x_{t-1} + e_t + 0.4 e_{t-1}
    val phi = 0.6; val theta = 0.4
    val e = noise(12200, seed = 11L)
    val x = new Array[Double](12200)
    var t = 1
    while (t < x.length) {
      x(t) = phi * x(t - 1) + e(t) + theta * e(t - 1); t += 1
    }
    val w = x.drop(200)
    val Some((c0, p0, t0)) = ArimaFit.hannanRissanen(w, 1, 1)
    val (c1, p1, t1) = ArimaFit.cssOptimize(w, c0, p0, t0)
    assert(math.abs(p1(0) - phi) < 0.05, s"phi=${p1(0)} (HR gave ${p0(0)})")
    assert(math.abs(t1(0) - theta) < 0.05, s"theta=${t1(0)} (HR gave ${t0(0)})")
    // the optimizer must not move away from the truth vs its start
    assert(math.abs(p1(0) - phi) <= math.abs(p0(0) - phi) + 0.02)
  }

  test("forecast of constant series is constant with zero residuals") {
    val x = Array.fill(200)(7.0)
    val model = ArLinearModel(7.0 * (1 - 0.0), 0.0, Array(0.0), 0.0, 200)
    val fc = Forecast.forecast(model, x, 10, Array(80, 95))
    fc.mean.foreach(v => assert(approx(v, 7.0)))
    assert(fc.se.forall(_ == 0.0))
  }

  test("MASE of the seasonal-naive forecast equals 1 on average") {
    val train = noise(1000).map(_ + 10)
    val m = 24
    val test0 = noise(96, seed = 7L).map(_ + 10)
    val naivePred = Array.tabulate(96)(i => train(train.length - m + (i % m)))
    val mase = Metrics.mase(train, test0, naivePred, m)
    assert(mase.forall(_ >= 0))
    // identity check on train itself: forecasting y_t by y_{t-m}
    val preds = Array.tabulate(train.length - m)(i => train(i))
    val tests = Array.tabulate(train.length - m)(i => train(i + m))
    val mase2 = Metrics.mase(train, tests, preds, m)
    assert(approx(Metrics.mean(mase2), 1.0, 1e-9))
  }

  test("MSIS penalizes coverage misses and wider intervals score worse") {
    val train = noise(500)
    val test0 = Array.fill(10)(0.0)
    val narrow = Metrics.msis(train, test0, Array.fill(10)(-1.0),
      Array.fill(10)(1.0), 95, 24)
    val wide = Metrics.msis(train, test0, Array.fill(10)(-2.0),
      Array.fill(10)(2.0), 95, 24)
    val miss = Metrics.msis(train, test0, Array.fill(10)(1.0),
      Array.fill(10)(2.0), 95, 24)
    assert(Metrics.mean(narrow) < Metrics.mean(wide))
    assert(Metrics.mean(miss) > Metrics.mean(narrow))
  }
}
