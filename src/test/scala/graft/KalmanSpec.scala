package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.arima._

/** Exact-ML Kalman likelihood (graft.arima.Kalman): checked against
  * the closed-form AR(1) innovations, the white-noise degenerate
  * case, and CSS-vs-ML behavior on a short MA(1) where CSS is
  * known-biased.
  */
class KalmanSpec extends AnyFunSuite {

  def noise(n: Int, seed: Long): Array[Double] = {
    var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(n) { var s = 0.0; var i = 0; while (i < 12) { s += next(); i += 1 }; s }
  }

  test("AR(1) innovations match the closed form") {
    val y = noise(200, 3L).scanLeft(0.0)((a, e) => 0.6 * a + e).drop(1)
    val phi = 0.6
    val Some((v, f)) = Kalman.innovations(y, 0.0, Array(phi), Array.empty)
    // closed form: f_1 = 1/(1−φ²), v_1 = y_1; then f_t = 1,
    // v_t = y_t − φ y_{t−1}
    assert(math.abs(f(0) - 1.0 / (1 - phi * phi)) < 1e-9, s"f0=${f(0)}")
    assert(math.abs(v(0) - y(0)) < 1e-12)
    var t = 1
    while (t < y.length) {
      assert(math.abs(f(t) - 1.0) < 1e-9, s"f($t)=${f(t)}")
      assert(math.abs(v(t) - (y(t) - phi * y(t - 1))) < 1e-9)
      t += 1
    }
  }

  test("white noise: unit innovation variances, residuals = series") {
    val y = noise(100, 5L)
    val Some((v, f)) = Kalman.innovations(y, 0.0, Array.empty, Array.empty)
    assert(f.forall(x => math.abs(x - 1.0) < 1e-12))
    assert(v.zip(y).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("non-stationary AR rejects instead of diverging") {
    val y = noise(50, 7L)
    assert(Kalman.innovations(y, 0.0, Array(1.05), Array.empty).isEmpty)
    assert(Kalman.negTwoLogLik(y, 0.0, Array(1.05), Array.empty)
      .isPosInfinity)
  }

  test("ML likelihood at the true MA(1) beats a detuned one") {
    val e = noise(301, 11L)
    val y = Array.tabulate(300)(t => e(t + 1) + 0.6 * e(t))
    val llTrue = Kalman.negTwoLogLik(y, 0.0, Array.empty, Array(0.6))
    val llOff = Kalman.negTwoLogLik(y, 0.0, Array.empty, Array(0.1))
    assert(llTrue < llOff, s"$llTrue !< $llOff")
  }

  test("fit() with ML polish recovers a short MA(1)") {
    val e = noise(121, 13L)
    val y = Array.tabulate(120)(t => 1.0 + e(t + 1) + 0.7 * e(t))
    val mod = ArimaFit.fit(y, 1, maxP = 2, maxQ = 2)
    // the linearized one-step prediction must be sane: pi_1 ≈ θ/(1+θ)…
    // just require an MA/AR structure explaining positive lag-1
    // autocorrelation within tolerance via the pi weights
    val ar = Sarima2Ar.toAr(mod, 10)
    assert(ar.pi(0) > 0.2 && ar.pi(0) < 0.65, s"pi1=${ar.pi(0)}")
    assert(mod.sigma2 > 0.5 && mod.sigma2 < 1.6, s"sigma2=${mod.sigma2}")
  }

  test("steady-state cutover matches the exact filter") {
    val y = noise(500, 13L).scanLeft(0.0)((a, e) => 0.7 * a + e).drop(1)
    val phi = Array(0.7)
    val theta = Array(0.3)
    val Some((v0, f0)) = Kalman.innovations(y, 0.1, phi, theta, 0.0)
    val Some((v1, f1)) = Kalman.innovations(y, 0.1, phi, theta, 1e-12)
    var t = 0
    while (t < y.length) {
      assert(math.abs(v0(t) - v1(t)) < 1e-8, s"v($t)")
      assert(math.abs(f0(t) - f1(t)) < 1e-8, s"f($t)")
      t += 1
    }
  }

  test("seasonal likelihood equals plain likelihood of the expanded model") {
    val y = noise(300, 17L)
    val m = 4
    // (c, phi, theta, sphi, stheta) = (0.2, 0.5, -, 0.3, -):
    // expanded AR polynomial (1-0.5B)(1-0.3B^4)
    val b = Array(0.2, 0.5, 0.3)
    val seas = Kalman.seasonalNegTwoLogLik(y, b, 1, 0, 1, 0, m)
    val phiF = Array(0.5, 0.0, 0.0, 0.3, -0.15)
    val plain = {
      val Some((v, f)) = Kalman.innovations(y, 0.2, phiF, Array.empty, 0.0)
      val n = y.length
      var s = 0.0; var lf = 0.0; var i = 0
      while (i < n) { s += v(i) * v(i) / f(i); lf += math.log(f(i)); i += 1 }
      n * math.log(s / n) + lf + n * (1.0 + math.log(2.0 * math.Pi))
    }
    assert(math.abs(seas - plain) < 1e-6, s"seas=$seas plain=$plain")
  }

  test("seasonal ML objective is minimized near the true parameters") {
    // simulate SARIMA(1,0,0)(1,0,0)_12 and compare the exact seasonal
    // likelihood at truth vs perturbed parameters
    val m = 12
    val e = noise(1200, 23L)
    val x = new Array[Double](1200)
    var t = 0
    while (t < x.length) {
      var v = e(t)
      if (t >= 1) v += 0.4 * x(t - 1)
      if (t >= m) v += 0.5 * x(t - m)
      if (t >= m + 1) v -= 0.2 * x(t - m - 1)
      x(t) = v
      t += 1
    }
    val y = x.drop(200)
    val atTrue = Kalman.seasonalNegTwoLogLik(y, Array(0.0, 0.4, 0.5), 1, 0, 1, 0, m)
    val off1 = Kalman.seasonalNegTwoLogLik(y, Array(0.0, 0.1, 0.5), 1, 0, 1, 0, m)
    val off2 = Kalman.seasonalNegTwoLogLik(y, Array(0.0, 0.4, 0.1), 1, 0, 1, 0, m)
    assert(atTrue < off1 && atTrue < off2, s"$atTrue $off1 $off2")
  }
}
