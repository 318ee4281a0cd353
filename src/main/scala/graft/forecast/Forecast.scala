package graft.forecast

import graft.arima.ArLinearModel
import org.apache.commons.math3.distribution.NormalDistribution

/** h-step forecasting from the combined AR linear model — the
  * driver-side sequential recursion (reference: darima.py:292-414).
  * Two reference defects are fixed here, per SURVEY.md §1.4:
  *  - ψ-weights are seeded with ψ0 = 1 (reference's ar_to_ma returns
  *    all zeros, utils.py:39-55, collapsing every s.e. to √σ²);
  *  - the trend regressor for step i is t = n+i (reference reuses
  *    t = n for the first step, darima.py:331-332).
  */
final case class ForecastResult(
    levels: Array[Int], mean: Array[Double], se: Array[Double],
    lower: Array[Array[Double]], upper: Array[Array[Double]],
    fitted: Array[Double], residuals: Array[Double])

object Forecast {

  /** MA(∞) ψ-weights of the AR model: ψ0=1,
    * ψ_j = Σ_{k=1..min(j,p)} π_k ψ_{j−k}.
    */
  def psiWeights(pi: Array[Double], h: Int): Array[Double] = {
    val psi = new Array[Double](h)
    if (h == 0) return psi
    psi(0) = 1.0
    var j = 1
    while (j < h) {
      var acc = 0.0
      var k = 1
      val kMax = math.min(j, pi.length)
      while (k <= kMax) { acc += pi(k - 1) * psi(j - k); k += 1 }
      psi(j) = acc
      j += 1
    }
    psi
  }

  /** Standard-normal quantile (probit). Commons-math3 ships in
    * /opt/spark/jars; replaces the reference's bisection-on-erf
    * (utils.py:4-21) with the library inverse CDF.
    */
  def probit(p: Double): Double =
    new NormalDistribution(0.0, 1.0).inverseCumulativeProbability(p)

  /** Point forecasts + intervals + in-sample fitted/residuals.
    *
    * @param levels confidence levels in percent, e.g. Array(80, 95)
    * @param startIndex absolute 0-based index of x(0) in the full
    *   series — pass n_total − x.length when x is only the tail
    *   window, so the trend regressor stays t = n+i (the reference
    *   gets this off by one even on the full series, SURVEY.md §1.4.7)
    * @param tauStart Fourier phase (absolute sample units) of x(0),
    *   for models with harmonics (graft.arima.Seasonal); NaN or an
    *   empty harmonics array disables the seasonal term. The AR part
    *   then operates on the deseasonalized series z = y − s(τ).
    * @param dampTrend per-step damping φ of the *future* trend
    *   increment (Gardner–McKenzie damped trend): step i uses
    *   t = n + Σ_{j≤i} φʲ instead of n + i. 1.0 (default) = the
    *   undamped linear trend; in-sample fitted values are never
    *   damped.
    */
  def forecast(model: ArLinearModel, x: Array[Double], h: Int,
      levels: Array[Int], startIndex: Long = 0L,
      tauStart: Double = Double.NaN,
      dampTrend: Double = 1.0): ForecastResult = {
    val p = model.p
    val n = x.length
    val useHarm = model.harmonics.nonEmpty && !tauStart.isNaN
    // consecutive samples are one sample-unit apart, so the phase at
    // buffer index j is tauStart + j
    def sAt(j: Int): Double =
      if (useHarm) graft.arima.Seasonal.value(model.harmonics, tauStart + j)
      else 0.0
    // AR state is the deseasonalized series
    val z = Array.tabulate(n)(j => x(j) - sAt(j))
    // in-sample one-step fits; first p values have no full lag window
    // and are NaN by construction (SURVEY.md §1.4.8 — kept, it is the
    // honest answer rather than a backcast)
    val fitted = new Array[Double](n)
    val residuals = new Array[Double](n)
    var t = 0
    while (t < n) {
      if (t < p) { fitted(t) = Double.NaN; residuals(t) = Double.NaN }
      else {
        var pred = model.beta0 + model.beta1 * (startIndex + t + 1)
        var i = 0
        while (i < p) { pred += model.pi(i) * z(t - 1 - i); i += 1 }
        pred += sAt(t)
        fitted(t) = pred
        residuals(t) = x(t) - pred
      }
      t += 1
    }
    // recursive h-step point forecast feeding forecasts back in
    // (recursion runs in z-space; the seasonal re-adds at the end)
    val buf = new Array[Double](n + h)
    System.arraycopy(z, 0, buf, 0, n)
    val mean = new Array[Double](h)
    // damped-trend accumulator: tEff(step i) = (n-th trend value) +
    // Σ_{j=1..i} φʲ; φ=1 reduces to the linear n+i
    var trendAcc = (startIndex + n).toDouble
    var damp = dampTrend
    var s = 0
    while (s < h) {
      val tAbs = n + s // 0-based index; trend value is startIndex+tAbs+1
      trendAcc += damp
      if (dampTrend < 1.0) damp *= dampTrend
      var pred = model.beta0 + model.beta1 * trendAcc
      var i = 0
      val iMax = math.min(p, tAbs)
      while (i < iMax) { pred += model.pi(i) * buf(tAbs - 1 - i); i += 1 }
      buf(tAbs) = pred
      mean(s) = pred + sAt(tAbs)
      s += 1
    }
    // forecast standard errors via ψ-weights cumulative sum
    val psi = psiWeights(model.pi, h)
    val se = new Array[Double](h)
    var cum = 0.0
    s = 0
    while (s < h) {
      cum += psi(s) * psi(s)
      se(s) = math.sqrt(model.sigma2 * cum)
      s += 1
    }
    val qs = levels.map(l => probit((1.0 + l / 100.0) / 2.0))
    val lower = Array.tabulate(levels.length, h)((li, si) =>
      mean(si) - qs(li) * se(si))
    val upper = Array.tabulate(levels.length, h)((li, si) =>
      mean(si) + qs(li) * se(si))
    ForecastResult(levels, mean, se, lower, upper, fitted, residuals)
  }
}
