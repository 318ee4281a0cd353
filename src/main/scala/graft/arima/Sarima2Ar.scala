package graft.arima

/** A fitted (seasonal) ARIMA model in lag-polynomial form.
  *
  * Model: φ(B)·Φ(B^m)·(1−B)^d·(1−B^m)^D · (y_t − μ − drift·t) = θ(B)·Θ(B^m)·ε_t
  *
  * `phi`/`theta` hold φ_1..φ_p / θ_1..θ_q (Box–Jenkins sign
  * convention: AR poly = 1 − Σφ_i B^i, MA poly = 1 + Σθ_i B^i);
  * `sphi`/`stheta` are the seasonal counterparts at period m.
  */
final case class SarimaModel(
    phi: Array[Double], d: Int, theta: Array[Double],
    sphi: Array[Double], bigD: Int, stheta: Array[Double], m: Int,
    mu: Double, drift: Double, sigma2: Double, n: Long)

/** The global linear model every chunk fit is reduced to:
  * y_t = s(τ_t) + β0 + β1·t + Σ_{i=1..p} π_i·z_{t−i} + ε_t, Var(ε)=σ²,
  * where s(τ) is the optional Fourier seasonal (graft.arima.Seasonal),
  * z = y − s, and harmonics empty ⇒ s ≡ 0, z = y (the round-1 model).
  */
final case class ArLinearModel(
    beta0: Double, beta1: Double, pi: Array[Double], sigma2: Double,
    n: Long, harmonics: Array[HarmCoef] = Array.empty) {
  def p: Int = pi.length
}

/** SARIMA → truncated AR(tol) linearization ("pi weights") — the
  * reference's core map-side transform (reference: auto_arima.R:7-67,
  * tol = 2000 at auto_arima.R:71). Implemented as power-series long
  * division of the full AR polynomial by the full MA polynomial:
  *
  *   π(B) = φ(B)Φ(B^m)(1−B)^d(1−B^m)^D / (θ(B)Θ(B^m)) = 1 − Σ π_i B^i
  *
  * so the prediction form is y_t = Σ π_i y_{t−i} + ε_t. The intercept
  * and trend follow from substituting μ_t = μ + drift·t:
  *   β0 = μ(1−Σπ) + drift·Σ i·π_i
  *   β1 = drift·(1−Σπ)
  */
object Sarima2Ar {

  /** Full non-seasonal×seasonal AR polynomial incl. differencing. */
  private def fullArPoly(mod: SarimaModel): Array[Double] = {
    val ar = 1.0 +: mod.phi.map(-_)
    val sar = Polynomial.seasonal(1.0 +: mod.sphi.map(-_), mod.m)
    val diff = Polynomial.pow(Array(1.0, -1.0), mod.d)
    val sdiff = Polynomial.pow(Polynomial.seasonal(Array(1.0, -1.0), mod.m), mod.bigD)
    Polynomial.multiply(Polynomial.multiply(ar, sar),
      Polynomial.multiply(diff, sdiff))
  }

  /** Full MA polynomial. */
  private def fullMaPoly(mod: SarimaModel): Array[Double] = {
    val ma = 1.0 +: mod.theta.clone()
    val sma = Polynomial.seasonal(1.0 +: mod.stheta.clone(), mod.m)
    Polynomial.multiply(ma, sma)
  }

  def toAr(mod: SarimaModel, tol: Int): ArLinearModel = {
    val series = Polynomial.divideSeries(fullArPoly(mod), fullMaPoly(mod), tol + 1)
    // series(0) == 1; prediction-form pi_i = -series(i)
    val pi = new Array[Double](tol)
    var i = 1
    while (i <= tol) { pi(i - 1) = -series(i); i += 1 }
    var sumPi = 0.0
    var sumIPi = 0.0
    i = 0
    while (i < tol) { sumPi += pi(i); sumIPi += (i + 1) * pi(i); i += 1 }
    val beta0 = mod.mu * (1.0 - sumPi) + mod.drift * sumIPi
    val beta1 = mod.drift * (1.0 - sumPi)
    ArLinearModel(beta0, beta1, pi, mod.sigma2, mod.n)
  }
}
