package graft.arima

/** Dense univariate polynomial coefficient algebra over Array[Double],
  * index i = coefficient of B^i. This is the engine's replacement for
  * the reference's R `polynom` package usage in the SARIMA → AR(∞)
  * expansion (reference: auto_arima.R:7-67); multiplication is plain
  * coefficient convolution.
  */
object Polynomial {

  /** (p * q) coefficient convolution. */
  def multiply(p: Array[Double], q: Array[Double]): Array[Double] = {
    val out = new Array[Double](p.length + q.length - 1)
    var i = 0
    while (i < p.length) {
      val pi = p(i)
      if (pi != 0.0) {
        var j = 0
        while (j < q.length) {
          out(i + j) += pi * q(j)
          j += 1
        }
      }
      i += 1
    }
    out
  }

  /** p raised to a non-negative integer power (repeated convolution;
    * exponents here are tiny — d, D ≤ 2).
    */
  def pow(p: Array[Double], n: Int): Array[Double] = {
    require(n >= 0, s"negative power $n")
    var acc = Array(1.0)
    var i = 0
    while (i < n) { acc = multiply(acc, p); i += 1 }
    acc
  }

  /** Seasonal embedding: coefficients c0..ck of P(B) become the
    * coefficients of P(B^m) (zeros in between).
    */
  def seasonal(p: Array[Double], m: Int): Array[Double] = {
    require(m >= 1)
    if (m == 1) return p.clone()
    val out = new Array[Double]((p.length - 1) * m + 1)
    var i = 0
    while (i < p.length) { out(i * m) = p(i); i += 1 }
    out
  }

  /** Expand compact multiplicative seasonal orders to prediction-form
    * full coefficient arrays: AR φ(B)Φ(B^m) (length p+mP, sign-flipped
    * to the prediction convention) and MA θ(B)Θ(B^m) (length q+mQ).
    * The ONE shared expansion — the CSS objective (ArimaFit) and the
    * exact-ML filter (Kalman) must agree on the model a compact
    * parameter vector denotes, or likelihood comparisons between the
    * two are meaningless.
    */
  def expandSeasonal(phi: Array[Double], theta: Array[Double],
      sphi: Array[Double], stheta: Array[Double], m: Int)
      : (Array[Double], Array[Double]) = {
    val arFull = multiply(1.0 +: phi.map(-_),
      seasonal(1.0 +: sphi.map(-_), m))
    val maFull = multiply(1.0 +: theta.clone(),
      seasonal(1.0 +: stheta.clone(), m))
    (arFull.drop(1).map(-_), maFull.drop(1))
  }

  /** First `n` series coefficients of num(B) / den(B), den(0) must be
    * non-zero (normalized internally so den(0)=1). Classic power-series
    * long division: c_j = num_j - Σ_{k=1..min(j,deg den)} den_k·c_{j-k}.
    */
  def divideSeries(num: Array[Double], den: Array[Double], n: Int): Array[Double] = {
    require(den.nonEmpty && den(0) != 0.0, "den(0) must be non-zero")
    val d0 = den(0)
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      var acc = if (j < num.length) num(j) else 0.0
      var k = 1
      val kMax = math.min(j, den.length - 1)
      while (k <= kMax) {
        acc -= den(k) * out(j - k)
        k += 1
      }
      out(j) = acc / d0
      j += 1
    }
    out
  }
}
