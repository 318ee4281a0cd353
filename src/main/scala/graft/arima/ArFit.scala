package graft.arima

/** AR / ARMA estimation primitives, all single-pass or
  * O(n·p)-streaming so a chunk fit never materializes an n×p design
  * matrix (the reference builds a 2000×121k lag matrix driver-side,
  * darima.py:320 — SURVEY.md §3.3; we keep memory O(p²)).
  */
object ArFit {

  /** Sample autocovariances γ_0..γ_maxLag (divisor n, standard for
    * Yule–Walker).
    */
  def autocovariances(x: Array[Double], maxLag: Int): Array[Double] = {
    val n = x.length
    var mean = 0.0
    var i = 0
    while (i < n) { mean += x(i); i += 1 }
    mean /= n
    val g = new Array[Double](maxLag + 1)
    var lag = 0
    while (lag <= maxLag) {
      var acc = 0.0
      var t = lag
      while (t < n) { acc += (x(t) - mean) * (x(t - lag) - mean); t += 1 }
      g(lag) = acc / n
      lag += 1
    }
    g
  }

  /** Levinson–Durbin recursion: Yule–Walker AR(k) solutions for all
    * k ≤ maxOrder. Returns (phi(k) arrays indexed by order, innovation
    * variance per order).
    */
  def levinsonDurbin(gamma: Array[Double], maxOrder: Int)
      : (Array[Array[Double]], Array[Double]) = {
    val phis = new Array[Array[Double]](maxOrder + 1)
    val vars = new Array[Double](maxOrder + 1)
    phis(0) = Array.empty[Double]
    vars(0) = gamma(0)
    var k = 1
    while (k <= maxOrder) {
      val prev = phis(k - 1)
      var acc = gamma(k)
      var j = 0
      while (j < k - 1) { acc -= prev(j) * gamma(k - 1 - j); j += 1 }
      val refl = if (vars(k - 1) <= 0.0) 0.0 else acc / vars(k - 1)
      val cur = new Array[Double](k)
      cur(k - 1) = refl
      j = 0
      while (j < k - 1) { cur(j) = prev(j) - refl * prev(k - 2 - j); j += 1 }
      phis(k) = cur
      vars(k) = vars(k - 1) * (1.0 - refl * refl)
      k += 1
    }
    (phis, vars)
  }

  /** OLS fit of the direct linear model
    * y_t = β0 [+ β1·t] + Σ_{i=1..p} π_i·y_{t−i} + ε_t
    * via streaming normal equations (X'X is (p+1+trend)², built in one
    * pass; no design matrix). `t` is 1-based over the full series, so
    * the trend regressor matches the forecast recursion's t = n+i.
    */
  def olsAr(x: Array[Double], p: Int, trend: Boolean): ArLinearModel = {
    val n = x.length
    val k = p + (if (trend) 2 else 1)
    require(n - p > k + 2, s"series too short: n=$n p=$p")
    val xtx = Array.ofDim[Double](k, k)
    val xty = new Array[Double](k)
    val row = new Array[Double](k)
    var t = p
    while (t < n) {
      row(0) = 1.0
      var idx = 1
      if (trend) { row(1) = (t + 1).toDouble; idx = 2 }
      var i = 0
      while (i < p) { row(idx + i) = x(t - 1 - i); i += 1 }
      val y = x(t)
      var a = 0
      while (a < k) {
        val ra = row(a)
        xty(a) += ra * y
        var b = a
        while (b < k) { xtx(a)(b) += ra * row(b); b += 1 }
        a += 1
      }
      t += 1
    }
    var a = 0
    while (a < k) {
      var b = 0
      while (b < a) { xtx(a)(b) = xtx(b)(a); b += 1 }
      a += 1
    }
    val beta = Linalg.solve(xtx.map(_.clone()), xty.clone())
    // residual variance (second streaming pass)
    var sse = 0.0
    t = p
    while (t < n) {
      var pred = beta(0)
      var idx = 1
      if (trend) { pred += beta(1) * (t + 1); idx = 2 }
      var i = 0
      while (i < p) { pred += beta(idx + i) * x(t - 1 - i); i += 1 }
      val e = x(t) - pred
      sse += e * e
      t += 1
    }
    val dof = math.max(1, n - p - k)
    val pi = new Array[Double](p)
    val off = if (trend) 2 else 1
    var i = 0
    while (i < p) { pi(i) = beta(off + i); i += 1 }
    ArLinearModel(beta(0), if (trend) beta(1) else 0.0, pi, sse / dof, n.toLong)
  }

  /** AICc for a conditional-likelihood Gaussian fit. */
  def aicc(n: Int, sigma2: Double, nParams: Int): Double = {
    val k = nParams + 1 // + variance
    if (n - k - 1 <= 0) Double.PositiveInfinity
    else n * math.log(math.max(sigma2, 1e-300)) +
      2.0 * k * n.toDouble / (n - k - 1)
  }

  /** Pick the AICc-best AR order given per-order innovation
    * variances (from [[levinsonDurbin]]). Shared by the long-AR
    * fitter and any caller doing Yule–Walker selection.
    */
  def bestOrderByAicc(vars: Array[Double], n: Int): Int = {
    var best = 0
    var bestCrit = Double.PositiveInfinity
    var p = 0
    while (p < vars.length) {
      val crit = aicc(n, vars(p), p + 1)
      if (crit < bestCrit - 1e-12) { bestCrit = crit; best = p }
      p += 1
    }
    best
  }
}
