package graft.arima

/** Exact Gaussian likelihood of an ARMA(p,q)+mean model via the
  * Kalman filter — the ML refinement step `forecast::auto.arima`
  * applies after its CSS approximation (reference reaches it through
  * R's stats::arima; here it is ~100 lines of Scala on the same
  * state-space form).
  *
  * State space (Harvey): state dim r = max(p, q+1);
  *   α_{t+1} = T α_t + R ε_t,   y_t − c = Z α_t,
  * with T carrying φ in its first column + superdiagonal identity,
  * R = [1, θ_1, …, θ_{r−1}], Z = [1, 0, …]. The initial state
  * covariance is the exact stationary solution of
  * P = T P T' + R R' (solved as a vec-form linear system), so the
  * first q+p innovations are weighted exactly — the part CSS throws
  * away, and the reason CSS is biased on short or near-unit-root
  * chunks.
  *
  * For optimization the likelihood is concentrated over σ² in
  * Ansley–Newbold form: minimizing Σ(v²/f) · (Π f)^{1/n} equals
  * maximizing the exact log-likelihood, and the residual vector
  * e_t = (v_t/√f_t) · (Π f)^{1/2n} turns that objective into a plain
  * sum of squares — so the same Levenberg–Marquardt core that drives
  * the CSS fit drives exact ML.
  */
object Kalman {

  /** Innovations pass: returns (v, f) — one-step prediction errors
    * and their variances (σ² = 1 scale) — or None if the AR part is
    * non-stationary (no stationary P exists).
    */
  def innovations(y: Array[Double], c: Double, phi: Array[Double],
      theta: Array[Double]): Option[(Array[Double], Array[Double])] =
    innovations(y, c, phi, theta, 0.0)

  /** As above, with an optional steady-state cutover: for a
    * stationary model the prediction covariance P converges to a
    * fixed point, after which the gain and innovation variance are
    * constants — once the step-to-step change in f falls below
    * `steadyTol` (relative), the filter freezes (K, f) and each
    * remaining step is O(r) instead of O(r²). This is what makes the
    * exact likelihood affordable for seasonal models, whose expanded
    * state dimension is r = max(p+mP, q+mQ+1) (≈ 50 at m = 24).
    * `steadyTol = 0` disables the cutover (bit-identical to the
    * original filter — the non-seasonal path keeps using that).
    */
  def innovations(y: Array[Double], c: Double, phi: Array[Double],
      theta: Array[Double], steadyTol: Double)
      : Option[(Array[Double], Array[Double])] = {
    val p = phi.length
    val q = theta.length
    val r = math.max(p, q + 1)
    val n = y.length
    // T: first column = φ (padded), superdiagonal ones. R vector.
    val tPhi = Array.tabulate(r)(i => if (i < p) phi(i) else 0.0)
    val rv = Array.tabulate(r)(i =>
      if (i == 0) 1.0 else if (i - 1 < q) theta(i - 1) else 0.0)
    // Stationary P = Σ_j T^j R R' T'^j. Two routes:
    //  - steadyTol == 0 (non-seasonal path): exact vec-form solve
    //    vec(P) = (I − T⊗T)^{-1} vec(R R') — O(r⁶) but r ≤ ~20 there,
    //    and bit-identical to the original filter.
    //  - steadyTol > 0 (seasonal path, r ≈ 50): the vec solve's r²×r²
    //    elimination would dominate every likelihood evaluation
    //    (~6e9 flops at r=51); a doubling iteration (P += A P A',
    //    A ← A², quadratically convergent for a stationary T) gets
    //    the same fixed point in O(r³ log) and doubles as the
    //    stationarity test (divergence → None).
    val rr = r * r
    val pMat = Array.ofDim[Double](r, r)
    var i = 0
    if (steadyTol > 0.0) {
      if (!stationaryPByDoubling(tPhi, rv, pMat)) return None
    } else {
      val a = Array.ofDim[Double](rr, rr)
      val b = new Array[Double](rr)
      // T(i)(j): column 0 = tPhi(i); T(i)(i+1) = 1
      def tAt(i: Int, j: Int): Double =
        (if (j == 0) tPhi(i) else 0.0) + (if (j == i + 1) 1.0 else 0.0)
      i = 0
      while (i < r) {
        var j = 0
        while (j < r) {
          val row = i * r + j
          var k = 0
          while (k < r) {
            var l = 0
            while (l < r) {
              val v = tAt(i, k) * tAt(j, l)
              if (v != 0.0) a(row)(k * r + l) -= v
              l += 1
            }
            k += 1
          }
          a(row)(row) += 1.0
          b(row) = rv(i) * rv(j)
          j += 1
        }
        i += 1
      }
      try {
        val vecP = Linalg.solve(a, b)
        var ok = true
        i = 0
        while (i < r) {
          var j = 0
          while (j < r) {
            val v = vecP(i * r + j)
            if (v.isNaN || v.isInfinite) ok = false
            pMat(i)(j) = v
            j += 1
          }
          i += 1
        }
        if (!ok || pMat(0)(0) < 0.0) return None
      } catch { case _: IllegalArgumentException => return None }
    }

    val alpha = new Array[Double](r)
    val v = new Array[Double](n)
    val f = new Array[Double](n)
    val tp = Array.ofDim[Double](r, r) // scratch: T P
    val kGain = new Array[Double](r)
    var steady = false
    var fPrev = Double.NaN
    var t = 0
    while (t < n) {
      val ft = if (steady) fPrev else pMat(0)(0)
      if (ft <= 1e-300 || ft.isNaN) return None
      val vt = y(t) - c - alpha(0)
      v(t) = vt
      f(t) = ft
      if (!steady) {
        // K = T P Z' / f ; α ← T α + K v ; P ← T P T' + R R' − K f K'
        i = 0
        while (i < r) {
          var acc = tPhi(i) * pMat(0)(0)
          if (i + 1 < r) acc += pMat(i + 1)(0)
          kGain(i) = acc / ft
          i += 1
        }
        // T P into tp
        i = 0
        while (i < r) {
          var j = 0
          while (j < r) {
            var acc = tPhi(i) * pMat(0)(j)
            if (i + 1 < r) acc += pMat(i + 1)(j)
            tp(i)(j) = acc
            j += 1
          }
          i += 1
        }
        // P ← tp T' + R R' − K f K'
        i = 0
        while (i < r) {
          var j = 0
          while (j < r) {
            var acc = tPhi(j) * tp(i)(0)
            if (j + 1 < r) acc += tp(i)(j + 1)
            pMat(i)(j) = acc + rv(i) * rv(j) - kGain(i) * ft * kGain(j)
            j += 1
          }
          i += 1
        }
        if (steadyTol > 0.0 && !fPrev.isNaN &&
          math.abs(ft - fPrev) <= steadyTol * ft) steady = true
        fPrev = ft
      }
      // α ← T α + K v (K frozen once steady)
      val a0 = alpha.clone()
      i = 0
      while (i < r) {
        var acc = tPhi(i) * a0(0)
        if (i + 1 < r) acc += a0(i + 1)
        alpha(i) = acc + kGain(i) * vt
        i += 1
      }
      t += 1
    }
    Some((v, f))
  }

  /** Doubling iteration for the stationary covariance: with
    * Q₀ = R R', A₀ = T, the updates P ← P + A P A', A ← A² give
    * P_k = Σ_{j<2^k} T^j R R' T'^j, converging quadratically when T
    * is stable. Writes the fixed point into `out`; returns false
    * (non-stationary) if the series diverges or fails to settle.
    */
  private def stationaryPByDoubling(tPhi: Array[Double],
      rv: Array[Double], out: Array[Array[Double]]): Boolean = {
    val r = tPhi.length
    // A starts as the structured T (column 0 = tPhi, superdiagonal 1)
    var aM = Array.tabulate(r, r)((i, j) =>
      (if (j == 0) tPhi(i) else 0.0) + (if (j == i + 1) 1.0 else 0.0))
    var i = 0
    while (i < r) {
      var j = 0
      while (j < r) { out(i)(j) = rv(i) * rv(j); j += 1 }
      i += 1
    }
    val tmp = Array.ofDim[Double](r, r)
    def matmul(x: Array[Array[Double]], y: Array[Array[Double]])
        : Array[Array[Double]] = {
      val z = Array.ofDim[Double](r, r)
      var i = 0
      while (i < r) {
        var k = 0
        while (k < r) {
          val v = x(i)(k)
          if (v != 0.0) {
            var j = 0
            while (j < r) { z(i)(j) += v * y(k)(j); j += 1 }
          }
          k += 1
        }
        i += 1
      }
      z
    }
    var iter = 0
    while (iter < 64) {
      // tmp = A P A'
      val ap = matmul(aM, out)
      var maxAdd = 0.0
      var maxP = 0.0
      i = 0
      while (i < r) {
        var j = 0
        while (j < r) {
          var acc = 0.0
          var k = 0
          while (k < r) { acc += ap(i)(k) * aM(j)(k); k += 1 }
          tmp(i)(j) = acc
          val m1 = math.abs(acc)
          if (m1 > maxAdd) maxAdd = m1
          val m2 = math.abs(out(i)(j))
          if (m2 > maxP) maxP = m2
          j += 1
        }
        i += 1
      }
      if (maxAdd.isNaN || maxAdd.isInfinite || maxP > 1e100) return false
      i = 0
      while (i < r) {
        var j = 0
        while (j < r) { out(i)(j) += tmp(i)(j); j += 1 }
        i += 1
      }
      if (maxAdd <= 1e-15 * math.max(maxP, 1e-300))
        return out(0)(0) >= 0.0 && !out(0)(0).isNaN
      aM = matmul(aM, aM)
      iter += 1
    }
    false
  }

  /** Exact −2·log-likelihood with σ² concentrated out:
    * n·log σ̂² + Σ log f + n(1+log 2π), σ̂² = (1/n)Σ v²/f.
    */
  def negTwoLogLik(y: Array[Double], c: Double, phi: Array[Double],
      theta: Array[Double]): Double =
    innovations(y, c, phi, theta) match {
      case None => Double.PositiveInfinity
      case Some((v, f)) =>
        val n = y.length
        var s = 0.0
        var lf = 0.0
        var i = 0
        while (i < n) { s += v(i) * v(i) / f(i); lf += math.log(f(i)); i += 1 }
        val sig = s / n
        if (sig <= 0) Double.PositiveInfinity
        else n * math.log(sig) + lf + n * (1.0 + math.log(2.0 * math.Pi))
    }

  /** Ansley-form residuals whose sum of squares is the concentrated
    * likelihood objective: e_t = (v_t/√f_t)·(Π f)^{1/2n}. Infinite
    * entries signal a non-stationary candidate to the optimizer.
    */
  def mlResiduals(y: Array[Double], b: Array[Double], p: Int,
      q: Int): Array[Double] = {
    val c = b(0)
    val phi = java.util.Arrays.copyOfRange(b, 1, 1 + p)
    val theta = java.util.Arrays.copyOfRange(b, 1 + p, 1 + p + q)
    innovations(y, c, phi, theta) match {
      case None => Array.fill(y.length)(1e150)
      case Some((v, f)) =>
        val n = y.length
        var lf = 0.0
        var i = 0
        while (i < n) { lf += math.log(f(i)); i += 1 }
        val scale = math.exp(lf / (2.0 * n))
        Array.tabulate(n)(t => v(t) / math.sqrt(f(t)) * scale)
    }
  }

  /** σ̂² at the given parameters (exact-ML residual variance). */
  def sigma2(y: Array[Double], c: Double, phi: Array[Double],
      theta: Array[Double]): Double =
    innovations(y, c, phi, theta) match {
      case None => Double.NaN
      case Some((v, f)) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * v(i) / f(i); i += 1 }
        s / v.length
    }

  // ---- multiplicative seasonal models on the EXPANDED state ------
  // φ(B)Φ(B^m) / θ(B)Θ(B^m) expand (Polynomial convolution) to a
  // plain ARMA(p+mP, q+mQ); the filter runs on that state with the
  // steady-state cutover (state dim ≈ 50 at m = 24 — exact start-up
  // weighting where it matters, O(r) once the gain converges). This
  // is R arima()'s CSS-ML treatment of seasonal models.

  private val seasonalSteadyTol = 1e-12

  private def expandSeasonal(b: Array[Double], p: Int, q: Int, sp: Int,
      sq: Int, m: Int): (Double, Array[Double], Array[Double]) = {
    val phi = java.util.Arrays.copyOfRange(b, 1, 1 + p)
    val theta = java.util.Arrays.copyOfRange(b, 1 + p, 1 + p + q)
    val sphi = java.util.Arrays.copyOfRange(b, 1 + p + q, 1 + p + q + sp)
    val stheta = java.util.Arrays.copyOfRange(b, 1 + p + q + sp,
      1 + p + q + sp + sq)
    val (phiF, thetaF) =
      Polynomial.expandSeasonal(phi, theta, sphi, stheta, m)
    (b(0), phiF, thetaF)
  }

  /** Ansley-form exact-ML residuals for a compact seasonal parameter
    * vector b = (c, φ, θ, Φ, Θ).
    */
  def seasonalMlResiduals(y: Array[Double], b: Array[Double], p: Int,
      q: Int, sp: Int, sq: Int, m: Int): Array[Double] = {
    val (c, phiF, thetaF) = expandSeasonal(b, p, q, sp, sq, m)
    innovations(y, c, phiF, thetaF, seasonalSteadyTol) match {
      case None => Array.fill(y.length)(1e150)
      case Some((v, f)) =>
        val n = y.length
        var lf = 0.0
        var i = 0
        while (i < n) { lf += math.log(f(i)); i += 1 }
        val scale = math.exp(lf / (2.0 * n))
        Array.tabulate(n)(t => v(t) / math.sqrt(f(t)) * scale)
    }
  }

  /** Exact −2·log-likelihood of a compact seasonal parameter vector. */
  def seasonalNegTwoLogLik(y: Array[Double], b: Array[Double], p: Int,
      q: Int, sp: Int, sq: Int, m: Int): Double = {
    val (c, phiF, thetaF) = expandSeasonal(b, p, q, sp, sq, m)
    innovations(y, c, phiF, thetaF, seasonalSteadyTol) match {
      case None => Double.PositiveInfinity
      case Some((v, f)) =>
        val n = y.length
        var s = 0.0
        var lf = 0.0
        var i = 0
        while (i < n) { s += v(i) * v(i) / f(i); lf += math.log(f(i)); i += 1 }
        val sig = s / n
        if (sig <= 0) Double.PositiveInfinity
        else n * math.log(sig) + lf + n * (1.0 + math.log(2.0 * math.Pi))
    }
  }

  /** Exact-ML σ̂² of a compact seasonal parameter vector. */
  def seasonalSigma2(y: Array[Double], b: Array[Double], p: Int,
      q: Int, sp: Int, sq: Int, m: Int): Double = {
    val (c, phiF, thetaF) = expandSeasonal(b, p, q, sp, sq, m)
    innovations(y, c, phiF, thetaF, seasonalSteadyTol) match {
      case None => Double.NaN
      case Some((v, f)) =>
        var s = 0.0
        var i = 0
        while (i < v.length) { s += v(i) * v(i) / f(i); i += 1 }
        s / v.length
    }
  }
}
