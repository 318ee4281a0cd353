package graft.arima

/** One fitted Fourier pair: cos/sin coefficients at harmonic `k` of a
  * seasonal `cycle` (cycle measured in SAMPLES, e.g. 24 for daily on
  * hourly data, 168 for weekly). `dcos`/`dsin` are optional
  * amplitude-drift terms (dynamic harmonic regression): the effective
  * coefficients at phase τ are cos + dcos·(τ/cycle) etc., so a
  * seasonal shape that grows or fades year over year (VT's
  * solar-driven profile) extrapolates into the forecast horizon
  * instead of freezing at the train-average shape.
  */
final case class HarmCoef(cycle: Int, k: Int, cos: Double, sin: Double,
    dcos: Double = 0.0, dsin: Double = 0.0)

/** Fourier seasonal regression — the deterministic-seasonality stage
  * of the chunk fit. A long-AR model alone mean-reverts over a
  * 2,879-step horizon; explicit harmonics carry the daily/weekly
  * shape to any horizon (the standard "Fourier terms + ARMA errors"
  * decomposition, e.g. Hyndman's `fourier()` xreg approach).
  *
  * Phase is τ = time/Δt in absolute sample units, so chunks fit on
  * disjoint time ranges produce phase-aligned coefficients that DLSA
  * can combine named-coefficient-wise. Assumes regular sampling
  * (true of the reference fixtures; harmonics are ill-defined
  * otherwise).
  */
object Seasonal {

  /** (cycle, k) pairs for the requested daily/weekly/yearly harmonic
    * counts (yearly cycle = 365.25 days' worth of samples).
    */
  def pairs(freq: Int, harmDaily: Int, harmWeekly: Int,
      harmYearly: Int = 0): Array[(Int, Int)] =
    ((1 to harmDaily).map(k => (freq, k)) ++
      (1 to harmWeekly).map(k => (7 * freq, k)) ++
      (1 to harmYearly).map(k => ((365.25 * freq).round.toInt, k))).toArray

  /** Σ over pairs of (a + da·u)·cos(2πkτ/cycle) + (b + db·u)·sin(…),
    * u = τ/cycle (amplitude drift in per-cycle units).
    */
  def value(h: Array[HarmCoef], tau: Double): Double = {
    var acc = 0.0
    var i = 0
    while (i < h.length) {
      val w = 2.0 * math.Pi * h(i).k * tau / h(i).cycle
      val u = tau / h(i).cycle
      acc += (h(i).cos + h(i).dcos * u) * math.cos(w) +
        (h(i).sin + h(i).dsin * u) * math.sin(w)
      i += 1
    }
    acc
  }

  /** OLS of y on [1, centered τ, cos/sin per pair] via streaming
    * normal equations (O(n·k) time, O(k²) memory, no design matrix —
    * same discipline as ArFit.olsAr). Intercept and trend are
    * included so the harmonics only absorb the periodic signal, but
    * NOT returned: level and trend stay with the downstream AR
    * stage.
    *
    * Returns empty (no-op) when the series is too short to identify
    * the regressors.
    */
  def fitHarmonics(y: Array[Double], tau: Array[Double],
      ps0: Array[(Int, Int)]): Array[HarmCoef] =
    fitHarmonics(y, tau, ps0, withDrift = false)

  /** @param withDrift also fit per-pair amplitude-drift regressors
    *   u·cos / u·sin (u = τ/cycle) for pairs observed over at least
    *   two full cycles — dynamic harmonic regression.
    */
  def fitHarmonics(y: Array[Double], tau: Array[Double],
      ps0: Array[(Int, Int)], withDrift: Boolean): Array[HarmCoef] = {
    val n = y.length
    if (ps0.isEmpty || n == 0) return Array.empty
    // A pair whose fundamental cycle exceeds the chunk's tau span is
    // near-collinear with the intercept/trend regressors (under one
    // full period observed) — ill-conditioned normal equations. Drop
    // such pairs; lag_idx/name are canonical per (cycle,k), so chunks
    // spanning different ranges still combine coefficient-wise.
    var tauMin = tau(0)
    var tauMax = tau(0)
    var i = 1
    while (i < n) {
      if (tau(i) < tauMin) tauMin = tau(i)
      if (tau(i) > tauMax) tauMax = tau(i)
      i += 1
    }
    val span = tauMax - tauMin
    val ps = ps0.filter { case (cycle, k) => cycle.toDouble / k <= span }
    // Drift terms need ≥ 2 full cycles to separate amplitude change
    // from the shape itself.
    val drift = ps.map { case (cycle, _) =>
      withDrift && 2.0 * cycle <= span
    }
    val offsets = new Array[Int](ps.length)
    var k = 2
    i = 0
    while (i < ps.length) {
      offsets(i) = k
      k += (if (drift(i)) 4 else 2)
      i += 1
    }
    if (ps.isEmpty || n < 2 * k + 4) return Array.empty
    var tauMean = 0.0
    i = 0
    while (i < n) { tauMean += tau(i); i += 1 }
    tauMean /= n
    val xtx = Array.ofDim[Double](k, k)
    val xty = new Array[Double](k)
    val row = new Array[Double](k)
    var t = 0
    while (t < n) {
      row(0) = 1.0
      row(1) = tau(t) - tauMean
      var j = 0
      while (j < ps.length) {
        val w = 2.0 * math.Pi * ps(j)._2 * tau(t) / ps(j)._1
        val o = offsets(j)
        row(o) = math.cos(w)
        row(o + 1) = math.sin(w)
        if (drift(j)) {
          // center the drift regressor: raw u = τ/cycle is huge and
          // nearly constant within a chunk (epoch-scale τ), making
          // u·cos ~collinear with cos and the normal equations
          // ill-conditioned; the fit uses (u − ū)·cos and the
          // coefficients are un-centered back to the absolute
          // convention below
          val u = tau(t) / ps(j)._1 - tauMean / ps(j)._1
          row(o + 2) = u * row(o)
          row(o + 3) = u * row(o + 1)
        }
        j += 1
      }
      var a = 0
      while (a < k) {
        val ra = row(a)
        xty(a) += ra * y(t)
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
    // A singular system (constant series, pathological sampling) makes
    // the harmonic stage a safe no-op rather than an executor crash.
    try {
      val beta = Linalg.solve(xtx, xty)
      Array.tabulate(ps.length) { j =>
        val o = offsets(j)
        if (drift(j)) {
          // un-center: (a + d(u − ū))cos = ((a − d·ū) + d·u)cos
          val uBar = tauMean / ps(j)._1
          HarmCoef(ps(j)._1, ps(j)._2,
            beta(o) - beta(o + 2) * uBar,
            beta(o + 1) - beta(o + 3) * uBar,
            beta(o + 2), beta(o + 3))
        } else HarmCoef(ps(j)._1, ps(j)._2, beta(o), beta(o + 1))
      }
    } catch {
      case _: IllegalArgumentException => Array.empty
    }
  }

  /** Stable coefficient-row names for the DLSA combine ("cos_24_1",
    * "sin_168_2", ...) and their reserved lag_idx slots (distinct
    * negatives below the beta0/beta1 slots). The slot is canonical in
    * (cycle, k) — NOT positional — so chunks that drop different
    * pairs (span guard above) still group per coefficient.
    */
  def coefName(trig: String, cycle: Int, k: Int): String =
    s"${trig}_${cycle}_$k"

  private val variants = Seq("cos", "sin", "dcos", "dsin")

  def lagIdx(cycle: Int, k: Int, trig: String): Int = {
    // 1024-stride keeps (cycle, k, variant) injective up to k < 253;
    // a 128 stride let 4k bleed into the next cycle's slot from k=32
    require(k < 253, s"harmonic k=$k overflows the lag_idx stride")
    -(10 + 1024 * cycle + 4 * k + variants.indexOf(trig))
  }

  def lagIdx(cycle: Int, k: Int, isSin: Boolean): Int =
    lagIdx(cycle, k, if (isSin) "sin" else "cos")

  /** Parse a "cos_24_1"/"dsin_8766_2"-style name; None otherwise. */
  def parseName(name: String): Option[(String, Int, Int)] = {
    val parts = name.split("_")
    if (parts.length == 3 && variants.contains(parts(0)))
      try Some((parts(0), parts(1).toInt, parts(2).toInt))
      catch { case _: NumberFormatException => None }
    else None
  }
}
