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
    dcos: Double = 0.0, dsin: Double = 0.0,
    mcycle: Int = 0, mk: Int = 0, msin: Boolean = false) {
  /** Modulation factor at phase τ: 1 for a plain pair; cos/sin of the
    * modulator harmonic for an interaction pair (see [[Seasonal]]'s
    * "modulated pairs" note).
    */
  def modFactor(tau: Double): Double =
    if (mcycle <= 0) 1.0
    else {
      val wm = 2.0 * math.Pi * mk * tau / mcycle
      if (msin) math.sin(wm) else math.cos(wm)
    }
}

/** One requested regressor pair: harmonic `k` of `cycle`, optionally
  * multiplied by cos (msin=false) or sin (msin=true) of harmonic `mk`
  * of the modulator `mcycle`. A (cycle, k, mcycle, mk) interaction
  * needs BOTH the cos- and sin-modulated specs to span the sideband
  * space cos(k·ω ± mk·ω_m).
  */
final case class HarmSpec(cycle: Int, k: Int, mcycle: Int = 0,
    mk: Int = 0, msin: Boolean = false)

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

  /** Full regressor-spec set: the plain daily/weekly/yearly pairs
    * plus daily×yearly interaction pairs — the first `modDaily` daily
    * harmonics each modulated by the first `modYearly` yearly
    * harmonics (both the cos- and sin-modulated spec per
    * combination). The interactions are the sidebands
    * cos(k·ω_d ± j·ω_y): they let the fitted diurnal SHAPE vary with
    * the season (a winter double-peak vs a summer single peak), which
    * a plain Fourier skeleton averages away — measured, that average
    * is the whole long-horizon accuracy gap between the sarima path
    * and the adaptive long-AR (RESULTS.md round 7).
    */
  def specs(freq: Int, harmDaily: Int, harmWeekly: Int, harmYearly: Int,
      modDaily: Int, modYearly: Int): Array[HarmSpec] = {
    val yc = (365.25 * freq).round.toInt
    val base = pairs(freq, harmDaily, harmWeekly, harmYearly)
      .map { case (c, k) => HarmSpec(c, k) }
    // modulated pairs are NOT capped at harmDaily: a sideband is a
    // regressor in its own right (the base pair need not be present),
    // and silently discarding an explicit modDaily would be the
    // config-ignoring trap this engine avoids elsewhere
    val mods = for {
      k <- 1 to modDaily
      j <- 1 to modYearly
      s <- Seq(false, true)
    } yield HarmSpec(freq, k, yc, j, s)
    base ++ mods
  }

  /** Σ over pairs of f_m(τ)·[(a + da·u)·cos(2πkτ/cycle) +
    * (b + db·u)·sin(…)], u = τ/cycle (amplitude drift in per-cycle
    * units), f_m the modulation factor (1 for plain pairs).
    */
  def value(h: Array[HarmCoef], tau: Double): Double = {
    var acc = 0.0
    var i = 0
    while (i < h.length) {
      val w = 2.0 * math.Pi * h(i).k * tau / h(i).cycle
      val u = tau / h(i).cycle
      acc += h(i).modFactor(tau) *
        ((h(i).cos + h(i).dcos * u) * math.cos(w) +
          (h(i).sin + h(i).dsin * u) * math.sin(w))
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

  def fitHarmonics(y: Array[Double], tau: Array[Double],
      ps0: Array[(Int, Int)], withDrift: Boolean): Array[HarmCoef] =
    fitHarmonics(y, tau,
      ps0.map { case (c, k) => HarmSpec(c, k) }, withDrift)

  /** @param withDrift also fit per-pair amplitude-drift regressors
    *   u·cos / u·sin (u = τ/cycle) for pairs observed over at least
    *   two full cycles — dynamic harmonic regression. Drift never
    *   applies to modulated pairs (the modulator already carries the
    *   slow amplitude variation).
    */
  def fitHarmonics(y: Array[Double], tau: Array[Double],
      specs0: Array[HarmSpec], withDrift: Boolean): Array[HarmCoef] =
    fitHarmonicsCore(y, tau, specs0, withDrift, Array.empty)

  /** GLS refit of the harmonic regression under an AR error model —
    * the joint-estimation step of "Fourier terms + ARMA errors"
    * (Hyndman's fourier+xreg): both y and every regressor column are
    * whitened by the error model's AR(∞) filter
    * xf_t = x_t − Σ πᵢ x_{t−i} before the normal equations, so the
    * harmonic coefficients are estimated in the metric where the
    * errors are (approximately) white instead of the OLS metric where
    * strongly autocorrelated errors drown the low-frequency pairs.
    * One Cochrane–Orcutt-style iteration: OLS → fit errors → GLS
    * refit → refit errors (the caller owns the loop). Returns empty
    * when the whitened sample cannot identify the regressors — the
    * caller keeps the OLS fit.
    */
  def fitHarmonicsGls(y: Array[Double], tau: Array[Double],
      specs0: Array[HarmSpec], withDrift: Boolean,
      pi: Array[Double]): Array[HarmCoef] = {
    // trim the π tail: a linearized pure-AR carries tol≈2000 slots of
    // exact zeros past lag p, and the filter cost is O(n·L·k)
    var last = pi.length - 1
    while (last >= 0 && math.abs(pi(last)) < 1e-12) last -= 1
    fitHarmonicsCore(y, tau, specs0, withDrift, pi.take(last + 1))
  }

  private def fitHarmonicsCore(y: Array[Double], tau: Array[Double],
      specs0: Array[HarmSpec], withDrift: Boolean,
      pi: Array[Double]): Array[HarmCoef] = {
    val ps0 = specs0
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
    // A modulated pair additionally needs its MODULATOR's period in
    // span: under one full modulator cycle the factor is near-constant
    // and the interaction collapses onto the base pair (collinear).
    val ps = ps0.filter { s =>
      s.cycle.toDouble / s.k <= span &&
        (s.mcycle == 0 || s.mcycle.toDouble / s.mk <= span)
    }
    // Drift terms need ≥ 2 full cycles to separate amplitude change
    // from the shape itself.
    val drift = ps.map { s =>
      withDrift && 2.0 * s.cycle <= span && s.mcycle == 0
    }
    val offsets = new Array[Int](ps.length)
    var k = 2
    i = 0
    while (i < ps.length) {
      offsets(i) = k
      k += (if (drift(i)) 4 else 2)
      i += 1
    }
    val L = pi.length
    if (ps.isEmpty || n - L < 2 * k + 4) return Array.empty
    var tauMean = 0.0
    i = 0
    while (i < n) { tauMean += tau(i); i += 1 }
    tauMean /= n
    val xtx = Array.ofDim[Double](k, k)
    val xty = new Array[Double](k)
    val row = new Array[Double](k)
    // whitening ring buffer of the last L design rows (L = 0 → OLS)
    val ring = if (L > 0) Array.ofDim[Double](L, k) else null
    val rowF = if (L > 0) new Array[Double](k) else row
    var t = 0
    while (t < n) {
      row(0) = 1.0
      row(1) = tau(t) - tauMean
      var j = 0
      while (j < ps.length) {
        val w = 2.0 * math.Pi * ps(j).k * tau(t) / ps(j).cycle
        val o = offsets(j)
        val f = if (ps(j).mcycle <= 0) 1.0 else {
          val wm = 2.0 * math.Pi * ps(j).mk * tau(t) / ps(j).mcycle
          if (ps(j).msin) math.sin(wm) else math.cos(wm)
        }
        row(o) = f * math.cos(w)
        row(o + 1) = f * math.sin(w)
        if (drift(j)) {
          // center the drift regressor: raw u = τ/cycle is huge and
          // nearly constant within a chunk (epoch-scale τ), making
          // u·cos ~collinear with cos and the normal equations
          // ill-conditioned; the fit uses (u − ū)·cos and the
          // coefficients are un-centered back to the absolute
          // convention below
          val u = tau(t) / ps(j).cycle - tauMean / ps(j).cycle
          row(o + 2) = u * row(o)
          row(o + 3) = u * row(o + 1)
        }
        j += 1
      }
      var yv = y(t)
      var include = true
      if (L > 0) {
        if (t >= L) {
          var a = 0
          while (a < k) { rowF(a) = row(a); a += 1 }
          var l = 1
          while (l <= L) {
            val p = pi(l - 1)
            if (p != 0.0) {
              val past = ring((t - l) % L)
              yv -= p * y(t - l)
              a = 0
              while (a < k) { rowF(a) -= p * past(a); a += 1 }
            }
            l += 1
          }
        } else include = false
        // the current raw row replaces the oldest slot AFTER use
        System.arraycopy(row, 0, ring(t % L), 0, k)
      }
      if (include) {
        var a = 0
        while (a < k) {
          val ra = rowF(a)
          xty(a) += ra * yv
          var b = a
          while (b < k) { xtx(a)(b) += ra * rowF(b); b += 1 }
          a += 1
        }
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
          val uBar = tauMean / ps(j).cycle
          HarmCoef(ps(j).cycle, ps(j).k,
            beta(o) - beta(o + 2) * uBar,
            beta(o + 1) - beta(o + 3) * uBar,
            beta(o + 2), beta(o + 3))
        } else HarmCoef(ps(j).cycle, ps(j).k, beta(o), beta(o + 1),
          0.0, 0.0, ps(j).mcycle, ps(j).mk, ps(j).msin)
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

  /** Mod-aware name: a modulated pair appends the modulator —
    * "cos_24_1_mc_8766_1" (mc = cos-modulated, ms = sin-modulated).
    */
  def coefName(trig: String, h: HarmCoef): String =
    if (h.mcycle <= 0) coefName(trig, h.cycle, h.k)
    else s"${trig}_${h.cycle}_${h.k}_m${if (h.msin) "s" else "c"}_" +
      s"${h.mcycle}_${h.mk}"

  private val variants = Seq("cos", "sin", "dcos", "dsin")

  def lagIdx(cycle: Int, k: Int, trig: String): Int = {
    // 1024-stride keeps (cycle, k, variant) injective up to k < 253;
    // a 128 stride let 4k bleed into the next cycle's slot from k=32.
    // Cycles stay under 48000 so the plain range never reaches the
    // modulated pairs' slot range below.
    require(k < 253, s"harmonic k=$k overflows the lag_idx stride")
    require(cycle < 48000, s"cycle=$cycle overflows the lag_idx range")
    -(10 + 1024 * cycle + 4 * k + variants.indexOf(trig))
  }

  def lagIdx(cycle: Int, k: Int, isSin: Boolean): Int =
    lagIdx(cycle, k, if (isSin) "sin" else "cos")

  /** Mod-aware slot: modulated pairs live in their own negative range
    * (base −5·10⁷, beyond any plain cycle's slots), injective in
    * (k, mk, trig, msin). The daily/yearly cycle lengths are the
    * same for every chunk of one job, so they need no slot bits —
    * the NAME carries them for the human-readable round trip.
    */
  def lagIdx(h: HarmCoef, trig: String): Int =
    if (h.mcycle <= 0) lagIdx(h.cycle, h.k, trig)
    else {
      require(h.k < 253 && h.mk < 253,
        s"modulated harmonic (k=${h.k}, mk=${h.mk}) overflows the slot")
      -(50000000 + 4096 * h.k + 16 * h.mk +
        2 * variants.indexOf(trig) + (if (h.msin) 1 else 0))
    }

  /** Parse a "cos_24_1"/"dsin_8766_2"-style name; None otherwise
    * (modulated names parse only through [[parseNameFull]]).
    */
  def parseName(name: String): Option[(String, Int, Int)] =
    parseNameFull(name).collect {
      case (trig, s) if s.mcycle == 0 => (trig, s.cycle, s.k)
    }

  /** Parse any harmonic coefficient name, plain or modulated, into
    * (trig variant, full pair spec).
    */
  def parseNameFull(name: String): Option[(String, HarmSpec)] = {
    val parts = name.split("_")
    try {
      if (parts.length == 3 && variants.contains(parts(0)))
        Some((parts(0), HarmSpec(parts(1).toInt, parts(2).toInt)))
      else if (parts.length == 6 && variants.contains(parts(0)) &&
          (parts(3) == "mc" || parts(3) == "ms"))
        Some((parts(0), HarmSpec(parts(1).toInt, parts(2).toInt,
          parts(4).toInt, parts(5).toInt, parts(3) == "ms")))
      else None
    } catch { case _: NumberFormatException => None }
  }
}
