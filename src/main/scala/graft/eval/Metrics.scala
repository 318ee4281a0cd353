package graft.eval

/** Forecast-accuracy metrics (reference: darima.py:425-488), with the
  * paper-correct seasonal-naïve MASE denominator: the reference's
  * np.diff(train, m) applies the difference operator m times instead
  * of a lag-m difference (SURVEY.md §1.4.4); here the scaling is
  * mean |y_t − y_{t−m}| over the training series.
  *
  * DataFrame/SQL-expressible forms of these same formulas live in
  * graft.queries.Relational (q12/q13) so they are oracle-checkable.
  */
object Metrics {

  /** Seasonal-naïve in-sample MAE — the MASE/MSIS scaling term.
    * NaN when the train series has no lag-m pair (length ≤ m), the
    * same contract as the distributed Darima.seasonalNaiveScaleDF:
    * downstream metrics go NaN and Metrics.mean skips them.
    */
  def seasonalNaiveScale(train: Array[Double], m: Int): Double = {
    if (train.length <= m) return Double.NaN
    var acc = 0.0
    var t = m
    while (t < train.length) { acc += math.abs(train(t) - train(t - m)); t += 1 }
    acc / (train.length - m)
  }

  def mase(train: Array[Double], test: Array[Double], pred: Array[Double],
      m: Int): Array[Double] =
    maseScaled(test, pred, seasonalNaiveScale(train, m))

  /** MASE from a precomputed scale — the distributed-eval form: the
    * scale comes from one aggregate over the train series
    * (Darima.seasonalNaiveScaleDF), so the train data itself never
    * reaches the driver.
    */
  def maseScaled(test: Array[Double], pred: Array[Double],
      scale: Double): Array[Double] =
    Array.tabulate(test.length)(i => math.abs(test(i) - pred(i)) / scale)

  def smape(test: Array[Double], pred: Array[Double]): Array[Double] =
    Array.tabulate(test.length) { i =>
      val denom = (math.abs(test(i)) + math.abs(pred(i))) / 2.0
      if (denom == 0.0) 0.0 else math.abs(test(i) - pred(i)) / denom
    }

  /** Mean Scaled Interval Score at confidence `level` (percent). */
  def msis(train: Array[Double], test: Array[Double], lower: Array[Double],
      upper: Array[Double], level: Int, m: Int): Array[Double] =
    msisScaled(test, lower, upper, level, seasonalNaiveScale(train, m))

  /** MSIS from a precomputed scale (see [[maseScaled]]). */
  def msisScaled(test: Array[Double], lower: Array[Double],
      upper: Array[Double], level: Int, s: Double): Array[Double] = {
    val alpha = (100.0 - level) / 100.0
    Array.tabulate(test.length) { i =>
      var v = upper(i) - lower(i)
      if (test(i) < lower(i)) v += (2.0 / alpha) * (lower(i) - test(i))
      if (test(i) > upper(i)) v += (2.0 / alpha) * (test(i) - upper(i))
      v / s
    }
  }

  def mean(xs: Array[Double]): Double = {
    var acc = 0.0
    var n = 0
    var i = 0
    while (i < xs.length) {
      if (!xs(i).isNaN) { acc += xs(i); n += 1 }
      i += 1
    }
    if (n == 0) Double.NaN else acc / n
  }
}
