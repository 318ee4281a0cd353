package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Darima

/** DLSA combine weighting variants: recency decay must rescale σ²
  * consistently (ADVICE r2 — decaying only the weight denominator
  * inflated the combined variance ~2× at K=10, λ=0.8), and the
  * "seasonal" decay scope must leave the AR dynamics and σ² at their
  * classic pooled values.
  */
class CombineWeightingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def coefTable() = {
    import spark.implicits._
    // 3 chunks × (beta0, sigma2, ar1, cos_24_1) with distinct values
    val rows = for {
      k <- 0 until 3
    } yield Seq(
      (k, "beta0", -2, 10.0 + k, 2.0 + k, 100L),
      (k, "sigma2", Int.MaxValue, 4.0 + k, 2.0 + k, 100L),
      (k, "ar1", 1, 0.1 * (k + 1), 2.0 + k, 100L),
      (k, "cos_24_1", -1546, 1.0 + k, 2.0 + k, 100L))
    rows.flatten.toDF("chunk_id", "coef", "lag_idx", "value", "weight", "n")
  }

  private def valueOf(df: org.apache.spark.sql.DataFrame, coef: String) =
    df.filter(col("coef") === coef).collect()(0).getDouble(2)

  test("recency decay rescales sigma2 consistently (no inflation)") {
    val coefs = coefTable()
    val lam = 0.5
    val out = Darima.combine(coefs, "dlsa", lam, 3)
    // hand-computed with decayed weight AND n: sigma2 = Σλ^j n / Σλ^j w
    val decay = Array(lam * lam, lam, 1.0)
    val w = Array(2.0, 3.0, 4.0)
    val expSigma = (0 until 3).map(k => decay(k) * 100.0).sum /
      (0 until 3).map(k => decay(k) * w(k)).sum
    assert(math.abs(valueOf(out, "sigma2") - expSigma) < 1e-12)
    // and the classic un-decayed sigma2 differs (the old bug would
    // have produced sum(n)/sum(λw) ≈ 2× this)
    val inflated = 300.0 / (0 until 3).map(k => decay(k) * w(k)).sum
    assert(math.abs(valueOf(out, "sigma2") - inflated) > 1.0)
  }

  test("seasonal decay scope pools AR and sigma2, localizes harmonics") {
    val coefs = coefTable()
    val classic = Darima.combine(coefs, "dlsa")
    val scoped = Darima.combine(coefs, "dlsa", 0.1, 3, "seasonal")
    // sigma2 and ar1 identical to classic DLSA
    assert(math.abs(valueOf(scoped, "sigma2") - valueOf(classic, "sigma2")) < 1e-12)
    assert(math.abs(valueOf(scoped, "ar1") - valueOf(classic, "ar1")) < 1e-12)
    // harmonic row shifts toward the newest chunk's value (3.0)
    assert(valueOf(scoped, "cos_24_1") > valueOf(classic, "cos_24_1"))
    assert(math.abs(valueOf(scoped, "cos_24_1") - 3.0) < 0.1)
    // beta0 (lag_idx -2 < 0) also localized
    assert(valueOf(scoped, "beta0") > valueOf(classic, "beta0"))
  }
}
