package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Darima, DarimaConfig}

/** Box–Cox in the pipeline (VERDICT r9 #7): λ selection + transform
  * wrap around the fit, pinned against the x60-oracle-checked
  * Transforms pair at the degenerate λ values and against a manual
  * transform-compose-invert run.
  */
class BoxCoxSpec extends AnyFunSuite {
  import SparkTestSession._

  private def series = Tables.events(spark, sf)
    .select(col("ts").cast("double").as("time"),
      // events values can be ≤ 0 — shift into the transform's
      // domain; the shape is what the fit sees
      (col("value") + lit(1000.0)).as("value"))

  private val cfg = DarimaConfig(numChunks = 2, freq = 24,
    fitter = "olsar", olsP = 2, chunker = "timerange")

  test("λ=1 is the identity up to the shift: forecasts equal the " +
      "untransformed run") {
    val (_, off) = Darima.run(spark, series, h = 12, cfg)
    val (_, lam1) = Darima.run(spark, series, h = 12,
      cfg.copy(boxCox = "1.0"))
    // bc(y, 1) = y − 1 shifts beta0 only; the inverse adds it back
    off.mean.zip(lam1.mean).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(a)),
        s"$a vs $b")
    }
    off.lower(1).zip(lam1.lower(1)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(a)))
    }
  }

  test("λ=0 composes exactly: run(boxCox=0) ≡ exp ∘ run(log series)") {
    val logged = series.select(col("time"),
      graft.ts.Transforms.boxCox(col("value"), 0.0).as("value"))
    val (_, manual) = Darima.run(spark, logged, h = 12, cfg)
    val (_, auto0) = Darima.run(spark, series, h = 12,
      cfg.copy(boxCox = "0.0"))
    manual.mean.zip(auto0.mean).foreach { case (z, y) =>
      assert(math.abs(math.exp(z) - y) < 1e-9 * math.max(1.0, y),
        s"exp($z) vs $y")
    }
    // quantile equivariance: interval bounds are exp of the
    // transformed-scale bounds, exactly
    manual.upper(0).zip(auto0.upper(0)).foreach { case (z, y) =>
      assert(math.abs(math.exp(z) - y) < 1e-9 * math.max(1.0, y))
    }
    // delta-method se: se_y = se_z · exp(z_mean)
    manual.se.indices.foreach { i =>
      assert(math.abs(manual.se(i) * math.exp(manual.mean(i)) -
        auto0.se(i)) < 1e-9 * math.max(1.0, auto0.se(i)))
    }
  }

  test("non-positive series falls back to off instead of NaN-ing") {
    // shift below zero: some values ≤ 0 put λ=0.5 outside its domain
    val raw = Tables.events(spark, sf)
      .select(col("ts").cast("double").as("time"),
        (col("value") - lit(1.0)).as("value"))
    val (_, off) = Darima.run(spark, raw, h = 6, cfg)
    val (_, bc) = Darima.run(spark, raw, h = 6,
      cfg.copy(boxCox = "0.5"))
    off.mean.zip(bc.mean).foreach { case (a, b) => assert(a == b) }
  }

  test("guerrero λ: variance ∝ level² (log-normal-ish) series picks " +
      "λ near 0; additive-noise series picks λ near 1") {
    import spark.implicits._
    // multiplicative: y = level_t · noise, level doubling per block →
    // sd grows with mean → λ → 0 stabilizes
    val mult = spark.range(4800).select(
      col("id").cast("double").as("t"),
      (exp(col("id").cast("double") / lit(800.0)) *
        (lit(1.0) + sin(col("id") * lit(0.7)) * lit(0.2))).as("v"))
    val lamMult = Darima.guerreroLambda(mult, freq = 24)
    assert(lamMult < 0.35, s"multiplicative series chose λ=$lamMult")
    // additive: constant-variance noise on a rising level → λ → 1
    val add = spark.range(4800).select(
      col("id").cast("double").as("t"),
      (col("id").cast("double") / lit(10.0) + lit(100.0) +
        sin(col("id") * lit(0.7)) * lit(5.0)).as("v"))
    val lamAdd = Darima.guerreroLambda(add, freq = 24)
    assert(lamAdd > 0.65, s"additive series chose λ=$lamAdd")
    // degenerate: constant series → identity λ
    val const = spark.range(200).select(
      col("id").cast("double").as("t"), lit(5.0).as("v"))
    assert(Darima.guerreroLambda(const, freq = 24) == 1.0)
  }
}
