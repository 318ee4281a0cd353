package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Darima, DarimaConfig}

/** Fleet-path parity: `Darima.runMany` (every series in ONE Catalyst
  * plan, VERDICT r9 #1) must reproduce the per-series `Darima.run`
  * results under the same deterministic chunker — the fit code is
  * shared verbatim (`fitOneChunk` / `combineKeyed`), so any drift
  * would mean the fleet plumbing (per-series chunk bounds, keyed
  * combine, tails, anchoring) changed semantics.
  */
class MultiseriesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def series(sid: String) = Tables.events(spark, sf)
    .filter(col("event_type") === sid)
    .select(col("ts").cast("double").as("time"), col("value"))

  private def fleet = Tables.events(spark, sf)
    .select(col("event_type").as("sid"),
      col("ts").cast("double").as("time"), col("value"))

  private val types = Seq("click", "error", "purchase", "signup", "view")

  private def relErr(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("fleet of one series ≡ single-series run (olsar, timerange)") {
    val cfg = DarimaConfig(numChunks = 4, freq = 24, fitter = "olsar",
      olsP = 2, chunker = "timerange")
    val one = series("click")
    val (m1, f1) = Darima.run(spark, one, h = 12, cfg)
    val many = Darima.runMany(spark,
      one.select(lit("click").as("sid"), col("time"), col("value")),
      h = 12, cfg)
    assert(many.keySet == Set("click"))
    val (m2, f2) = many("click")
    assert(m1.beta0 == m2.beta0 && m1.sigma2 == m2.sigma2)
    assert(m1.pi.sameElements(m2.pi))
    assert(f1.mean.sameElements(f2.mean))
    assert(f1.se.sameElements(f2.se))
  }

  test("5-series fleet matches 5 per-series runs (longar + harmonics)") {
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "longar",
      maxLag = 6, tol = 16, harmDaily = 1, chunker = "timerange")
    val many = Darima.runMany(spark, fleet, h = 8, cfg)
    assert(many.keySet == types.toSet)
    types.foreach { t =>
      val (m1, f1) = Darima.run(spark, series(t), h = 8, cfg)
      val (m2, f2) = many(t)
      assert(m1.pi.length == m2.pi.length, s"$t: p differs")
      m1.pi.zip(m2.pi).foreach { case (a, b) =>
        assert(relErr(a, b) < 1e-9, s"$t pi: $a vs $b")
      }
      assert(relErr(m1.beta0, m2.beta0) < 1e-9, s"$t beta0")
      assert(relErr(m1.sigma2, m2.sigma2) < 1e-9, s"$t sigma2")
      assert(m1.harmonics.length == m2.harmonics.length, s"$t harms")
      f1.mean.zip(f2.mean).foreach { case (a, b) =>
        assert(relErr(a, b) < 1e-7, s"$t mean: $a vs $b")
      }
    }
  }

  test("tailsMany ≡ per-series seriesTailTimed") {
    val named = fleet.select(col("sid"), col("time").as("t"),
      col("value").as("v"))
    val tails = Darima.tailsMany(named, 7)
    types.foreach { t =>
      val want = Darima.seriesTailTimed(series(t), 7)
      val got = tails(t)
      assert(got.length == want.length, s"$t tail length")
      got.zip(want).foreach { case (a, b) => assert(a == b, s"$t tail") }
    }
  }

  test("seasonalNaiveScaleManyDF ≡ per-series seasonalNaiveScaleDF") {
    val named = fleet.select(col("sid"), col("time").as("t"),
      col("value").as("v"))
    val scales = Darima.seasonalNaiveScaleManyDF(named, 24)
    types.foreach { t =>
      val want = Darima.seasonalNaiveScaleDF(series(t), 24)
      assert(relErr(scales(t), want) < 1e-9, s"$t scale")
    }
  }

  test("anchorLevelMany ≡ per-series anchorLevel (harmonic models)") {
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "olsar",
      olsP = 2, harmDaily = 1, anchorWindow = 64, chunker = "timerange")
    val many = Darima.runMany(spark, fleet, h = 8, cfg)
    types.foreach { t =>
      val (m1, _) = Darima.run(spark, series(t), h = 8, cfg)
      val (m2, _) = many(t)
      // the fleet anchor aggregates per-basis averages and recombines
      // on the driver (algebraically equal, float-order different) —
      // agreement to 1e-6 relative is the designed contract
      assert(relErr(m1.beta0, m2.beta0) < 1e-6,
        s"$t anchored beta0: ${m1.beta0} vs ${m2.beta0}")
    }
  }

  test("fleet auto-harmonics ≡ per-series runAutoHarmonics " +
    "(same winners, same forecasts)") {
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "olsar",
      olsP = 2, chunker = "timerange")
    val cands = Seq(0, 3)
    val many = Darima.runAutoHarmonicsMany(spark, fleet, h = 8, cfg,
      candidates = cands)
    assert(many.keySet == types.toSet)
    types.foreach { t =>
      val (chosen1, _, f1) =
        Darima.runAutoHarmonics(spark, series(t), h = 8, cfg, cands)
      val (chosen2, _, f2) = many(t)
      assert(chosen1 == chosen2, s"$t: winner differs")
      f1.mean.zip(f2.mean).foreach { case (a, b) =>
        assert(relErr(a, b) < 1e-9, s"$t mean: $a vs $b")
      }
    }
  }

  test("composed fleet selection (auto harmonics × auto λ) ≡ " +
    "per-series runAutoHarmonics") {
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "olsar",
      olsP = 2, chunker = "timerange", boxCox = "auto")
    val cands = Seq(0, 3)
    val many = Darima.runAutoHarmonicsMany(spark, fleet, h = 8, cfg,
      candidates = cands)
    types.foreach { t =>
      val (chosen1, _, f1) =
        Darima.runAutoHarmonics(spark, series(t), h = 8, cfg, cands)
      val (chosen2, _, f2) = many(t)
      assert(chosen1 == chosen2, s"$t: winner differs")
      f1.mean.zip(f2.mean).foreach { case (a, b) =>
        assert(relErr(a, b) < 1e-9, s"$t mean: $a vs $b")
      }
    }
  }

  test("fleet Box–Cox ≡ per-series run (auto λ, same forecasts)") {
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "olsar",
      olsP = 2, chunker = "timerange", boxCox = "auto")
    val many = Darima.runBoxCoxMany(spark, fleet, h = 8, cfg)
    assert(many.keySet == types.toSet)
    types.foreach { t =>
      val (_, f1) = Darima.run(spark, series(t), h = 8, cfg)
      val f2 = many(t)._2
      f1.mean.zip(f2.mean).foreach { case (a, b) =>
        assert(relErr(a, b) < 1e-9, s"$t mean: $a vs $b")
      }
      f1.se.zip(f2.se).foreach { case (a, b) =>
        assert(relErr(a, b) < 1e-9, s"$t se: $a vs $b")
      }
      f1.upper(1).zip(f2.upper(1)).foreach { case (a, b) =>
        assert(relErr(a, b) < 1e-9, s"$t hi95: $a vs $b")
      }
    }
  }

  test("d12 selection has no cross-series leakage; delta is coherent") {
    val d12 = SparkEntry.queries("d12_multiseries_select")
    val full = d12(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(full.keySet == types.toSet)
    full.values.foreach { r =>
      assert(Set(1, 2).contains(r.getAs[Int]("best_p")))
      assert(r.getAs[Double]("delta_mase") >= 0.0)
    }
    // a one-series corpus must reproduce that series' fleet row
    // bit-for-bit (per-series splits/fits/metrics never mix series)
    val dir = java.nio.file.Files.createTempDirectory("d12-one").toString
    // keep ts a raw INT64-nanos column so Tables.events' div-1000
    // conversion still applies on the sliced fixture (EmptyInputSpec
    // does the same)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val one = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "click")
    one.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val solo = d12(spark, dir).collect()
    assert(solo.length == 1)
    assert(solo(0).toSeq == full("click").toSeq)
  }

  test("runMany rejects the per-series holdout weighting config") {
    val cfg = DarimaConfig(seasonalWeighting = "holdout")
    intercept[IllegalArgumentException] {
      Darima.runMany(spark, fleet, h = 4, cfg)
    }
  }
}
