package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Darima, DarimaConfig}
import graft.eval.Metrics
import graft.queries.DarimaQueries

/** End-to-end pipeline tests: the harness events series (fast) and
  * the reference's own electricity fixture (the real workload shape:
  * 121k hourly rows, K=4, AR(2000) linearization, h=2879 forecast —
  * reference defaults per darima_config.json).
  */
class DarimaPipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  test("chunk fit emits a full coefficient table per chunk") {
    val cfg = DarimaConfig(numChunks = 4, freq = 24, tol = 24,
      maxP = 3, maxQ = 2)
    val series = graft.Tables.events(spark, sf)
      .select(col("ts").cast("double").as("time"), col("value"))
    val coefs = Darima.fitChunkCoefs(spark, series, cfg)
    val byChunk = coefs.groupBy("chunk_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byChunk.size == 4)
    byChunk.values.foreach(n => assert(n == cfg.tol + 3L))
    // DLSA weights positive
    assert(coefs.filter(col("weight") <= 0).count() == 0)
  }

  test("combine: dlsa equals mean when all chunk weights are equal") {
    import spark.implicits._
    val coefs = Seq(
      (0, "ar1", 1, 0.5, 2.0, 100L), (1, "ar1", 1, 0.7, 2.0, 100L),
      (0, "sigma2", Int.MaxValue, 1.0, 2.0, 100L),
      (1, "sigma2", Int.MaxValue, 1.0, 2.0, 100L))
      .toDF("chunk_id", "coef", "lag_idx", "value", "weight", "n")
    val dlsa = Darima.combine(coefs, "dlsa").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(dlsa("ar1") - 0.6) < 1e-12)
    // sigma2 via Σn/Σw = 200/4 = 50 (precision-form combine)
    assert(math.abs(dlsa("sigma2") - 50.0) < 1e-12)
    val mean = Darima.combine(coefs, "mean").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(mean("ar1") - 0.6) < 1e-12)
  }

  test("electricity e2e: reference fixture, K=4, forecast h=2879") {
    val train = Darima.loadSeriesCsv(spark,
      "/root/reference/data/NEMASSBOST_train.csv")
    val test0 = Darima.loadSeriesCsv(spark,
      "/root/reference/data/NEMASSBOST_test.csv")
    val testVals = test0.orderBy("time").select("value").collect()
      .map(_.getDouble(0))
    val h = testVals.length
    assert(h == 2879)
    val cfg = DarimaConfig(numChunks = 4, freq = 24, method = "dlsa",
      tol = 2000, maxP = 5, maxQ = 5)
    val (model, fc) = Darima.run(spark, train, h, cfg)
    assert(model.p == 2000)
    assert(model.sigma2 > 0)
    assert(fc.mean.forall(v => !v.isNaN && math.abs(v) < 1e5))
    // evaluation vs held-out test (paper metrics)
    val trainVals = train.orderBy("time").select("value").collect()
      .map(_.getDouble(0))
    val mase = Metrics.mean(Metrics.mase(trainVals, testVals, fc.mean, 24))
    val smape = Metrics.mean(Metrics.smape(testVals, fc.mean))
    val msis95 = Metrics.mean(Metrics.msis(trainVals, testVals,
      fc.lower(1), fc.upper(1), 95, 24))
    info(s"NEMASSBOST: MASE=$mase sMAPE=$smape MSIS95=$msis95 " +
      s"sigma2=${model.sigma2}")
    // long-AR seasonal fitter reaches ~1.10 on this fixture (the
    // reference's own quality is degraded by SURVEY.md §1.4 defects;
    // Wang et al. report ~0.8-1.0 for full DARIMA)
    assert(mase < 1.5, s"MASE=$mase")
    assert(smape < 0.12, s"sMAPE=$smape")
    assert(msis95 > 0 && msis95 < 25, s"MSIS=$msis95")
    // forecast.json sink round-trips
    val tmp = java.nio.file.Files.createTempDirectory("fc").toString
    Darima.writeForecastJson(fc, s"$tmp/forecast.json")
    assert(java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$tmp/forecast.json")) > 1000)
  }

  test("modulated harmonics survive the full distributed chain: " +
      "chunk fit -> DLSA combine -> model parse -> forecast") {
    import spark.implicits._
    // amplitude-modulated daily signal: y = 100 + (3 + 2cos(ω_y t))·
    // cos(ω_d t) + ripple, with ω_y the REAL yearly mapping the specs
    // inject (8766 hourly samples per modulator cycle). The forecast
    // can only track the varying amplitude if the modulated CoefRows
    // round-trip through the combine's named grouping and
    // globalModel's parse — a plain skeleton would freeze at the
    // average amplitude (error ≥ 2 at the modulator's extremes).
    //
    // numChunks = 2 so each contiguous chunk spans 1.5 modulator
    // cycles: Seasonal.fitHarmonics drops (correctly — the factor is
    // near-constant inside the window, collinear with the base pair)
    // any modulated spec whose modulator period exceeds the CHUNK
    // span, so identifiability has to hold per chunk, not merely
    // globally. The production electricity runs are K=4 over ~14
    // years (≈3.4 cycles per chunk).
    val dt = 3600.0
    val yc = (365.25 * 24).round.toInt // 8766 samples per modulator
    val n = 8766 * 3
    val h = 2000
    def truth(i: Long): Double = 100.0 +
      (3.0 + 2.0 * math.cos(2 * math.Pi * i / yc.toDouble)) *
        math.cos(2 * math.Pi * i / 24.0)
    val rows = (0L until n).map(i =>
      (1.6e9 + i * dt, truth(i) + 0.3 * math.sin(i * 1.7)))
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "olsar",
      olsP = 2, harmDaily = 1, modDaily = 1, modYearly = 1)
    val (model, fc) = Darima.run(spark, rows.toDF("time", "value"),
      h, cfg)
    assert(model.harmonics.exists(_.mcycle > 0),
      s"no modulated pair survived: ${model.harmonics.mkString(",")}")
    val errs = (0 until h).map(j => math.abs(fc.mean(j) - truth(n + j)))
    val rmse = math.sqrt(errs.map(e => e * e).sum / h)
    // ripple sd ≈ 0.21; an amplitude-frozen skeleton would sit ≥ 1.0
    // RMSE over a horizon crossing the modulator's swing
    assert(rmse < 0.6, s"rmse=$rmse")
  }

  test("electricity e2e: calibrated sarima fitter at long horizon") {
    // the r5-documented failure: fitter="sarima" selected a unit root
    // and h=2879 intervals exploded (MSIS95 ≈ 485). The long-horizon
    // calibration (stationary cap + Fourier harmonics + last-year
    // level anchor, Darima.run) must bring intervals within 2× of the
    // shipped harmonic default while keeping points usable.
    val train = Darima.loadSeriesCsv(spark,
      "/root/reference/data/NEMASSBOST_train.csv")
    val test0 = Darima.loadSeriesCsv(spark,
      "/root/reference/data/NEMASSBOST_test.csv")
    val testVals = test0.orderBy("time").select("value").collect()
      .map(_.getDouble(0))
    val h = testVals.length
    val cfg = DarimaConfig(fitter = "sarima")
    val (_, fc) = Darima.run(spark, train, h, cfg)
    val trainVals = train.orderBy("time").select("value").collect()
      .map(_.getDouble(0))
    val mase = Metrics.mean(Metrics.mase(trainVals, testVals, fc.mean, 24))
    val msis95 = Metrics.mean(Metrics.msis(trainVals, testVals,
      fc.lower(1), fc.upper(1), 95, 24))
    info(s"NEMASSBOST sarima: MASE=$mase MSIS95=$msis95")
    // round 7: the family search (long-AR candidate under the same
    // AICc) + yearly-only injected skeleton brought this to ≈ 0.87,
    // level with the shipped harmonic default — pin it there
    assert(mase < 1.05, s"MASE=$mase")
    assert(msis95 > 0 && msis95 < 12, s"MSIS95=$msis95")
  }

  test("harmonic phase survives DST-style gaps (gap-robust dt)") {
    import spark.implicits._
    // hourly sinusoid with three 2-hour holes: the average-dt phase
    // (t / ((last-first)/(n-1))) drifts; the median-dt phase is exact
    // and the forecast must continue the wall-clock cycle
    val n = 2000
    val gaps = Set(400, 900, 1500)
    val times = (0 until n).scanLeft(1.6e9) { (t, i) =>
      t + (if (gaps.contains(i)) 7200.0 else 3600.0)
    }.tail
    // the 0.3-amplitude incommensurate ripple keeps the post-harmonic
    // residuals non-degenerate (a pure sinusoid fits exactly and the
    // AR normal equations go singular)
    val ser = times.map(t =>
      (t, 100.0 + 10.0 * math.sin(2 * math.Pi * (t / 3600.0) / 24.0)
        + 0.3 * math.sin(t / 3600.0 * 1.7)))
      .toDF("time", "value")
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "olsar",
      olsP = 2, harmDaily = 1, chunker = "timerange")
    val (_, fc) = Darima.run(spark, ser, h = 48, cfg)
    val tLast = times.last
    val expected = (1 to 48).map(s =>
      100.0 + 10.0 * math.sin(2 * math.Pi * ((tLast + s * 3600.0) / 3600.0) / 24.0))
    val maxErr = fc.mean.zip(expected).map { case (a, b) => math.abs(a - b) }.max
    // ≥1.0 would mean ≥ 0.1 rad of daily-phase drift (the averaged-dt
    // bug lands whole CYCLES off); the 0.3 ripple bounds the rest
    assert(maxErr < 1.0, s"phase drift: maxErr=$maxErr")
  }

  test("darima queries run and return rows at sf0.001") {
    DarimaQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name empty")
    }
  }

  test("distributed fitted/residuals match the driver recursion") {
    import spark.implicits._
    // deterministic AR(2)-ish series, long enough to span several
    // OrderedLag buckets so the head-patch path is exercised
    val n = 4000
    var state = 9L
    def rnd(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    val xs = new Array[Double](n)
    var t = 0
    while (t < n) {
      xs(t) = 5.0 + rnd() +
        (if (t >= 1) 0.5 * xs(t - 1) else 0.0) +
        (if (t >= 2) 0.2 * xs(t - 2) else 0.0)
      t += 1
    }
    val ser = xs.zipWithIndex.map { case (v, i) => (i.toDouble, v) }
      .toSeq.toDF("time", "value")
    val model = graft.arima.ArLinearModel(
      beta0 = 1.5, beta1 = 0.0, pi = Array(0.5, 0.2), sigma2 = 1.0, n = n)
    val got = Darima.fittedResidualsDF(ser, model)
      .orderBy("t").collect()
    val fc = graft.forecast.Forecast.forecast(model, xs, h = 1,
      levels = Array(80))
    assert(got.length == n)
    var i = 0
    while (i < n) {
      if (i < 2) assert(got(i).isNullAt(2), s"row $i should be null")
      else {
        assert(math.abs(got(i).getDouble(2) - fc.fitted(i)) < 1e-12,
          s"row $i: ${got(i).getDouble(2)} vs ${fc.fitted(i)}")
        assert(math.abs(got(i).getDouble(3) - fc.residuals(i)) < 1e-12)
      }
      i += 1
    }
  }

  test("fitted/residuals with trend and harmonics stay consistent") {
    import spark.implicits._
    val n = 600
    val xs = Array.tabulate(n)(t =>
      10.0 + 0.01 * t + 3.0 * math.cos(2 * math.Pi * t / 24.0))
    val ser = xs.zipWithIndex.map { case (v, i) => (i.toDouble, v) }
      .toSeq.toDF("time", "value")
    val model = graft.arima.ArLinearModel(
      beta0 = 0.2, beta1 = 0.01, pi = Array(0.3), sigma2 = 1.0, n = n,
      harmonics = Array(graft.arima.HarmCoef(24, 1, 3.0, 0.0)))
    val got = Darima.fittedResidualsDF(ser, model).orderBy("t").collect()
    val fc = graft.forecast.Forecast.forecast(model, xs, h = 1,
      levels = Array(80), startIndex = 0L, tauStart = 0.0)
    var i = 1
    while (i < n) {
      assert(math.abs(got(i).getDouble(2) - fc.fitted(i)) < 1e-9,
        s"row $i: ${got(i).getDouble(2)} vs ${fc.fitted(i)}")
      i += 1
    }
  }

  test("forecast sink: inline below the threshold (reference parity), " +
      "parquet + pointer above it") {
    import org.apache.spark.sql.functions.col
    val series = Tables.events(spark, sf)
      .select(col("ts").cast("double").as("time"), col("value"))
    val cfg = DarimaConfig(numChunks = 2, freq = 24, fitter = "olsar",
      olsP = 1, chunker = "timerange")
    val n = series.count()
    val (model, fc) = Darima.run(spark, series, h = 8, cfg)
    val frDf = Darima.fittedResidualsDF(series, model)
    // inline branch: arrays in the JSON, no parquet side file
    val d1 = java.nio.file.Files.createTempDirectory("sink1").toString
    assert(Darima.writeForecastOutputs(fc, frDf, n, d1, inlineMax = n))
    val j1 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$d1/forecast.json"))
    assert(j1.contains("\"fitted\":[") && j1.contains("\"residuals\":["))
    assert(!j1.contains("fitted_residuals_path"))
    assert(!new java.io.File(s"$d1/fitted_residuals.parquet").exists())
    // count the inlined fitted values == n (whole-train arrays, the
    // darima.py:400-408 shape)
    val inlined = j1.split("\"fitted\":\\[")(1).split("]")(0)
      .split(",").length
    assert(inlined == n, s"inlined $inlined fitted values, train $n")
    // pointer branch: arrays replaced by the relative path; the
    // parquet holds every (t, fitted, residual) row
    val d2 = java.nio.file.Files.createTempDirectory("sink2").toString
    assert(!Darima.writeForecastOutputs(fc, frDf, n, d2,
      inlineMax = n - 1))
    val j2 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$d2/forecast.json"))
    assert(j2.contains("\"fitted_residuals_path\":\"fitted_residuals.parquet\""))
    assert(!j2.contains("\"fitted\":["))
    val pq = spark.read.parquet(s"$d2/fitted_residuals.parquet")
    assert(pq.count() == n)
    assert(pq.columns.toSeq == Seq("t", "fitted", "residual"))
    // the forecast head of the JSON (mean/se/intervals) is identical
    // across branches — only the fitted/residual carrier changed
    assert(j1.split("\"fitted\"")(0) == j2.split("\"fitted")(0))
  }
}
