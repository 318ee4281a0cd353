package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.arima.ArFit
import graft.pipeline.{Darima, DarimaConfig}
import graft.eval.Metrics

/** The DARIMA pipeline surface, run over the harness `events` table
  * as the univariate series (ts → time, value → demand analog).
  * The fit itself is not SQL-expressible, so d01–d04 are rows-only
  * entries; d05 closes the loop by running the real Scala OLS fitter
  * per chunk and checking it against a closed-form normal-equation
  * solution written in pure DuckDB SQL — the fit math is therefore
  * oracle-checked on the AR(1)+intercept special case.
  */
object DarimaQueries {
  type Q = (SparkSession, String) => DataFrame

  private def series(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("ts").cast("double").as("time"), col("value"))

  private val cfg = DarimaConfig(numChunks = 4, freq = 24, tol = 24,
    maxP = 3, maxQ = 2)

  /** Same rounding convention as Spark's / DuckDB's `round(x, n)`
    * (HALF_UP, away from zero on ties) — `math.rint` is half-to-even
    * and would diverge from the oracle on exact .5 ties.
    */
  private def roundN(x: Double, n: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** M1-M7: per-chunk SARIMA fit + AR linearization (rows-only). */
  private val d01ChunkCoefs: Q = (s, d) =>
    Darima.fitChunkCoefs(s, series(s, d), cfg)
      .select(col("chunk_id"), col("coef"), col("lag_idx"),
        round(col("value"), 6).as("value"))
      .orderBy(col("chunk_id"), col("lag_idx"))

  /** A1/A4: DLSA combine to the global model (rows-only). */
  private val d02GlobalCoefs: Q = (s, d) => {
    val coefs = Darima.fitChunkCoefs(s, series(s, d), cfg)
    Darima.combine(coefs, "dlsa")
      .select(col("coef"), col("lag_idx"), round(col("value"), 6).as("value"))
      .orderBy(col("lag_idx"))
  }

  /** FC1-FC8: h-step forecast with 80/95% intervals (rows-only). */
  private val d03Forecast: Q = (s, d) => {
    import s.implicits._
    val (_, fc) = Darima.run(s, series(s, d), h = 48, cfg)
    fc.mean.indices.map { i =>
      (i + 1, fc.mean(i), fc.se(i), fc.lower(0)(i), fc.upper(0)(i),
        fc.lower(1)(i), fc.upper(1)(i))
    }.toDF("step", "mean", "se", "lo80", "hi80", "lo95", "hi95")
      .orderBy(col("step"))
  }

  /** E1-E5: train/test split, forecast, MASE/sMAPE/MSIS (rows-only). */
  private val d04ForecastEval: Q = (s, d) => {
    import s.implicits._
    val all = series(s, d).orderBy(col("time"))
      .select(col("value")).collect().map(_.getDouble(0))
    val nTest = math.max(24, all.length / 10)
    val train = all.dropRight(nTest)
    val test = all.takeRight(nTest)
    val trainDf = series(s, d).orderBy(col("time")).limit(train.length)
    val (_, fc) = Darima.run(s, trainDf, h = nTest, cfg)
    val mase = Metrics.mase(train, test, fc.mean, cfg.freq)
    val smape = Metrics.smape(test, fc.mean)
    val msis80 = Metrics.msis(train, test, fc.lower(0), fc.upper(0), 80, cfg.freq)
    val msis95 = Metrics.msis(train, test, fc.lower(1), fc.upper(1), 95, cfg.freq)
    Seq((Metrics.mean(mase), Metrics.mean(smape), Metrics.mean(msis80),
      Metrics.mean(msis95), nTest))
      .toDF("mean_mase", "mean_smape", "mean_msis_80", "mean_msis_95", "h")
  }

  /** The fit-math oracle: AR(1)+intercept OLS per contiguous chunk.
    * Spark side runs the REAL fitter (ArFit.olsAr inside
    * flatMapGroups); the oracle solves the same normal equations in
    * closed form in SQL. Agreement (to 1e-6 after rounding) certifies
    * the streaming-normal-equation + Gaussian-elimination path.
    */
  private val d05Ar1Ols: Q = (s, d) => {
    import s.implicits._
    val chunked = graft.ts.OrderedRank.withNtile(
      Tables.events(s, d)
        .select(col("ts"), col("event_id"), col("value")),
      col("ts"), col("event_id"), 4, "chunk_id")
      .select(col("chunk_id"), col("ts").cast("double").as("t"), col("value"))
    chunked.as[(Int, Double, Double)]
      .groupByKey(_._1)
      .mapGroups { (chunkId, it) =>
        val values = it.toArray.sortBy(_._2).map(_._3)
        val fit = ArFit.olsAr(values, 1, trend = false)
        (chunkId, values.length.toLong,
          roundN(fit.beta0, 6), roundN(fit.pi(0), 6),
          roundN(fit.sigma2, 4))
      }
      .toDF("chunk_id", "n", "c", "phi", "sigma2")
      .orderBy(col("chunk_id"))
  }

  /** M1 alternate form: the fit as a typed Aggregator inside agg(...)
    * (SURVEY.md §4.2) — must produce the same coefficients as d01.
    */
  private val d06FitAggregator: Q = (s, d) => {
    import s.implicits._
    val chunked = graft.ts.Chunker.rangeChunks(
      series(s, d).select(col("time").as("t"), col("value").as("v")),
      col("t"), cfg.numChunks)
    chunked.select(col("chunk_id"), col("t"), col("v"))
      .as[(Int, Double, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new graft.pipeline.ArimaFitAggregator(cfg).toColumn.name("coefs"))
      .flatMap { case (chunkId, rows) =>
        rows.map(r => (chunkId, r.coef, r.lag_idx, roundN(r.value, 6)))
      }
      .toDF("chunk_id", "coef", "lag_idx", "value")
      .orderBy(col("chunk_id"), col("lag_idx"))
  }

  val queries: Map[String, Q] = Map(
    "d01_chunk_coefs" -> d01ChunkCoefs,
    "d02_global_coefs" -> d02GlobalCoefs,
    "d03_forecast" -> d03Forecast,
    "d04_forecast_eval" -> d04ForecastEval,
    "d05_ar1_ols" -> d05Ar1Ols,
    "d06_fit_aggregator" -> d06FitAggregator,
  )

  /** Closed-form AR(1) OLS in DuckDB SQL: y_t on [1, y_{t-1}] within
    * each ntile chunk;
    *   φ = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²), c = (Σy − φΣx)/n_reg,
    *   σ² = Σ(y − c − φx)²/(n_reg − 2).
    */
  val oracles: Map[String, String] = Map(
    "d05_ar1_ols" ->
      """WITH ordered AS (
        |  SELECT value, ntile(4) OVER (ORDER BY ts, event_id) AS chunk_id,
        |         row_number() OVER (ORDER BY ts, event_id) AS rn
        |  FROM events
        |), lagged AS (
        |  SELECT chunk_id, value AS y,
        |         lag(value) OVER (PARTITION BY chunk_id ORDER BY rn) AS x
        |  FROM ordered
        |), base AS (
        |  SELECT chunk_id, y, x FROM lagged WHERE x IS NOT NULL
        |), sums AS (
        |  SELECT chunk_id, count(*) AS nr, sum(x) AS sx, sum(y) AS sy,
        |         sum(x*y) AS sxy, sum(x*x) AS sxx
        |  FROM base GROUP BY chunk_id
        |), params AS (
        |  SELECT chunk_id, nr,
        |         (nr*sxy - sx*sy) / (nr*sxx - sx*sx) AS phi,
        |         (sy - ((nr*sxy - sx*sy) / (nr*sxx - sx*sx)) * sx) / nr AS c
        |  FROM sums
        |)
        |SELECT p.chunk_id, p.nr + 1 AS n,
        |       round(p.c, 6) AS c, round(p.phi, 6) AS phi,
        |       round(sum((b.y - p.c - p.phi*b.x)*(b.y - p.c - p.phi*b.x))
        |             / (p.nr - 2), 4) AS sigma2
        |FROM base b JOIN params p ON b.chunk_id = p.chunk_id
        |GROUP BY p.chunk_id, p.nr, p.c, p.phi
        |ORDER BY p.chunk_id""".stripMargin,
  )
}
