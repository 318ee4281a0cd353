package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Darima, DarimaConfig}

/** Scale-shape validation: the DARIMA pipeline on a 10M-row synthetic
  * hourly series (~80× the reference workload) with K=32 chunks.
  * This does not prove 100 TB, but it proves the *shapes*: range
  * chunking with no global sort, per-chunk streaming fit, one hash
  * agg, tail-only driver collect — i.e., nothing in the path
  * materializes O(n) on the driver or O(n²) anywhere.
  */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("10M-row series: distributed fit + combine + forecast") {
    import spark.implicits._
    val n = 10_000_000L
    // deterministic hourly series with daily + weekly structure + noise
    val series = spark.range(n).select(
      col("id").cast("double").as("time"),
      (sin(col("id") * (2 * math.Pi / 24)) * 10 +
        sin(col("id") * (2 * math.Pi / 168)) * 5 +
        (hash(col("id")).cast("double") / Int.MaxValue) + 50).as("value"))
    val cfg = DarimaConfig(numChunks = 32, freq = 24, tol = 400,
      maxLag = 200)
    val t0 = System.nanoTime()
    val (model, fc) = Darima.run(spark, series, h = 48, cfg)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10M rows, K=32: ${secs}%.1f s, p=${model.p}, sigma2=${model.sigma2}%.4f")
    assert(model.p == 400)
    assert(fc.mean.forall(v => !v.isNaN && math.abs(v) < 100))
    // the fit must actually capture the injected daily cycle
    assert(model.sigma2 < 2.0, s"sigma2=${model.sigma2}")
    assert(secs < 300, s"took ${secs}s")
  }
}
