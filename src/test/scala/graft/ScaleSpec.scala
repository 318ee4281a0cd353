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

  test("10M-row ordered rank: exact global ntile without a global sort") {
    import spark.implicits._
    val n = 10_000_000L
    val df = spark.range(n).select(
      col("id").as("ev"),
      // non-monotone order key with heavy ties: worst case for the
      // quantile bucketing
      (col("id") % 1000).cast("double").as("t"))
    val t0 = System.nanoTime()
    val tiles = graft.ts.OrderedRank
      .withNtile(df, col("t"), col("ev"), 16, "tile")
      .groupBy(col("tile")).count().collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"10M rows ntile(16): ${secs}%.1f s")
    assert(tiles.length == 16)
    // exact NTILE: every tile holds exactly n/16 rows
    assert(tiles.forall(_.getLong(1) == n / 16))
    assert(secs < 120, s"took ${secs}s")
  }

  test("5M-row as-of join: keyed interleave stays linear") {
    import spark.implicits._
    val n = 5_000_000L
    val left = spark.range(n).select(
      (col("id") % 1000).as("k"), col("id").cast("double").as("t"),
      col("id").as("ev"))
    val right = spark.range(n / 10).select(
      (col("id") % 1000).as("k"),
      (col("id") * 10).cast("double").as("t"),
      col("id").cast("double").as("v"))
    val t0 = System.nanoTime()
    val matched = graft.operators.AsofJoin
      .leftAsof(left, right, "k", "t", "v", "m")
      .agg(count(lit(1)), count(col("m"))).collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"5M-left as-of join: ${secs}%.1f s")
    assert(matched.getLong(0) == n)
    // almost every left row has an earlier right row on its key
    assert(matched.getLong(1) > n - 20_000L)
    assert(secs < 120, s"took ${secs}s")
  }

  test("5M-point range join: bucketed equi-join stays linear") {
    import spark.implicits._
    val points = spark.range(5_000_000L).select(
      col("id").as("pid"),
      (col("id").cast("double") * 0.72).as("t"))
    // 20k intervals of length ~500 over the same domain
    val intervals = spark.range(20_000L).select(
      col("id").as("iid"),
      (col("id").cast("double") * 180.0).as("s"))
      .withColumn("e", col("s") + 500.0)
    val t0 = System.nanoTime()
    val n = graft.operators.RangeJoin.pointInInterval(points, intervals,
      col("t"), col("s"), col("e"), width = 500.0).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"5M points x 20k intervals: $n matches, $secs%.1f s")
    // every interval holds ~500/0.72 = ~695 points
    assert(n > 10_000_000L && n < 16_000_000L, s"n=$n")
    assert(secs < 120, s"took $secs s")
  }
}
