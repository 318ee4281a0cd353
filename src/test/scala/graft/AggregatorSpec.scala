package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{ArimaFitAggregator, Darima, DarimaConfig}

class AggregatorSpec extends AnyFunSuite {
  import SparkTestSession._

  test("Aggregator fit path matches flatMapGroups fit path") {
    import spark.implicits._
    val cfg = DarimaConfig(numChunks = 4, freq = 24, tol = 24,
      maxP = 3, maxQ = 2)
    val series = Tables.events(spark, sf)
      .select(col("ts").cast("double").as("time"), col("value"))
    // aggregator path: fit expressible inside agg(...)
    val chunked = graft.ts.Chunker.rangeChunks(
      series.select(col("time").as("t"), col("value").as("v")),
      col("t"), cfg.numChunks)
    val agg = new ArimaFitAggregator(cfg).toColumn.name("coefs")
    val viaAgg = chunked.select(col("chunk_id"), col("t"), col("v"))
      .as[(Int, Double, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg)
      .flatMap { case (chunkId, rows) =>
        rows.map(r => (chunkId, r.coef, r.value))
      }
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // flatMapGroups path
    val viaGroups = Darima.fitChunkCoefs(spark, series, cfg)
      .select("chunk_id", "coef", "value")
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(viaAgg.keySet == viaGroups.keySet)
    viaAgg.foreach { case (k, v) =>
      assert(math.abs(v - viaGroups(k)) < 1e-9, s"$k: $v vs ${viaGroups(k)}")
    }
  }
}
