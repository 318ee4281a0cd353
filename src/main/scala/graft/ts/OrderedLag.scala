package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed lag over a totally-ordered series without a global
  * single-partition sort — the shape `lag(...) OVER (ORDER BY t)`
  * needs at 100 TB.
  *
  * Method: range-bucket the rows on the order key (deterministic
  * quantile-sketch bounds, like graft.ts.Chunker), compute lags
  * inside each bucket in parallel, and fix the first maxLag rows of
  * every bucket by *augmenting* it with the previous bucket's last
  * maxLag rows (helper rows participate in the window, then drop
  * out). All operations are distributed — nothing is collected, and
  * every bucket's window sort is local.
  *
  * Rows equal on the order key land in one bucket (bucketing is by
  * value), so tie order inside the window matches the global window
  * exactly given the same tie-break columns.
  */
object OrderedLag {

  /** Add columns `<valueCol>_lag<n>` for each requested lag. */
  def withLags(df: DataFrame, orderCol: Column, tieBreak: Column,
      valueCol: String, lags: Seq[Int], buckets: Int = 32): DataFrame = {
    require(lags.nonEmpty)
    val maxLag = lags.max
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = df
      .select(percentile_approx(orderCol.cast("double"),
        array(qs.map(lit): _*), lit(10000)).as("b"))
      .head().getSeq[Double](0)
    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(orderCol.cast("double") > lit(b), 1).otherwise(0)
    }
    val based = df.withColumn("__bucket", bucket)
      .withColumn("__helper", lit(false))
    // previous bucket's tail rows, re-tagged into the next bucket
    val wDesc = Window.partitionBy(col("__bucket"))
      .orderBy(orderCol.desc, tieBreak.desc)
    val tails = based
      .withColumn("__rnd", row_number().over(wDesc))
      .filter(col("__rnd") <= maxLag && col("__bucket") < buckets - 1)
      .drop("__rnd")
      .withColumn("__bucket", col("__bucket") + 1)
      .withColumn("__helper", lit(true))
    val aug = based.unionByName(tails)
    val w = Window.partitionBy(col("__bucket")).orderBy(orderCol, tieBreak)
    val withLagCols = lags.foldLeft(aug) { (acc, n) =>
      acc.withColumn(s"${valueCol}_lag$n", lag(col(valueCol), n).over(w))
    }
    withLagCols.filter(!col("__helper"))
      .drop("__bucket", "__helper")
  }
}
