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
  * every bucket by *augmenting* it with helper rows (they participate
  * in the window, then drop out). All operations are distributed —
  * nothing large is collected, and every bucket's window sort is
  * local.
  *
  * Correctness under skew: helper rows for bucket b are the globally
  * last `maxLag` rows over ALL buckets < b (not just bucket b-1), so
  * empty buckets (duplicate quantile bounds under heavy ties) and
  * thin buckets (fewer than maxLag rows) cannot lose lags. The
  * helper pool is the union of per-bucket tails — at most
  * buckets·maxLag rows — ranked per target bucket via a broadcast
  * inequality join, so the fix-up is O(buckets²·maxLag) on a tiny
  * relation, never a global shuffle of the data.
  *
  * The bucket count is clamped so the expected bucket size is at
  * least 4·maxLag rows, keeping boundary fix-ups a small fraction of
  * the work.
  *
  * Rows equal on the order key land in one bucket (bucketing is by
  * value with strict `>` on deduplicated bounds), so tie order inside
  * the window matches the global window exactly given the same
  * tie-break columns.
  */
object OrderedLag {

  /** Add columns `<valueCol>_lag<n>` for each requested lag. */
  def withLags(df: DataFrame, orderCol: Column, tieBreak: Column,
      valueCol: String, lags: Seq[Int], buckets: Int = 32): DataFrame = {
    require(lags.nonEmpty)
    val maxLag = lags.max

    // One pass computes the row count (for the bucket-size clamp) and
    // the candidate quantile bounds.
    val qs = (1 until math.max(buckets, 2)).map(i => i.toDouble / buckets)
    val stats = df.select(
      count(lit(1)).as("n"),
      percentile_approx(orderCol.cast("double"),
        array(qs.map(lit): _*), lit(10000)).as("b"))
      .head()
    val n = stats.getLong(0)
    val rawBounds: Seq[Double] =
      if (stats.isNullAt(1)) Seq.empty else stats.getSeq[Double](1)

    // Clamp: expected bucket size must comfortably exceed maxLag.
    val eff = math.max(1L, math.min(buckets.toLong,
      n / (4L * maxLag))).toInt
    // Subsample the computed bounds to the effective bucket count,
    // then deduplicate (heavy ties produce repeated quantiles, which
    // would otherwise manufacture empty bucket ids).
    val bounds = (1 until eff)
      .map(i => rawBounds((i * buckets / eff) - 1))
      .distinct.sorted

    val w = Window.partitionBy(col("__bucket")).orderBy(orderCol, tieBreak)
    def addLags(in: DataFrame): DataFrame =
      lags.foldLeft(in) { (acc, k) =>
        acc.withColumn(s"${valueCol}_lag$k", lag(col(valueCol), k).over(w))
      }

    if (bounds.isEmpty) {
      // Degenerate input (under 4·maxLag rows, or a constant order
      // key): a single local window is both correct and cheap.
      return addLags(df.withColumn("__bucket", lit(0)))
        .drop("__bucket")
    }

    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(orderCol.cast("double") > lit(b), 1).otherwise(0)
    }
    val based = df.withColumn("__bucket", bucket)
      .withColumn("__helper", lit(false))

    // Per-bucket tails: each bucket's last maxLag rows. The globally
    // last maxLag rows before any boundary are a subset of the union
    // of earlier tails, so this tiny relation is a sufficient helper
    // pool.
    val wDesc = Window.partitionBy(col("__bucket"))
      .orderBy(orderCol.desc, tieBreak.desc)
    val tails = based
      .withColumn("__rnd", row_number().over(wDesc))
      .filter(col("__rnd") <= maxLag)
      .drop("__rnd")

    // For every target bucket, rank all earlier tail rows globally
    // and keep the last maxLag — correct across empty/thin buckets.
    val nBuckets = bounds.size + 1
    val targets = df.sparkSession.range(1, nBuckets)
      .select(col("id").cast("int").as("__tgt"))
    val wTgt = Window.partitionBy(col("__tgt"))
      .orderBy(orderCol.desc, tieBreak.desc)
    val helpers = tails
      .join(broadcast(targets), col("__bucket") < col("__tgt"))
      .withColumn("__rnd", row_number().over(wTgt))
      .filter(col("__rnd") <= maxLag)
      .drop("__rnd", "__bucket")
      .withColumnRenamed("__tgt", "__bucket")
      .withColumn("__helper", lit(true))

    addLags(based.unionByName(helpers))
      .filter(!col("__helper"))
      .drop("__bucket", "__helper")
  }
}
