package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — `p.t BETWEEN i.start AND i.end` —
  * without a nested-loop or cartesian plan (Spark has no native
  * interval join; a raw theta-join on the BETWEEN predicate becomes
  * BroadcastNestedLoopJoin, all-pairs).
  *
  * Spark-first shape: quantize time into fixed-width buckets; each
  * interval explodes to the buckets it covers (fan-out =
  * ⌈len/width⌉+1, bounded by construction when `width` is chosen
  * near the typical interval length), points map to exactly one
  * bucket, and the join becomes an EQUI-join on the bucket id that
  * Catalyst plans as a hash join (broadcast or shuffled, AQE's
  * choice) with the exact BETWEEN refinement as a post-filter. One
  * shuffle of each side at most — the 100 TB shape for co-activity /
  * containment queries.
  */
object RangeJoin {

  /** Inner point-in-interval join (inclusive both ends).
    *
    * @param points    point rows; `ptCol` must be numeric (epoch)
    * @param intervals interval rows with `startCol`/`endCol` numeric,
    *                  start ≤ end
    * @param width     bucket width in the same units; choose ≈ the
    *                  typical interval length to bound fan-out
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: Column, startCol: Column, endCol: Column,
      width: Double): DataFrame = {
    require(width > 0, "bucket width must be positive")
    val pts = points.withColumn("__pb", floor(ptCol / width).cast("long"))
    val ivs = intervals.withColumn("__pb",
      explode(sequence(floor(startCol / width).cast("long"),
        floor(endCol / width).cast("long"))))
    pts.join(ivs, "__pb")
      .filter(ptCol >= startCol && ptCol <= endCol)
      .drop("__pb")
  }
}
