package graft.tools

import org.apache.spark.sql.DataFrame

/** Broadcast-tier gate for the distributed-window machinery
  * (OrderedLag / OrderedRank): when the frame's optimizer size
  * estimate is at most `spark.graft.window.localMaxBytes` (default
  * 16m), a single-bucket window — one sort task — is cheaper than
  * quantile-bucketed windows plus their boundary patches: the
  * percentile-bounds job, the boundary Materialize pin, and the
  * patch/offset joins all disappear from the plan, and the results
  * are identical (the bucketed form exists only to parallelize the
  * sort; both order by the same (orderCol, tieBreak) total order).
  * This is the same size-adaptive trade a broadcast hash join makes,
  * with the distributed plan untouched above the gate — at 100 TB the
  * estimate exceeds any sane threshold and nothing changes.
  * `spark.graft.window.localMaxBytes=0` opts out entirely (PlanAudit
  * sets it so the audit always judges the at-scale plan shape).
  */
object LocalTier {

  val ConfKey = "spark.graft.window.localMaxBytes"

  def apply(df: DataFrame): Boolean = {
    if (df.isStreaming) return false
    val spark = df.sparkSession
    val maxB = BigInt(org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf.get(ConfKey, "16m")))
    maxB > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxB
  }
}
