package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time (temporal validity) join — every fact row matched to
  * the dimension version whose validity interval covers the fact's
  * event time: `f.key = d.key AND f.t >= d.valid_from AND
  * f.t < d.valid_to`. The dimension-history lookup every warehouse
  * does against an SCD2 table (Dedup.scd2Intervals builds one); the
  * complement of AsofJoin (which matches the nearest PRECEDING right
  * row — PIT matches the COVERING interval, and a fact in a coverage
  * gap matches nothing instead of a stale version).
  *
  * Spark-first shape: an equi hash join on the key with the range
  * predicate as its residual filter — no interval index, no range
  * self-join. Per-key history is bounded by the version count
  * (intervals per key are non-overlapping by SCD2 construction, so
  * each fact row survives the residual at most once), and the history
  * side is dimension-sized, so at fact scale AQE broadcasts it; the
  * fact side is never shuffled at all under a broadcast plan.
  */
object PitJoin {

  /** Inner PIT join: facts in a coverage gap (or with no history) are
    * dropped. Both inputs must share `keyCol`; the interval is
    * inclusive-exclusive `[fromCol, toCol)`, the SCD2 convention that
    * makes adjacent versions non-overlapping.
    */
  def pitJoin(fact: DataFrame, dimHist: DataFrame, keyCol: String,
      timeCol: String, fromCol: String = "valid_from",
      toCol: String = "valid_to"): DataFrame = {
    val f = fact.alias("__f")
    val d = dimHist.alias("__d")
    f.join(d,
        col(s"__f.$keyCol") === col(s"__d.$keyCol") &&
          col(s"__f.$timeCol") >= col(s"__d.$fromCol") &&
          col(s"__f.$timeCol") < col(s"__d.$toCol"))
      .drop(col(s"__d.$keyCol"))
  }
}
