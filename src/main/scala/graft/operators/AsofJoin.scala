package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join — for every left row, the most recent right row at or
  * before the left row's time, per key (the time-series join Spark
  * has no built-in operator for; DuckDB/kdb call it ASOF JOIN).
  *
  * Spark-first shape: instead of a per-left-row probe (O(n·m)) or a
  * range self-join, interleave both sides into ONE keyed stream and
  * take `last(value, ignoreNulls)` over an unbounded-preceding
  * window ordered by (time, side) with right rows sorting before
  * left rows at equal times — exactly the inclusive `l.t >= r.t`
  * ASOF contract. One shuffle on the key, per-key local sort, no
  * global ordering anywhere: the 100 TB shape. (For a *hot* single
  * key the per-key window could be range-bucketed like
  * graft.ts.OrderedLag; keys here are the parallelism unit.)
  *
  * The right side should be unique per (key, time) — pre-aggregate
  * if not — so the matched value is well-defined.
  */
object AsofJoin {

  /** Left-outer as-of join: left keeps all rows; `rightVal` carries
    * the matched value (null when no earlier right row exists).
    *
    * @param left     left rows (keyCol, timeCol, payload...)
    * @param right    right rows (keyCol, timeCol, valueCol); must be
    *                 unique per (keyCol, timeCol)
    * @param keyCol   equality key name (same on both sides)
    * @param timeCol  event-time column name (same type both sides)
    * @param valueCol right-side value column name
    * @param outCol   name for the matched value on the output
    */
  def leftAsof(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, valueCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns
    // One unioned stream: right rows carry the value, left rows null.
    // __side orders right (0) before left (1) at equal times, making
    // the match inclusive. The value rides inside a 1-field struct —
    // a right row whose VALUE is null still produces a non-null
    // struct, so last(ignoreNulls) below cannot skip it and fall back
    // to an older right row (ASOF semantics for nullable values).
    val rvType = new org.apache.spark.sql.types.StructType()
      .add("v", right.schema(valueCol).dataType)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val r = right
      .select(col(keyCol), col(timeCol),
        struct(col(valueCol).as("v")).as("__rv"))
      .withColumn("__side", lit(0))
    val extra = leftCols.filterNot(c => c == keyCol || c == timeCol)
    val rPadded = extra.foldLeft(r) { (acc, c) =>
      acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(rPadded.select(l.columns.map(col): _*))
      .withColumn(outCol,
        last(col("__rv"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }
}
