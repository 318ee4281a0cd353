package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact global `row_number()` / `ntile(k)` over a total order
  * without a single-partition sort — the distributed replacement for
  * `ntile(k) OVER (ORDER BY t)` (which moves every row to one
  * reducer; WindowExec warns about exactly this).
  *
  * Method: range-bucket rows on the order key with deterministic
  * quantile-sketch bounds (rows equal on the key stay in one bucket,
  * so the within-bucket sort extends to the exact global order via
  * the tie-break), count rows per bucket (a tiny aggregate —
  * `buckets` values — collected to the driver), and add each
  * bucket's cumulative offset to its local `row_number`. Two cheap
  * extra jobs (bounds sketch, bucket counts) buy a fully parallel
  * sort: the shape that survives 100 TB.
  *
  * `ntile` then follows from the global row number by the standard
  * SQL rule: with n rows and k tiles, the first n mod k tiles hold
  * ceil(n/k) rows — bit-identical to Spark's and DuckDB's NTILE.
  */
object OrderedRank {

  /** Shared core: returns the ranked frame plus the total row count
    * (free by-product of the bucket-count collect — no extra job).
    */
  private def ranked(df: DataFrame, orderCol: Column, tieBreak: Column,
      outCol: String, buckets: Int): (DataFrame, Long) = {
    val qs = (1 until math.max(buckets, 2)).map(i => i.toDouble / buckets)
    val stats = df.select(
      percentile_approx(orderCol.cast("double"),
        array(qs.map(lit): _*), lit(10000)).as("b"))
      .head()
    val bounds: Seq[Double] =
      if (stats.isNullAt(0)) Seq.empty
      else stats.getSeq[Double](0).distinct.sorted

    val bucket = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(orderCol.cast("double") > lit(b), 1).otherwise(0)
    }
    val based = df.withColumn("__bucket", bucket)

    // Bucket sizes: at most `buckets` rows — safe to collect.
    val counts = based.groupBy(col("__bucket")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.valuesIterator.sum
    val offsets = (0 to bounds.size).scanLeft(0L) { (acc, b) =>
      acc + counts.getOrElse(b, 0L)
    }
    // offsets(b) = rows in buckets < b; encode as a when-chain over
    // the (small) bucket id domain.
    val offsetCol = (1 to bounds.size).foldLeft(lit(0L)) { (acc, b) =>
      when(col("__bucket") === b, lit(offsets(b))).otherwise(acc)
    }
    val w = Window.partitionBy(col("__bucket")).orderBy(orderCol, tieBreak)
    val out = based
      .withColumn(outCol, row_number().over(w).cast("long") + offsetCol)
      .drop("__bucket")
    (out, n)
  }

  /** Adds `outCol` = exact global row_number over
    * (orderCol, tieBreak).
    */
  def withRowNumber(df: DataFrame, orderCol: Column, tieBreak: Column,
      outCol: String = "__rn", buckets: Int = 32): DataFrame =
    ranked(df, orderCol, tieBreak, outCol, buckets)._1

  /** Adds `outCol` = exact global ntile(k) (1-based, standard SQL
    * semantics) over (orderCol, tieBreak).
    */
  def withNtile(df: DataFrame, orderCol: Column, tieBreak: Column,
      k: Int, outCol: String = "tile", buckets: Int = 32): DataFrame = {
    require(k >= 1)
    val (rankedDf, n) = ranked(df, orderCol, tieBreak, "__grn", buckets)
    val q = n / k
    val r = n % k
    val rn = col("__grn")
    // First r tiles have q+1 rows, the rest q rows.
    val big = lit(q + 1) * lit(r) // rows covered by the large tiles
    val tile =
      if (q == 0) rn.cast("int") // fewer rows than tiles
      else when(rn <= big, (rn - 1) / lit(q + 1) + 1)
        .otherwise(lit(r) + (rn - big - 1) / lit(q) + 1)
    rankedDf
      .withColumn(outCol, tile.cast("int"))
      .drop("__grn")
  }
}
