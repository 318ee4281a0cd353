package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sampling operators for training-data curation (SURVEY.md §2.9) —
  * the reproducible subsetting a 100 TB corpus pipeline needs.
  * `df.sample()` is seed-dependent on partition layout, so none of
  * these use RNG: sampling keys on a content hash gives the same
  * subset on any cluster shape, any partition count, any engine —
  * which is also what makes them oracle-checkable in DuckDB.
  */
object Sampling {

  /** 16-bit integer from the first 4 md5 hex nibbles — portable
    * across Spark (`instr`) and DuckDB (`strpos`), same trick as
    * Dedup.simhash.
    */
  private def hash16(instrFn: String, strCol: String): String =
    (1 to 4).map(p =>
      s"(($instrFn('0123456789abcdef', substr(md5($strCol), $p, 1)) - 1)" +
        s" * ${1 << (4 * (4 - p))})")
      .mkString("(", " + ", ")")

  /** Deterministic pct% sample: keep a row iff hash16(key) falls in
    * the first pct/100 of the hash space. A pure filter — fully
    * pushed into the scan, no shuffle, no state; rerunning at any
    * scale selects the same rows.
    */
  def hashSample(docs: DataFrame, keyExpr: String, pct: Int): DataFrame =
    docs.filter(expr(
      s"${hash16("instr", keyExpr)} % 100 < $pct"))

  def hashSampleSql(keyExpr: String, pct: Int, select: String): String =
    s"""SELECT $select FROM documents
       |WHERE ${hash16("strpos", keyExpr)} % 100 < $pct""".stripMargin

  /** Stratified fixed-size sample: n rows per stratum, chosen by
    * hash order (deterministic "reservoir"). One shuffle on the
    * stratum key; per-stratum top-n is a partial TakeOrdered, so a
    * hot stratum never sorts more than n rows per partition.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
      keyExpr: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(expr(s"md5($keyExpr)"))
    docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
  }

  def stratifiedSampleSql(stratumCol: String, keyExpr: String, n: Int,
      select: String): String =
    s"""SELECT $select, rk FROM (
       |  SELECT *, CAST(row_number() OVER (
       |    PARTITION BY $stratumCol ORDER BY md5($keyExpr)) AS INT) AS rk
       |  FROM documents)
       |WHERE rk <= $n""".stripMargin

  /** Efraimidis–Spirakis weighted sampling, deterministic: each row's
    * "random" uniform comes from its content hash (u = (hash16+1)/
    * 65537), the selection key is ln(u)/w — the monotone-equivalent
    * of u^(1/w), so a row's selection probability is proportional to
    * its weight — and the k largest keys win. Distributed cost is a
    * TakeOrdered top-k (per-partition heads + driver merge), no RNG,
    * no shuffle of the data: the weighted corpus subsetting a
    * training-data pipeline runs at 100 TB, reproducible on any
    * cluster shape. Ties broken by the order column for a total
    * order.
    */
  def weightedSample(docs: DataFrame, keyExpr: String, weightExpr: String,
      k: Int, tieBreak: String): DataFrame =
    docs.filter(expr(s"$weightExpr > 0"))
      .withColumn("__wkey", expr(
        s"ln((${hash16("instr", keyExpr)} + 1) / 65537.0) / ($weightExpr)"))
      .orderBy(col("__wkey").desc, col(tieBreak))
      .limit(k)
      .drop("__wkey")

  def weightedSampleSql(keyExpr: String, weightExpr: String, k: Int,
      tieBreak: String, select: String): String =
    s"""SELECT $select FROM documents
       |WHERE $weightExpr > 0
       |ORDER BY ln((${hash16("strpos", keyExpr)} + 1) / 65537.0)
       |           / ($weightExpr) DESC, $tieBreak
       |LIMIT $k""".stripMargin
}
