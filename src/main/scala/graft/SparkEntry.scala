package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DarimaQueries, Extensions, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator surface (one entry per
  * implemented operator from SURVEY.md §2); `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for every SQL-expressible entry. Both
  * maps are assembled from the per-domain packs under graft.queries.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q14_join_revenue")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ DarimaQueries.queries ++ Extensions.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ DarimaQueries.oracles ++ Extensions.oracles
}
