package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.hash

/** Scale-adaptive parallelism spread for ROW-EXPANDING passes
  * (opt-out: spark.graft.scan.spread=false).
  *
  * The harness ships each table as one parquet file with one row
  * group, so a scan plans ONE split no matter what maxPartitionBytes
  * says — and every expansion-heavy pipeline (char grams ~300× rows,
  * shingles ~50× with an md5 per gram, per-dim embedding explosion)
  * serializes on one core while the other N−1 idle: measured 2.96 s
  * for x119's bigram pass as a 1-task stage at sf0.1 local[32].
  *
  * This helper is applied INSIDE the expansion operators, not at the
  * table accessor: a round of full-bench measurement showed a
  * table-level spread taxes every light consumer of the same table
  * +0.2–0.5 s per query (the exchange buys nothing when downstream
  * work is a few comparisons per row) while only the expansion
  * operators repay it. Gates, all scale-adaptive (never fire at
  * production sizes):
  *   (a) the frame's optimizer size estimate can't fill the machine
  *       (estimated splits at maxPartitionBytes < defaultParallelism),
  *   (b) the frame is small (≤ spark.graft.scan.spread.maxBytes,
  *       default 1 GiB) so the exchange moves a trivial byte count.
  * HASH repartition on a deterministic full-row hash, NOT round-robin:
  * repartition(n) pays a per-partition sort of the whole input
  * (spark.sql.execution.sortBeforeRepartition, kept on so retried
  * tasks reproduce their row→partition map) — measured +0.5–1 s as a
  * single-task sort on a 600k-row table; a content hash is already
  * retry-stable, needs no sort, and has ~|rows| distinct values so
  * partitions fill evenly.
  */
object Spread {

  def apply(df: DataFrame): DataFrame = {
    // Streaming frames: no-op. Computing optimizedPlan on a streaming
    // DataFrame forces UnsupportedOperationChecker.checkForBatch and
    // throws AnalysisException; the size gate is meaningless for an
    // unbounded frame anyway (micro-batch parallelism is the source's).
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val on = spark.conf.getOption("spark.graft.scan.spread")
      .forall(_.trim.equalsIgnoreCase("true"))
    if (!on) return df
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxSplit = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf
        .get("spark.sql.files.maxPartitionBytes", "128m"))
    val spreadMax = BigInt(org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf
        .get("spark.graft.scan.spread.maxBytes", "1g")))
    val cores = spark.sparkContext.defaultParallelism
    val estSplits = (bytes + maxSplit - 1) / maxSplit
    if (bytes <= spreadMax && estSplits < cores) {
      // hash the unique id column when the frame has one: cheaper
      // than hashing the whole row, and immune to the duplicate-heavy
      // corpus skew a full-row hash has (exact-dup rows share a hash
      // and pile onto one partition); fall back to the full row for
      // frames without a schema-unique key
      val keyCols = df.columns
        .filter(c => c == "doc_id" || c == "vec_id").map(df.col).toSeq
      val hashOn =
        if (keyCols.nonEmpty) keyCols else df.columns.map(df.col).toSeq
      df.repartition(cores, hash(hashOn: _*))
    } else df
  }
}
