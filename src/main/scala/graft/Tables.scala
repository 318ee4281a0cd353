package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the harness parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so scan behavior is uniform:
  * parquet relations with Catalyst column pruning + predicate pushdown
  * (the reference instead re-reads CSV with inferSchema per use,
  * SURVEY.md §4.1). At 100 TB these would be partitioned/bucketed
  * tables behind the same accessor.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df =
      if (name == "events") eventsNanos(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$name.parquet")
    if (spreadTables(spark)(name))
      spreadSmallScan(spark, s"$sfDir/$name.parquet", df)
    else df
  }

  /** Tables whose per-row payload feeds ROW-EXPANDING operators
    * (text tokenization/shingling expands ~50×, char grams ~300×,
    * embedding position explosion ~64×): for these the scan's byte
    * count undercounts downstream work by the expansion factor, so
    * the spread below is worth its exchange. Relational tables
    * without expansion keep Spark's size-based splits — measured:
    * spreading lineitem cost +0.3-0.5 s on every TPC-H-shape query
    * (the extra exchange) while buying nothing, since their per-row
    * work is a few comparisons. Conf-parameterized for clusters whose
    * expansion profile differs.
    */
  private def spreadTables(spark: SparkSession): Set[String] =
    spark.conf.getOption("spark.graft.scan.spread.tables")
      .getOrElse("documents,embeddings")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet

  /** Scale-adaptive scan spread (opt-out: spark.graft.scan.spread=false).
    *
    * The harness ships each table as ONE parquet file with ONE row
    * group, so Spark's scan plans a single split regardless of
    * maxPartitionBytes — and every downstream map-heavy pipeline
    * (shingle/gram explosions, embedding math) serializes on one core
    * while the other N−1 idle: measured 2.96 s for x119's bigram pass
    * as a 1-task stage at sf0.1 local[32]. The optimization guide's
    * input-skew rule ("one huge unsplittable file: repartition
    * immediately after the read", §2.5) applied adaptively:
    * round-robin repartition to defaultParallelism ONLY when
    *   (a) the file's own split count (bytes / maxPartitionBytes)
    *       is below defaultParallelism — i.e. the scan cannot feed
    *       the machine by itself, AND
    *   (b) the whole table is small (< spreadMaxBytes, default 1 GiB)
    *       so the extra exchange moves a trivial number of bytes.
    * At production scale both conditions fail (a 100 TB table plans
    * ~10⁶ splits and exceeds any small-table bound), so the exchange
    * never appears there; it exists precisely when its cost is
    * epsilon and its payoff is full-machine parallelism. Knobs:
    * spark.graft.scan.spread.maxBytes bounds (b) for clusters whose
    * "cheap shuffle" budget differs.
    */
  private def spreadSmallScan(spark: SparkSession, path: String,
      df: DataFrame): DataFrame = {
    val on = spark.conf.getOption("spark.graft.scan.spread")
      .forall(_.trim.equalsIgnoreCase("true"))
    if (!on) return df
    val f = new java.io.File(path)
    val bytes =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.map(_.length()).sum
      else f.length()
    val maxSplit = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf
        .get("spark.sql.files.maxPartitionBytes", "128m"))
    val spreadMax = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf
        .get("spark.graft.scan.spread.maxBytes", "1g"))
    val cores = spark.sparkContext.defaultParallelism
    val estSplits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (estSplits < cores && bytes <= spreadMax) {
      // HASH repartition on a deterministic full-row hash, NOT
      // round-robin: repartition(n) pays a per-partition sort of the
      // whole input (spark.sql.execution.sortBeforeRepartition, on by
      // default so retried tasks reproduce their row→partition map) —
      // measured +0.5-1 s on every 600k-row lineitem query as a
      // single-task sort. A content hash is already deterministic
      // under retries, needs no sort, and has ~|rows| distinct values
      // so 32 partitions fill evenly (guide §2.5).
      import org.apache.spark.sql.functions.hash
      df.repartition(cores, hash(df.columns.map(df.col): _*))
    } else df
  }

  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) (which
    * Spark's vectorized reader rejects — read as raw nanos via the
    * legacy knob and truncate) and plain TIMESTAMP(MICROS) NTZ.
    * Detect which variant this dataset carries and normalize both to
    * microsecond TIMESTAMP, matching what DuckDB sees when it loads
    * the same file so oracle comparisons stay bit-identical (session
    * timezone is UTC everywhere, so the NTZ cast is a no-op shift).
    */
  private def eventsNanos(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→Timestamp cast below is identity ONLY under a UTC
    // session zone; pin it here so correctness never depends on
    // caller configuration (a non-UTC session would silently shift
    // every event timestamp vs what DuckDB reads from the same file)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        // integer `div`, not double division: epoch-nanos exceeds 2^53
        // so a double round-trip would corrupt the low microsecond digits.
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected nanos-long, " +
          "TIMESTAMP, or TIMESTAMP_NTZ) — refusing to cast blindly")
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
