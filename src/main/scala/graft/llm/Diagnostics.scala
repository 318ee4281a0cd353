package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pipeline observability operators (SURVEY.md §2.9 X5'/X7): the
  * reports an operator reads BEFORE picking a physical strategy at
  * 100 TB — e.g. whether a join key needs salting (x56) or AQE skew
  * handling, straight from the key-frequency distribution.
  */
object Diagnostics {

  /** X7: join-key skew report over one key column — (stat, value) KV
    * rows: row/key counts, max key frequency, exact p50/p99 of the
    * key-frequency distribution, a skew ratio (max over mean, basis
    * points), and the topK heaviest keys with their frequencies. The
    * table that decides between a plain shuffle join, a broadcast,
    * and the x56 salted join — computed without ever sorting the key
    * table.
    *
    * Exact percentiles WITHOUT a window over the |keys|-row frequency
    * table: frequencies collapse to a (freq, n_keys) HISTOGRAM first
    * (bounded by the distinct frequency count — tens of rows even on
    * skewed corpora), and the p-th percentile is the smallest
    * frequency whose cumulative key count clears p·n_keys, all in
    * exact integer arithmetic. The only windows/cross joins run on
    * that bounded histogram and on 1-row scalar aggregates; the heavy
    * hitters come from the bounded partial top-k aggregate.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    val freq = df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("f"))
    val hist = freq.groupBy(col("f")).agg(count(lit(1)).as("nk"))
    val tot = hist.agg(sum(col("f") * col("nk")).as("n_rows"),
      sum(col("nk")).as("n_keys"), max(col("f")).as("max_f"))
    val cum = hist
      .withColumn("cum", sum(col("nk")).over(Window.orderBy(col("f"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot.select(col("n_keys").as("nkk"))))
    val p50 = cum.filter(col("cum") * 2 >= col("nkk"))
      .agg(min(col("f")).as("p50_f"))
    val p99 = cum.filter(col("cum") * 100 >= col("nkk") * 99)
      .agg(min(col("f")).as("p99_f"))
    val summary = tot.crossJoin(p50).crossJoin(p99)
      .select(explode(array(
        struct(lit("n_rows").as("stat"), col("n_rows").as("value")),
        struct(lit("n_keys").as("stat"), col("n_keys").as("value")),
        struct(lit("max_freq").as("stat"), col("max_f").as("value")),
        struct(lit("p50_freq").as("stat"), col("p50_f").as("value")),
        struct(lit("p99_freq").as("stat"), col("p99_f").as("value")),
        struct(lit("skew_bp").as("stat"),
          expr("10000 * max_f * n_keys div n_rows").as("value")))).as("r"))
      .select(col("r.stat"), col("r.value"))
    val heavy = freq
      .agg(graft.functions.TopK.top_k(topK)(col("f").cast("double"),
        col("k")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "hit")))
      .select(explode(array(
        struct(concat(lit("heavy_"), (col("pos") + 1).cast("string"),
          lit("_key")).as("stat"), col("hit.vec_id").as("value")),
        struct(concat(lit("heavy_"), (col("pos") + 1).cast("string"),
          lit("_freq")).as("stat"),
          col("hit.cos").cast("long").as("value")))).as("r"))
      .select(col("r.stat"), col("r.value"))
    summary.unionByName(heavy).orderBy(col("stat"))
  }

  /** X7: ANALYZE-style column profile — per profiled column: non-null
    * value count, null count, exact distinct count, and min/max (exact
    * integer cents for numeric columns, lexicographic strings for
    * varchar — NEVER a double→string render, whose shortest-repr
    * rules differ between engines). The statistics a planner (or an
    * operator choosing x100's join strategy) reads before touching a
    * 100 TB table.
    *
    * One aggregate PER COLUMN, each over a column-pruned scan (the
    * parquet reader materializes exactly one column per pass), then
    * the six 1-row frames cross-join into the unpivot. A single
    * multi-distinct aggregate was measured 10× worse (11.1 s vs
    * ~1 s at sf0.1): Spark plans several countDistincts via Expand —
    * an n_cols× row blowup pushed through ONE shuffle — whereas one
    * distinct per aggregate stays a plain two-phase hash agg over
    * ndv-sized partials. At 100 TB, pruned per-column scans are the
    * correct columnar shape; the Expand form re-shuffles the whole
    * table n_cols times over.
    */
  def columnProfile(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String]): DataFrame = {
    def prof(c: String, isNum: Boolean): DataFrame = {
      val base = Seq(count(col(c)).as(s"n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"z_$c"),
        countDistinct(col(c)).as(s"d_$c"))
      val extra =
        if (isNum) Seq(min(round(col(c) * 100, 0).cast("long"))
          .as(s"lo_$c"),
          max(round(col(c) * 100, 0).cast("long")).as(s"hi_$c"))
        else Seq(min(col(c)).as(s"slo_$c"), max(col(c)).as(s"shi_$c"))
      val aggs = base ++ extra
      df.select(col(c)).agg(aggs.head, aggs.tail: _*)
    }
    val one = (numCols.map(prof(_, isNum = true)) ++
      strCols.map(prof(_, isNum = false)))
      .reduce((a, b) => a.crossJoin(broadcast(b)))
    val rows = numCols.map { c =>
      struct(lit(c).as("column"), col(s"n_$c").as("n_vals"),
        col(s"z_$c").as("n_null"), col(s"d_$c").as("ndv"),
        col(s"lo_$c").as("min_cents"), col(s"hi_$c").as("max_cents"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ strCols.map { c =>
      struct(lit(c).as("column"), col(s"n_$c").as("n_vals"),
        col(s"z_$c").as("n_null"), col(s"d_$c").as("ndv"),
        lit(null).cast("long").as("min_cents"),
        lit(null).cast("long").as("max_cents"),
        col(s"slo_$c").as("min_str"), col(s"shi_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.column"), col("r.n_vals"), col("r.n_null"),
        col("r.ndv"), col("r.min_cents"), col("r.max_cents"),
        col("r.min_str"), col("r.max_str"))
      .orderBy(col("column"))
  }

  /** X5n: corpus↔embedding COVERAGE audit — the cross-table
    * referential-integrity report a pipeline runs before any ANN /
    * semantic stage: per source, how many documents are covered by a
    * vector, how many are MISSING one (they silently drop out of
    * every embedding-space operator), plus the ORPHAN vectors whose
    * document is gone (stale index entries that resurface deleted
    * content). The harness tables are fully aligned, so — the
    * snapshotDiff precedent — the audited views are deterministic
    * md5 slices both engines reproduce exactly (vectors minus the
    * %missMod bucket, documents minus the %orphMod bucket); the
    * operator itself is the general shape: two narrow projections,
    * ONE id-keyed full outer join, a (source, status) hash agg.
    */
  def embeddingCoverage(docs: DataFrame, emb: DataFrame,
      missMod: Int = 7, orphMod: Int = 11): DataFrame = {
    val d = docs
      .filter(expr(graft.llm.Dedup.hash16FastExpr(
        "cast(doc_id as string)")) % orphMod =!= 0)
      .select(col("doc_id"), col("source"))
    val v = emb
      .filter(expr(graft.llm.Dedup.hash16FastExpr(
        "cast(vec_id as string)")) % missMod =!= 0)
      .select(col("vec_id"))
    d.join(v, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("source"), lit("__orphan")).as("source"),
        when(col("doc_id").isNotNull && col("vec_id").isNotNull,
          "covered")
          .when(col("vec_id").isNull, "missing_vec")
          .otherwise("orphan_vec").as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("status"))
  }

  def embeddingCoverageSql(missMod: Int = 7, orphMod: Int = 11): String =
    s"""WITH d AS (
       |  SELECT doc_id, source FROM documents
       |  WHERE ${graft.llm.Dedup.hash16Expr("strpos",
              "CAST(doc_id AS VARCHAR)")} % $orphMod <> 0
       |), v AS (
       |  SELECT vec_id FROM embeddings
       |  WHERE ${graft.llm.Dedup.hash16Expr("strpos",
              "CAST(vec_id AS VARCHAR)")} % $missMod <> 0
       |)
       |SELECT COALESCE(source, '__orphan') AS source,
       |  CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
       |         THEN 'covered'
       |       WHEN vec_id IS NULL THEN 'missing_vec'
       |       ELSE 'orphan_vec' END AS status,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM d FULL OUTER JOIN v ON d.doc_id = v.vec_id
       |GROUP BY 1, 2 ORDER BY source, status""".stripMargin

  def columnProfileSql(table: String, numCols: Seq[String],
      strCols: Seq[String]): String = {
    val arms = numCols.map { c =>
      s"""  SELECT '$c' AS "column", CAST(count($c) AS BIGINT) AS n_vals,
         |    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_null,
         |    CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
         |    CAST(min(round($c * 100)) AS BIGINT) AS min_cents,
         |    CAST(max(round($c * 100)) AS BIGINT) AS max_cents,
         |    CAST(NULL AS VARCHAR) AS min_str,
         |    CAST(NULL AS VARCHAR) AS max_str
         |  FROM $table""".stripMargin
    } ++ strCols.map { c =>
      s"""  SELECT '$c', CAST(count($c) AS BIGINT),
         |    CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |    CAST(count(DISTINCT $c) AS BIGINT),
         |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |    min($c), max($c)
         |  FROM $table""".stripMargin
    }
    s"""SELECT * FROM (
       |${arms.mkString("\n  UNION ALL\n")}
       |) ORDER BY "column"""".stripMargin
  }

  def keySkewSql(table: String, keyCol: String, topK: Int = 5): String =
    s"""WITH freq AS (
       |  SELECT $keyCol AS k, count(*) AS f FROM $table GROUP BY 1
       |), hist AS (
       |  SELECT f, count(*) AS nk FROM freq GROUP BY 1
       |), tot AS (
       |  SELECT CAST(sum(f * nk) AS BIGINT) AS n_rows,
       |         CAST(sum(nk) AS BIGINT) AS n_keys,
       |         CAST(max(f) AS BIGINT) AS max_f
       |  FROM hist
       |), cum AS (
       |  SELECT f, sum(nk) OVER (ORDER BY f) AS cum FROM hist
       |), p50 AS (
       |  SELECT CAST(min(f) AS BIGINT) AS p50_f
       |  FROM cum CROSS JOIN tot WHERE cum * 2 >= n_keys
       |), p99 AS (
       |  SELECT CAST(min(f) AS BIGINT) AS p99_f
       |  FROM cum CROSS JOIN tot WHERE cum * 100 >= n_keys * 99
       |), heavy AS (
       |  SELECT k, f, row_number() OVER (ORDER BY f DESC, k) AS rnk
       |  FROM freq
       |)
       |SELECT stat, value FROM (
       |  SELECT 'n_rows' AS stat, n_rows AS value FROM tot
       |  UNION ALL SELECT 'n_keys', n_keys FROM tot
       |  UNION ALL SELECT 'max_freq', max_f FROM tot
       |  UNION ALL SELECT 'p50_freq', p50_f FROM p50
       |  UNION ALL SELECT 'p99_freq', p99_f FROM p99
       |  UNION ALL SELECT 'skew_bp',
       |    CAST(10000 * max_f * n_keys // n_rows AS BIGINT) FROM tot
       |  UNION ALL SELECT 'heavy_' || rnk || '_key', CAST(k AS BIGINT)
       |    FROM heavy WHERE rnk <= $topK
       |  UNION ALL SELECT 'heavy_' || rnk || '_freq', CAST(f AS BIGINT)
       |    FROM heavy WHERE rnk <= $topK
       |) ORDER BY stat""".stripMargin

  /** Cross-source QUANTILE NORMALIZATION of a per-document score —
    * each document's score is replaced by the GLOBAL score found at
    * its within-source quantile, the standard fix before comparing or
    * budgeting across sources whose scorers are miscalibrated (a
    * "0.8" from a news crawl and a "0.8" from a forum dump are not
    * the same quality; their 80th percentiles are comparable).
    *
    * Exact integer mapping: within-source rank r of n_s (ordered by
    * (score, doc_id) — the tie-break makes the map deterministic)
    * lands on global rank g = 1 + ((r−1)·(N−1)) div (n_s−1)
    * (singleton sources take the global median (N+1) div 2). The
    * rank product is widened to DECIMAL(38,0) before the multiply —
    * r·N overflows int64 around N ≈ 3·10⁹ — and both engines
    * truncate the same way on non-negative operands.
    *
    * Scale shape: the within-source window is PARTITIONED BY source
    * (never global); the global rank comes from OrderedRank's
    * bucketed range sort (no single-partition window); the final
    * lookup is an equi-join on the global rank — at 100 TB all three
    * are plain co-keyed exchanges.
    */
  def quantileNormalize(docs: DataFrame): DataFrame = {
    val base = graft.tools.Materialize(
      docs.select(col("doc_id"), col("source"),
        col("n_chars").as("score")))
    val w = Window.partitionBy(col("source"))
    val srcRanked = base
      .withColumn("r", row_number().over(
        w.orderBy(col("score"), col("doc_id"))))
      .withColumn("ns", count(lit(1)).over(w))
    val globalRanked = graft.ts.OrderedRank
      .withRowNumber(base, col("score"), col("doc_id"), "grn")
      .select(col("grn"), col("score").as("norm_score"))
    val n1 = base.agg(count(lit(1)).as("nn"))
    srcRanked.crossJoin(broadcast(n1))
      .withColumn("g", expr(
        """CASE WHEN ns = 1 THEN (nn + 1) div 2
          |ELSE 1L + (cast(r - 1 as decimal(38,0)) * (nn - 1)) div (ns - 1)
          |END""".stripMargin))
      .join(globalRanked, col("g") === col("grn"))
      .select(col("doc_id"), col("source"), col("score"),
        col("norm_score"))
      .orderBy(col("doc_id"))
  }

  /** Z-ORDER clustering-key layout advisor — the multi-dimensional
    * data-layout trick (Morton order; what Delta's OPTIMIZE ZORDER
    * and Iceberg's sort orders compute): interleave the bits of two
    * bounded dimension keys so that consecutive key ranges cover
    * small TILES of the (x, y) plane, and point/range predicates on
    * EITHER dimension prune most files. The report shows the property
    * a file-skipping planner buys: per 1024-key bucket (= one aligned
    * 32×32 tile), the row count and the min/max/span of both raw
    * dimensions — spans ≤ 31 by construction, vs ~the full dimension
    * range under any single-dimension ordering.
    *
    * Dimensions here: x = user_id mod 256, y = minute-of-day div 6
    * (0..239) from the event time — the two columns an events table
    * is typically filtered by together. All arithmetic is integer
    * bit math (shift/and), identical in both engines; epoch seconds
    * are floored the same way on both sides.
    *
    * Scale shape: one map-only pass computes z per row (pure codegen
    * bit ops), one hash aggregate reduces to ≤64 bucket rows. At
    * 100 TB the same z expression IS the repartitionByRange /
    * write-sort key; this query is its effectiveness audit.
    */
  def zorderLayout(events: DataFrame): DataFrame = {
    val z = (0 until 8).map(i =>
      s"shiftleft(shiftright(xb, $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(yb, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")
    events
      .select(pmod(col("user_id"), lit(256)).cast("int").as("xb"),
        expr("cast((cast(ts as long) div 60) % 1440 div 6 as int)")
          .as("yb"))
      .withColumn("bucket", expr(s"($z) div 1024"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("xb")).as("x_min"), max(col("xb")).as("x_max"),
        min(col("yb")).as("y_min"), max(col("yb")).as("y_max"))
      .select(col("bucket"), col("n"),
        col("x_min"), col("x_max"),
        (col("x_max") - col("x_min")).as("x_span"),
        col("y_min"), col("y_max"),
        (col("y_max") - col("y_min")).as("y_span"))
      .orderBy(col("bucket"))
  }

  /** Oracle: the same bit interleave with `>> & <<` operators. */
  val zorderLayoutSql: String = {
    val z = (0 until 8).map(i =>
      s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    s"""WITH b AS (
       |  SELECT CAST(user_id % 256 AS INT) AS xb,
       |         CAST((CAST(floor(epoch(ts)) AS BIGINT) // 60) % 1440 // 6
       |           AS INT) AS yb
       |  FROM events
       |), zb AS (SELECT xb, yb, ($z) // 1024 AS bucket FROM b)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(xb) AS INT) AS x_min, CAST(max(xb) AS INT) AS x_max,
       |  CAST(max(xb) - min(xb) AS INT) AS x_span,
       |  CAST(min(yb) AS INT) AS y_min, CAST(max(yb) AS INT) AS y_max,
       |  CAST(max(yb) - min(yb) AS INT) AS y_span
       |FROM zb GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** Oracle: plain window ranks (fine at oracle scale) + the same
    * integer target-rank arithmetic in HUGEINT.
    */
  val quantileNormalizeSql: String =
    """WITH base AS (
      |  SELECT doc_id, source, n_chars AS score FROM documents
      |), s AS (
      |  SELECT doc_id, source, score,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY score, doc_id) AS r,
      |         count(*) OVER (PARTITION BY source) AS ns
      |  FROM base
      |), g AS (
      |  SELECT score AS norm_score,
      |         row_number() OVER (ORDER BY score, doc_id) AS grn
      |  FROM base
      |), nn AS (SELECT count(*) AS nn FROM base)
      |SELECT s.doc_id, s.source, s.score, g.norm_score
      |FROM s CROSS JOIN nn
      |JOIN g ON g.grn = CASE WHEN s.ns = 1 THEN (nn.nn + 1) // 2
      |  ELSE 1 + (CAST(s.r - 1 AS HUGEINT) * (nn.nn - 1)) // (s.ns - 1)
      |  END
      |ORDER BY s.doc_id""".stripMargin
}
