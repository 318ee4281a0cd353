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

  /** Temperature-weighted mixture sampling — the domain-mixing step
    * of a pretraining pipeline (sampling weights ∝ sizeᵗ flatten the
    * source distribution; GPT-3/Pile lineage): apportion a document
    * budget across sources by largest-remainder rounding of the
    * tempered quotas, then take each source's allocation in
    * deterministic hash order.
    *
    * The allocation runs on the |sources|-row count table (a
    * dimension — the one deliberate single-partition window in this
    * operator), quotas are rounded to 9dp so both engines floor and
    * rank identical doubles, and the per-source pick is the
    * stratified hash-order rank. A source smaller than its allocation
    * contributes everything it has (budget under-fill, documented).
    */
  def temperatureMix(docs: DataFrame, budget: Int,
      tau: Double = 0.7): DataFrame = {
    val cnt = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
    val alloc = allocations(cnt, budget, tau)
    val w = Window.partitionBy(col("source"))
      .orderBy(expr("md5(cast(doc_id as string))"))
    docs
      .withColumn("rk", row_number().over(w))
      .join(alloc, Seq("source"))
      .filter(col("rk") <= col("alloc"))
      .select(col("source"), col("rk"), col("alloc"), col("doc_id"),
        col("n_chars"))
      .orderBy(col("source"), col("rk"))
  }

  /** The allocation finisher of [[temperatureMix]], factored over a
    * (source, cnt) count table so the batch operator and the
    * streaming running-count twin share one definition (the stream
    * maintains the counts as bounded per-source state and applies
    * this at drain/checkpoint time — the |sources|-row dimension is
    * the only input, so the finisher costs nothing at any corpus
    * size).
    */
  def allocations(cnt: DataFrame, budget: Int, tau: Double,
      keyCol: String = "source"): DataFrame = {
    val z = cnt.agg(round(sum(pow(col("cnt"), lit(tau))), 9).as("z"))
    val quota = cnt.crossJoin(broadcast(z))
      .withColumn("q",
        round(lit(budget) * pow(col("cnt"), lit(tau)) / col("z"), 9))
      .withColumn("base", floor(col("q")).cast("long"))
      .withColumn("rem", col("q") - floor(col("q")))
    val spent = quota.agg(sum(col("base")).as("sb"))
    quota
      .withColumn("rrk", row_number().over(
        Window.orderBy(col("rem").desc, col(keyCol))))
      .crossJoin(broadcast(spent))
      .withColumn("alloc",
        (col("base") + when(col("rrk") <= lit(budget) - col("sb"), 1L)
          .otherwise(0L)).cast("int"))
      .select(col(keyCol), col("alloc"))
  }

  /** X6': token-budget mix planning with repetition caps — the "data
    * recipe" table a pretraining run is configured from. A global
    * token `budget` spreads across sources ∝ tokens^τ (the x45
    * temperature flattening, largest-remainder exact so round 1 sums
    * to the budget), but no source may be allocated more than
    * `maxEpochs` passes over its actual tokens; the budget stranded
    * at capped sources re-spreads ONCE across the uncapped ones
    * (floor-only, so a second cap tier can undershoot by design —
    * one waterfill round is the standard practical approximation,
    * and the undershoot is visible as sum(alloc) < budget). Output
    * per source: tokens, cap, alloc, implied epochs in exact basis
    * points, and the capped flag.
    *
    * Scale shape: ONE corpus aggregate (token counts per source);
    * everything after runs on the |sources|-row dimension table —
    * the x45 convention, including its benign dimension-table window.
    */
  def epochMixPlan(docs: DataFrame, budget: Long, tau: Double = 0.7,
      maxEpochs: Int = 4): DataFrame = {
    val cnt = docs
      .select(col("source"), size(split(col("text"), " ")).as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("tokens"))
    val z = cnt.agg(round(sum(pow(col("tokens"), lit(tau))), 9).as("z"))
    val quota = cnt.crossJoin(broadcast(z))
      .withColumn("q",
        round(lit(budget) * pow(col("tokens"), lit(tau)) / col("z"), 9))
      .withColumn("base", floor(col("q")).cast("long"))
      .withColumn("rem", col("q") - floor(col("q")))
    val spent = quota.agg(sum(col("base")).as("sb"))
    val r1 = quota
      .withColumn("rrk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))))
      .crossJoin(broadcast(spent))
      .withColumn("alloc0",
        col("base") + when(col("rrk") <= lit(budget) - col("sb"), 1L)
          .otherwise(0L))
      .withColumn("cap", col("tokens") * maxEpochs)
      .withColumn("a1", least(col("alloc0"), col("cap")))
    val leftover = r1.agg(coalesce(sum(col("alloc0") - col("a1")), lit(0L))
      .as("lo"))
    val z2 = r1.filter(col("a1") < col("cap"))
      .agg(round(sum(pow(col("tokens"), lit(tau))), 9).as("z2"))
    r1.crossJoin(broadcast(leftover)).crossJoin(broadcast(z2))
      .withColumn("alloc", least(
        col("a1") + when(
          col("a1") < col("cap") && col("z2").isNotNull && col("z2") > 0,
          floor(round(col("lo") * pow(col("tokens"), lit(tau)) / col("z2"),
            9)).cast("long")).otherwise(0L),
        col("cap")))
      .select(col("source"), col("tokens"), col("cap"), col("alloc"),
        expr("10000 * alloc div tokens").as("epochs_bp"),
        (col("alloc") === col("cap")).as("capped"))
      .orderBy(col("source"))
  }

  def epochMixPlanSql(budget: Long, tau: Double = 0.7,
      maxEpochs: Int = 4): String =
    s"""WITH cnt AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY 1
       |), z AS (SELECT round(sum(pow(tokens, $tau)), 9) AS z FROM cnt),
       |quota AS (
       |  SELECT source, tokens,
       |    round($budget * pow(tokens, $tau) / z, 9) AS q
       |  FROM cnt CROSS JOIN z
       |), qb AS (
       |  SELECT source, tokens, CAST(floor(q) AS BIGINT) AS base,
       |    q - floor(q) AS rem
       |  FROM quota
       |), spent AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM qb),
       |r1 AS (
       |  SELECT source, tokens,
       |    base + (CASE WHEN rrk <= $budget - sb THEN 1 ELSE 0 END)
       |      AS alloc0,
       |    tokens * $maxEpochs AS cap
       |  FROM (SELECT source, tokens, base, rem,
       |          row_number() OVER (ORDER BY rem DESC, source) AS rrk
       |        FROM qb)
       |       CROSS JOIN spent
       |), a1t AS (
       |  SELECT source, tokens, cap, alloc0, least(alloc0, cap) AS a1
       |  FROM r1
       |), lo AS (
       |  SELECT COALESCE(CAST(sum(alloc0 - a1) AS BIGINT), 0) AS lo
       |  FROM a1t
       |), z2 AS (
       |  SELECT round(sum(pow(tokens, $tau)), 9) AS z2
       |  FROM a1t WHERE a1 < cap
       |), fin AS (
       |  SELECT source, tokens, cap,
       |    least(a1 + CASE WHEN a1 < cap AND z2 IS NOT NULL AND z2 > 0
       |      THEN CAST(floor(round(lo * pow(tokens, $tau) / z2, 9))
       |           AS BIGINT)
       |      ELSE 0 END, cap) AS alloc
       |  FROM a1t CROSS JOIN lo CROSS JOIN z2
       |)
       |SELECT source, tokens, CAST(cap AS BIGINT) AS cap,
       |  CAST(alloc AS BIGINT) AS alloc,
       |  CAST(10000 * alloc // tokens AS BIGINT) AS epochs_bp,
       |  alloc = cap AS capped
       |FROM fin ORDER BY source""".stripMargin

  def temperatureMixSql(budget: Int, tau: Double = 0.7): String =
    s"""WITH cnt AS (
       |  SELECT source, count(*) AS cnt FROM documents GROUP BY source
       |), z AS (
       |  SELECT round(sum(pow(cnt, $tau)), 9) AS z FROM cnt
       |), quota AS (
       |  SELECT source, round($budget * pow(cnt, $tau) / z, 9) AS q
       |  FROM cnt CROSS JOIN z
       |), qb AS (
       |  SELECT source, CAST(floor(q) AS BIGINT) AS base,
       |         q - floor(q) AS rem
       |  FROM quota
       |), spent AS (
       |  SELECT CAST(sum(base) AS BIGINT) AS sb FROM qb
       |), alloc AS (
       |  SELECT source, CAST(base + (CASE WHEN rrk <= $budget - sb
       |    THEN 1 ELSE 0 END) AS INT) AS alloc
       |  FROM (SELECT source, base, rem,
       |          row_number() OVER (ORDER BY rem DESC, source) AS rrk
       |        FROM qb) CROSS JOIN spent
       |), ranked AS (
       |  SELECT source, doc_id, n_chars, CAST(row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY md5(CAST(doc_id AS VARCHAR))) AS INT) AS rk
       |  FROM documents
       |)
       |SELECT r.source, r.rk, a.alloc, r.doc_id, r.n_chars
       |FROM ranked r JOIN alloc a USING (source)
       |WHERE r.rk <= a.alloc
       |ORDER BY r.source, r.rk""".stripMargin

  /** X6': UniMax token-budget mix — the THIRD allocation policy of
    * the planner family (x45 flattens ∝ tokensᵗ, x98 adds epoch caps
    * to that; UniMax ignores corpus proportions entirely): every
    * source gets an EQUAL share of the budget, capped at `maxEpochs`
    * passes over its own tokens, and budget stranded at small
    * sources water-fills into the rest. The exact closed form: sort
    * sources by cap ascending; source at rank i saturates iff giving
    * all n−i+1 remaining sources its cap still fits the remaining
    * budget (a prefix property — one window pass finds the
    * threshold); unsaturated sources split the leftover equally,
    * integer-exact via div/mod with the mod remainder going to the
    * lowest-ranked unsaturated sources. Σ alloc = budget whenever
    * Σ cap ≥ budget; otherwise every source caps and the underfill
    * is visible as sum(alloc) < budget (same contract as x98).
    *
    * Scale shape: ONE corpus aggregate (per-source token counts);
    * ranking, prefix sums, and the threshold all run on the
    * |sources|-row dimension table (the x45/x98 benign dimension
    * window). Pure integer arithmetic — no floats anywhere.
    */
  def unimaxMix(docs: DataFrame, budget: Long,
      maxEpochs: Int = 4): DataFrame = {
    val cnt = docs
      .select(col("source"), size(split(col("text"), " ")).as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("tokens"))
      .withColumn("cap", col("tokens") * maxEpochs)
    val w = Window.orderBy(col("cap"), col("source"))
    val nn = cnt.agg(count(lit(1)).as("n"))
    val ranked = cnt
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("pfx", sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(nn))
      .withColumn("is_sat",
        col("cap") * (col("n") - col("rk") + 1) +
          (col("pfx") - col("cap")) <= lit(budget))
    val thr = ranked.agg(
      coalesce(sum(col("is_sat").cast("long")), lit(0L)).as("k"),
      coalesce(sum(when(col("is_sat"), col("cap"))), lit(0L)).as("pk"))
    ranked.crossJoin(broadcast(thr))
      .withColumn("m", col("n") - col("k"))
      .withColumn("base",
        when(col("m") > 0, expr(s"($budget - pk) div m"))
          .otherwise(lit(0L)))
      .withColumn("rem",
        when(col("m") > 0, expr(s"($budget - pk) % m"))
          .otherwise(lit(0L)))
      .withColumn("alloc", when(col("is_sat"), col("cap"))
        .otherwise(col("base") +
          when(col("rk") - col("k") <= col("rem"), 1L).otherwise(0L)))
      .select(col("source"), col("tokens"), col("cap"), col("alloc"),
        expr("10000 * alloc div tokens").as("epochs_bp"),
        col("is_sat").as("saturated"))
      .orderBy(col("source"))
  }

  /** X6g: quality-budget SELECTION — the DCLM/FineWeb-style "keep
    * the best documents until a global token budget is spent": rank
    * every document by a quality signal (the x08 uniqueness ratio,
    * quantized to exact integer millionths), walk the ranking in
    * order accumulating token counts, keep a document iff the tokens
    * BEFORE it are still under `budget`, and report the per-source
    * outcome (docs/tokens kept, shares in basis points). The mix
    * planners (x45/x98/x120) decide how much of each SOURCE to take;
    * this is the orthogonal policy that decides WHICH documents,
    * globally, quality-first — and the report shows which sources a
    * pure-quality budget starves.
    *
    * Scale shape: a map-only scoring projection, ONE distributed
    * OrderedRank prefix-sum pass over (score desc, doc_id) — bucketed
    * range sort, no single-reducer window — a keep-flag comparison,
    * and a hash aggregate to the \|sources\|-row report. The score
    * and the running token sum are exact longs, so the keep frontier
    * is the same in any engine.
    */
  def qualityBudgetSelect(docs: DataFrame, budget: Long): DataFrame = {
    val scored = docs
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tokens", size(col("t")).cast("long"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr("size(array_distinct(t)) * 1000000L div n_tokens")
          .as("score"))
    val summed = graft.ts.OrderedRank.withPrefixSum(
      scored, negate(col("score")).cast("double"), col("doc_id"),
      col("n_tokens"), "cum_before")
    summed
      .withColumn("keep", col("cum_before") < lit(budget))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("kept_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("keep"), col("n_tokens")).otherwise(0L))
          .as("kept_tokens"))
      .select(col("source"), col("n_docs"), col("kept_docs"),
        col("n_tokens"), col("kept_tokens"),
        expr("kept_docs * 10000 div n_docs").as("kept_docs_bp"),
        expr("kept_tokens * 10000 div n_tokens").as("kept_tokens_bp"))
      .orderBy(col("source"))
  }

  /** Oracle: same integer score, same (score desc, doc_id) order via
    * an exclusive window sum, same integer keep frontier.
    */
  def qualityBudgetSelectSql(budget: Long): String =
    s"""WITH sc AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(string_split(text, ' '))) * 1000000
       |      // len(string_split(text, ' ')) AS BIGINT) AS score
       |  FROM documents
       |), cum AS (
       |  SELECT source, n_tokens,
       |    CAST(COALESCE(sum(n_tokens) OVER (
       |      ORDER BY score DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum_before
       |  FROM sc
       |), k AS (
       |  SELECT source, n_tokens, cum_before < $budget AS keep
       |  FROM cum
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
       |    AS kept_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 10000
       |    // count(*) AS BIGINT) AS kept_docs_bp,
       |  CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) * 10000
       |    // sum(n_tokens) AS BIGINT) AS kept_tokens_bp
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  def unimaxMixSql(budget: Long, maxEpochs: Int = 4): String =
    s"""WITH cnt AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
       |  FROM documents GROUP BY source
       |), c2 AS (
       |  SELECT source, tokens, tokens * $maxEpochs AS cap FROM cnt
       |), nn AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM c2
       |), rkd AS (
       |  SELECT source, tokens, cap,
       |    CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT)
       |      AS rk,
       |    CAST(sum(cap) OVER (ORDER BY cap, source
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
       |  FROM c2
       |), sat AS (
       |  SELECT r.*, n,
       |    cap * (n - rk + 1) + (pfx - cap) <= $budget AS is_sat
       |  FROM rkd r CROSS JOIN nn
       |), thr AS (
       |  SELECT
       |    CAST(COALESCE(sum(CASE WHEN is_sat THEN 1 ELSE 0 END), 0)
       |      AS BIGINT) AS k,
       |    CAST(COALESCE(sum(CASE WHEN is_sat THEN cap ELSE 0 END), 0)
       |      AS BIGINT) AS pk
       |  FROM sat
       |)
       |SELECT source, tokens, CAST(cap AS BIGINT) AS cap,
       |  CAST(CASE WHEN is_sat THEN cap
       |    ELSE ($budget - pk) // NULLIF(n - k, 0) +
       |      (CASE WHEN rk - k <= ($budget - pk) % NULLIF(n - k, 0)
       |       THEN 1 ELSE 0 END)
       |    END AS BIGINT) AS alloc,
       |  CAST(10000 * (CASE WHEN is_sat THEN cap
       |    ELSE ($budget - pk) // NULLIF(n - k, 0) +
       |      (CASE WHEN rk - k <= ($budget - pk) % NULLIF(n - k, 0)
       |       THEN 1 ELSE 0 END)
       |    END) // tokens AS BIGINT) AS epochs_bp,
       |  is_sat AS saturated
       |FROM sat CROSS JOIN thr
       |ORDER BY source""".stripMargin

  /** X6: CURRICULUM ordering — the data-side operator of curriculum
    * learning: every document gets a training PHASE (difficulty
    * terciles/k-tiles by token count, the standard length proxy —
    * exact distributed ntile, no global sort) and a deterministic
    * WITHIN-PHASE shuffle position (rank of md5(doc_id) inside the
    * phase), so a trainer reads phase 1 → 2 → … easy-to-hard with a
    * reproducible shuffle inside each phase. Deterministic across
    * runs and engines: ties cannot exist ((n_tokens, md5) is a total
    * order), so the table is a pure function of the corpus.
    *
    * Scale shape: two OrderedRank passes (bucketed range sort +
    * ≤buckets-row offset join — never a single-partition window):
    * one for the phase ntile, one global row_number over the
    * (phase, shuffle-key) composite; within-phase position is that
    * global rank minus the phase offset (a ≤`phases`-row collected
    * count frame). The composite key packs the phase above the
    * first 40 md5 bits — for lowercase hex, numeric prefix order
    * equals lexicographic order, so (prefix, full-key) sorts
    * exactly like the full key.
    */
  def curriculumOrder(docs: DataFrame, phases: Int): DataFrame = {
    require(phases >= 1 && phases <= 100, s"phases=$phases")
    val scored = docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n_tokens"),
      md5(col("doc_id").cast("string")).as("__shuf"))
    val phased = graft.ts.OrderedRank.withNtile(scored,
      col("n_tokens"), col("__shuf"), phases, "phase")
    val composite = col("phase").cast("long") * lit(1L << 44) +
      expr("cast(conv(substr(__shuf, 1, 10), 16, 10) as bigint)")
    val ranked = graft.ts.OrderedRank.withRowNumber(
      phased.withColumn("__ord", composite), col("__ord"),
      col("__shuf"), "__grn")
    // phase offsets: a ≤phases-row frame, folded into a literal chain
    val sizes = phased.groupBy(col("phase")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (1 to phases).map(p =>
      p -> (1 until p).map(q => sizes.getOrElse(q, 0L)).sum).toMap
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (p, off)) =>
      when(col("phase") === p, lit(off)).otherwise(acc)
    }
    ranked
      .select(col("doc_id"), col("n_tokens"), col("phase"),
        (col("__grn") - offCol).as("ord"))
      .orderBy(col("phase"), col("ord"))
  }

  /** Oracle: plain NTILE + per-phase row_number over the identical
    * shuffle key.
    */
  def curriculumOrderSql(phases: Int): String =
    s"""WITH sc AS (
       |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR)) AS shuf
       |  FROM documents
       |), ph AS (
       |  SELECT doc_id, n_tokens, shuf,
       |         ntile($phases) OVER (ORDER BY n_tokens, shuf) AS phase
       |  FROM sc
       |)
       |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |       CAST(phase AS INT) AS phase,
       |       CAST(row_number() OVER (PARTITION BY phase ORDER BY shuf)
       |         AS BIGINT) AS ord
       |FROM ph ORDER BY phase, ord""".stripMargin
}
