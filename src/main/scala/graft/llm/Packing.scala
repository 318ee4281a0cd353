package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the layout step between a curated corpus and a
  * training run: documents are concatenated in a canonical order and
  * chunked into fixed-capacity context windows ("concat-and-chunk"
  * packing). Each document's placement is fully determined by the
  * exclusive prefix sum of token counts in doc_id order, so the
  * operator is one [[graft.ts.OrderedRank.withPrefixSum]] pass — a
  * bucketed running sum plus a ≤buckets-row offset broadcast, never a
  * single-partition window — followed by pure integer arithmetic:
  * window id, offset inside the window, and whether the document
  * straddles a window boundary (the rows a loss-masking loader needs).
  */
object Packing {

  def sequencePack(docs: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0)
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val st = graft.ts.OrderedRank.withPrefixSum(
      toks, col("doc_id"), col("doc_id"), col("n_tokens"), "start_off")
    st.select(col("doc_id"), col("n_tokens"), col("start_off"),
      expr(s"start_off div ${capacity}L").as("bin"),
      (col("start_off") % capacity).as("bin_off"),
      (expr(s"start_off div ${capacity}L") =!=
        expr(s"(start_off + n_tokens - 1) div ${capacity}L")).as("crosses"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic training-shard shuffle — the "global shuffle"
    * every pretraining run needs between curation and writing:
    * examples are hash-partitioned into `shards` output shards and
    * hash-ORDERED within each shard, so the training order is fully
    * decorrelated from ingest order yet bit-reproducible on any
    * cluster shape (resume, re-run, and audit all see the same
    * layout; `df.sample`/`rand()` would give none of that).
    *
    * Cost shape: the shard id and both sort keys are scan-side
    * column arithmetic; the contiguous per-shard position comes from
    * ONE [[graft.ts.OrderedRank.withRowNumber]] pass over the
    * shard-major hash order (orderCol = shard + h16/65536 interleaves
    * the 32 range buckets WITHIN shards, so no reducer ever sorts a
    * whole shard — the shard-count knob is independent of
    * parallelism), then per-shard start offsets (a `shards`-row
    * aggregate) broadcast back. One wide exchange total.
    */
  def shardShuffle(docs: DataFrame, keyExpr: String, shards: Int): DataFrame = {
    require(shards > 0)
    // fast one-md5 hash16: this projection is read three times by the
    // OrderedRank pass; values are bit-identical to the oracle's
    // portable strpos nibble form
    val h16 = Dedup.hash16FastExpr(keyExpr)
    val base = docs.select(col("doc_id"),
      expr(s"$h16 % $shards").as("shard"),
      expr(h16).as("__h"),
      expr(s"md5($keyExpr)").as("__m"))
    val ranked = graft.ts.OrderedRank.withRowNumber(base,
      col("shard").cast("double") + col("__h") / lit(65536.0),
      struct(col("__m"), col("doc_id")), "__r")
    // per-shard start offsets: ≤`shards` rows — PlanAudit certifies
    // the broadcast structurally (the grouping key is a modulo by a
    // literal divisor, so its cardinality is bounded by `shards`).
    // The pmod is the IDENTITY on shard ∈ [0, shards); it re-states
    // the bound at the grouping site because OrderedRank's internal
    // checkpoint truncates the lineage that held the original modulo
    // projection.
    val starts = ranked
      .groupBy(pmod(col("shard"), lit(shards)).as("__sh"))
      .agg(min(col("__r")).as("__s0"))
    ranked.join(broadcast(starts), col("shard") === col("__sh"))
      .select(col("shard").cast("int").as("shard"),
        (col("__r") - col("__s0")).as("pos"), col("doc_id"))
      .orderBy(col("shard"), col("pos"))
  }

  def shardShuffleSql(keyExpr: String, shards: Int): String =
    s"""WITH h AS (
       |  SELECT doc_id, ${Dedup.hash16Expr("strpos", keyExpr)} AS h16,
       |         md5($keyExpr) AS m
       |  FROM documents
       |)
       |SELECT CAST(h16 % $shards AS INT) AS shard,
       |       CAST(row_number() OVER (PARTITION BY h16 % $shards
       |         ORDER BY h16, m, doc_id) - 1 AS BIGINT) AS pos,
       |       doc_id
       |FROM h ORDER BY shard, pos""".stripMargin

  /** Overlapping-window document chunking — the retrieval/embedding
    * prep step: each document becomes ceil windows of `width` chars
    * advancing by `width - overlap`, so consecutive chunks share
    * `overlap` chars of context (a short document yields exactly one
    * chunk). Pure map-side explode + substr: no shuffle at all, the
    * chunk count is row-local arithmetic, and the same substr
    * semantics (1-based, length-clamped) hold in both engines.
    */
  def chunkDocuments(docs: DataFrame, width: Int, overlap: Int): DataFrame = {
    require(width > 0 && overlap >= 0 && overlap < width)
    val step = width - overlap
    docs
      .withColumn("n", length(col("text")))
      // ceil cover count: 1 + ceil(max(n - width, 0) / step), all in
      // integer arithmetic (identical div/% semantics in DuckDB)
      .withColumn("n_chunks", expr(
        s"cast(1 + (greatest(n - $width, 0) div $step) + " +
          s"(case when greatest(n - $width, 0) % $step > 0 " +
          s"then 1 else 0 end) as int)"))
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, n_chunks - 1)")).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * step + 1).as("start"),
        expr(s"substr(text, chunk_idx * $step + 1, $width)").as("chunk"))
      .withColumn("chunk_len", length(col("chunk")))
      .select(col("doc_id"), col("chunk_idx"), col("start"),
        col("chunk_len"), md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def chunkDocumentsSql(width: Int, overlap: Int): String = {
    val step = width - overlap
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS n,
       |         CAST(1 + greatest(n - $width, 0) // $step
       |              + CASE WHEN greatest(n - $width, 0) % $step > 0
       |                     THEN 1 ELSE 0 END AS INT) AS n_chunks
       |  FROM documents
       |)
       |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       |       CAST(i * $step + 1 AS INT) AS start,
       |       length(substr(text, CAST(i * $step + 1 AS INT), $width))
       |         AS chunk_len,
       |       md5(substr(text, CAST(i * $step + 1 AS INT), $width))
       |         AS chunk_md5
       |FROM d, UNNEST(range(n_chunks)) AS u(i)
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }

  /** Length-sorted batching — the padding-minimization layout for
    * variable-length training/inference: rank every document by
    * token count (ties by doc_id) and cut the rank order into
    * fixed-size batches, so each batch holds near-equal lengths and
    * pad-to-longest waste is minimal. The rank is one
    * [[graft.ts.OrderedRank.withRowNumber]] pass (bucketed range
    * sort, no single-reducer window); everything after is integer
    * arithmetic.
    */
  def sortedBatches(docs: DataFrame, batchSize: Int): DataFrame =
    batchesFromTokenCounts(tokenCounts(docs), batchSize)

  /** The token-count projection of [[sortedBatches]] — the map-only
    * half a streaming ingest runs per arrival (the same split
    * arithmetic, so drained stream counts are bit-identical to the
    * batch projection).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

  /** The rank-and-cut finisher of [[sortedBatches]], factored over a
    * (doc_id, n_tokens) table: one OrderedRank pass + integer
    * arithmetic. Shared by the batch operator and the streaming twin
    * (counts accumulate on ingest; the global sort order is a
    * batch/drain-time concern by nature).
    */
  def batchesFromTokenCounts(toks: DataFrame, batchSize: Int): DataFrame = {
    require(batchSize > 0)
    graft.ts.OrderedRank.withRowNumber(toks, col("n_tokens"),
        col("doc_id"), "__rn")
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(__rn - 1) div ${batchSize}L").cast("int").as("batch_idx"),
        ((col("__rn") - 1) % batchSize).cast("int").as("pos_in_batch"))
      .orderBy(col("doc_id"))
  }

  def sortedBatchesSql(batchSize: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, n_tokens,
       |         row_number() OVER (ORDER BY n_tokens, doc_id) AS rn
       |  FROM t
       |)
       |SELECT doc_id, n_tokens,
       |       CAST((rn - 1) // $batchSize AS INT) AS batch_idx,
       |       CAST((rn - 1) % $batchSize AS INT) AS pos_in_batch
       |FROM r ORDER BY doc_id""".stripMargin

  /** X6: pack-efficiency report — the CAPACITY sweep over the x38
    * contiguous stream packing (the x108 sweep idiom applied to the
    * packing knob): for each candidate bin capacity, the exact bin
    * count the greedy stream pack produces, the fill rate in integer
    * basis points, and how many documents straddle a bin boundary
    * (each straddle is either a truncation or an attention-mask
    * boundary at training time — the quantity a capacity choice
    * trades against padding waste). Contiguous packing makes every
    * column closed-form from ONE prefix-sum pass shared across all
    * capacities: n_bins = ⌈total/cap⌉, and a doc crosses iff its
    * [start, end] token interval spans a cap multiple. Pure integer
    * arithmetic — exact in any engine.
    *
    * Scale shape: the x38 OrderedRank prefix-sum pass (bucketed
    * range sort, no global window), a |caps|-way map-side explode,
    * one hash agg to |caps| rows, and a 1-row totals broadcast.
    */
  def packEfficiency(docs: DataFrame, caps: Seq[Int]): DataFrame = {
    require(caps.nonEmpty && caps.forall(_ > 0))
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val st = graft.ts.OrderedRank.withPrefixSum(
      toks, col("doc_id"), col("doc_id"), col("n_tokens"), "start_off")
    val tot = toks.agg(
      coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
      count(lit(1)).as("n_docs"))
    st
      .withColumn("capacity", explode(array(caps.sorted.map(lit): _*)))
      .select(col("capacity"),
        (expr("start_off div capacity") =!=
          expr("(start_off + n_tokens - 1) div capacity"))
          .cast("long").as("crosses"))
      .groupBy(col("capacity"))
      .agg(sum(col("crosses")).as("n_crossing"))
      .crossJoin(broadcast(tot))
      .select(col("capacity"), col("n_docs"), col("total_tokens"),
        expr("(total_tokens + capacity - 1) div capacity").as("n_bins"),
        when(col("total_tokens") > 0, expr(
          "total_tokens * 10000 div " +
            "(((total_tokens + capacity - 1) div capacity) * capacity)"))
          .otherwise(lit(0L)).as("fill_bp"),
        col("n_crossing"),
        when(col("n_docs") > 0,
          expr("n_crossing * 10000 div n_docs")).otherwise(lit(0L))
          .as("crossing_bp"))
      .orderBy(col("capacity"))
  }

  def packEfficiencySql(caps: Seq[Int]): String = {
    val arr = caps.sorted.mkString("[", ", ", "]")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, n_tokens,
       |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS start_off
       |  FROM t
       |), tot AS (
       |  SELECT CAST(COALESCE(sum(n_tokens), 0) AS BIGINT)
       |           AS total_tokens,
       |         CAST(count(*) AS BIGINT) AS n_docs
       |  FROM t
       |), x AS (
       |  SELECT capacity, start_off, n_tokens
       |  FROM s, UNNEST($arr) AS u(capacity)
       |), agg AS (
       |  SELECT capacity,
       |    CAST(sum(CASE WHEN start_off // capacity
       |      <> (start_off + n_tokens - 1) // capacity
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_crossing
       |  FROM x GROUP BY capacity
       |)
       |SELECT capacity, n_docs, total_tokens,
       |  CAST((total_tokens + capacity - 1) // capacity AS BIGINT)
       |    AS n_bins,
       |  CAST(CASE WHEN total_tokens > 0
       |    THEN total_tokens * 10000 //
       |      (((total_tokens + capacity - 1) // capacity) * capacity)
       |    ELSE 0 END AS BIGINT) AS fill_bp,
       |  n_crossing,
       |  CAST(CASE WHEN n_docs > 0 THEN n_crossing * 10000 // n_docs
       |    ELSE 0 END AS BIGINT) AS crossing_bp
       |FROM agg CROSS JOIN tot
       |ORDER BY capacity""".stripMargin
  }

  def sequencePackSql(capacity: Long): String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, n_tokens,
       |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS start_off
       |  FROM t
       |)
       |SELECT doc_id, n_tokens, CAST(start_off AS BIGINT) AS start_off,
       |       CAST(start_off // $capacity AS BIGINT) AS bin,
       |       CAST(start_off % $capacity AS BIGINT) AS bin_off,
       |       (start_off // $capacity)
       |         <> ((start_off + n_tokens - 1) // $capacity) AS crosses
       |FROM s ORDER BY doc_id""".stripMargin
}
