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
    val h16 = Dedup.hash16Expr("instr", keyExpr)
    val base = docs.select(col("doc_id"),
      expr(s"$h16 % $shards").as("shard"),
      expr(h16).as("__h"),
      expr(s"md5($keyExpr)").as("__m"))
    val ranked = graft.ts.OrderedRank.withRowNumber(base,
      col("shard").cast("double") + col("__h") / lit(65536.0),
      struct(col("__m"), col("doc_id")), "__r")
    // per-shard start offsets: ≤`shards` rows — PlanAudit certifies
    // the broadcast structurally (the grouping key is a modulo by a
    // literal divisor, so its cardinality is bounded by `shards`)
    val starts = ranked.groupBy(col("shard")).agg(min(col("__r")).as("__s0"))
    ranked.join(broadcast(starts.withColumnRenamed("shard", "__sh")),
        col("shard") === col("__sh"))
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
