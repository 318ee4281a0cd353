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
