package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval (SURVEY.md §2.9 X2/X3'): reciprocal-rank fusion
  * of the lexical BM25 ranking (x74) and the dense cosine ranking
  * (x05) — the standard way a retrieval stack combines the two
  * modalities without score calibration (Cormack et al. 2009: ranks,
  * not scores, so the wildly different BM25/cosine scales never have
  * to be normalized against each other).
  *
  * The corpus is the `documents` table in the lexical modality and
  * the `embeddings` table in the dense one, with `vec_id` ≙ `doc_id`
  * (embeddings[i] embeds documents[i], the harness-table convention
  * x05/x74 already share); queries are the first `nQueries` docs in
  * both modalities, each excluded from its own result list by the
  * underlying searches.
  */
object Retrieval {

  /** RRF contribution for one list entry, in integer nano-units:
    * ⌊1e9 / (rrfK + rank)⌋. Integer division makes the per-(qid, id)
    * sum exact and engine-order-independent (the DSIR/BM25 idiom).
    */
  private def rrfNano(rrfK: Int) =
    expr(s"cast(1000000000 as bigint) div ($rrfK + rank)")

  /** X2/X3': fused top-k. Each modality contributes its own top
    * `perList` ranking; a document's fused score is the sum of
    * ⌊1e9/(rrfK+rank)⌋ over the lists it appears in, so presence in
    * BOTH lists dominates a slightly-better rank in one.
    *
    * Scale shape: both input rankings are already bounded
    * (nQueries · perList rows each — the bounded partial top-k
    * aggregates inside bm25TopK/cosineTopK do the heavy lifting), so
    * the fusion itself is a union + one hash aggregate over ≤
    * 2 · nQueries · perList rows and a second bounded top-k. The
    * expensive work stays in the two modality searches, each of which
    * keeps its 100 TB posture (inverted-index probe; broadcast-query
    * scan).
    */
  def rrfFusion(docs: DataFrame, emb: DataFrame, nQueries: Int,
      qTerms: Int, perList: Int, k: Int, rrfK: Int = 60): DataFrame = {
    val lex = TextAnalysis.bm25TopKUnsorted(docs, nQueries, qTerms, perList)
      .select(col("qid"), col("doc_id").as("id"), col("rank"))
    val den = Similarity.cosineTopKUnsorted(emb, nQueries, perList)
      .select(col("qid"), col("vec_id").as("id"), col("rank"))
    lex.unionByName(den)
      .withColumn("nano", rrfNano(rrfK))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("nano")).as("s"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopK.top_k(k)(
        col("s").cast("double"), col("id")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("hit.vec_id").as("doc_id"),
        round(col("hit.cos") / lit(1e9), 6).as("rrf"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Oracle: the x74 and x05 oracle pipelines verbatim as scoped
    * subqueries, fused with the identical integer-nano arithmetic.
    */
  def rrfFusionSql(nQueries: Int, qTerms: Int, perList: Int, k: Int,
      rrfK: Int = 60): String =
    s"""WITH lex AS (
       |  SELECT qid, doc_id AS id, rank
       |  FROM (${TextAnalysis.bm25TopKSql(nQueries, qTerms, perList)})
       |), den AS (
       |  SELECT qid, vec_id AS id, rank
       |  FROM (${Similarity.cosineTopKSql(nQueries, perList)})
       |), contrib AS (
       |  SELECT qid, id, 1000000000 // ($rrfK + rank) AS nano FROM lex
       |  UNION ALL
       |  SELECT qid, id, 1000000000 // ($rrfK + rank) FROM den
       |), scored AS (
       |  SELECT qid, id, CAST(sum(nano) AS BIGINT) AS s
       |  FROM contrib GROUP BY 1, 2
       |), ranked AS (
       |  SELECT qid, id, s, row_number()
       |    OVER (PARTITION BY qid ORDER BY s DESC, id) AS rank
       |  FROM scored
       |)
       |SELECT qid, CAST(rank AS INT) AS rank, id AS doc_id,
       |       round(CAST(s AS DOUBLE) / 1e9, 6) AS rrf
       |FROM ranked WHERE rank <= $k ORDER BY qid, rank""".stripMargin
}
