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

  /** X2': MMR diversified re-ranking (Carbonell & Goldstein 1998) —
    * greedy selection of k results from the bounded cosine candidate
    * list maximizing λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s): the
    * standard fix for a dense top-k that returns five near-copies of
    * the same answer. Step 1 takes the most relevant candidate;
    * every later step penalizes similarity to what is already
    * selected.
    *
    * Scale shape: the expensive work is the x05 bounded top-`perList`
    * search (broadcast queries, one corpus pass, partial top-k); the
    * greedy itself runs per query over ≤ perList candidates inside
    * one `flatMapGroups` — group size is bounded by CONSTRUCTION
    * (the candidate list is the bounded aggregate's output), so the
    * typed group step holds at any corpus size.
    *
    * Determinism across engines: relevances are the 6dp-rounded x05
    * cosines, pairwise sims round at 6dp the same way, and every
    * greedy comparison happens on ⌊score·1e9⌉ integers (round half
    * away from zero — the same arithmetic the SQL oracle's unrolled
    * argmax chain computes), ties to the lowest id.
    */
  def mmrTopK(emb: DataFrame, nQueries: Int, perList: Int, k: Int,
      lambda: Double = 0.7): DataFrame = {
    val om = 1.0 - lambda // the exact double the SQL literal reproduces
    val session = emb.sparkSession
    import session.implicits._
    val cand = Similarity.cosineTopKUnsorted(emb, nQueries, perList)
      .select(col("qid"), col("vec_id"), col("cos"))
      // a zero-norm query or candidate has no defined relevance —
      // drop it (the x80 convention) instead of decoding null into
      // a primitive Double
      .filter(col("cos").isNotNull)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("qid"), col("vec_id"), col("cos"), col("embedding"))
      .as[(Long, Long, Double, Array[Float])]
    def round6(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def cos6(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      // zero-norm member: no similarity information → no penalty
      // (rounding NaN would throw, killing the stage on a corpus
      // with degenerate vectors)
      if (na == 0.0 || nb == 0.0) 0.0
      else round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    // DuckDB round(): half away from zero on the same double product
    def nano(x: Double): Long = {
      val y = x * 1e9
      (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
    }
    cand.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cs = it.map { case (_, id, rel, e) =>
          (id, rel, e.map(_.toDouble)) }.toArray
          .sortBy { case (id, rel, _) => (-rel, id) }
        val picks = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Array[Double])] // (id, scoreNano, emb)
        // each (candidate, pick) similarity is needed at every later
        // greedy step — memoize so the loop costs O(k·perList) cosine
        // evaluations instead of O(k²·perList)
        val simCache = scala.collection.mutable.HashMap
          .empty[(Long, Long), Double]
        def sim(cId: Long, cEmb: Array[Double],
            p: (Long, Long, Array[Double])): Double =
          simCache.getOrElseUpdate((cId, p._1), cos6(cEmb, p._3))
        while (picks.size < k && picks.size < cs.length) {
          val best =
            if (picks.isEmpty) {
              val h = cs.head
              (h._1, nano(lambda * h._2), h._3)
            } else {
              val chosen = picks.map(_._1).toSet
              cs.iterator.filterNot(c => chosen(c._1)).map { c =>
                val maxSim = picks.iterator.map(p => sim(c._1, c._3, p)).max
                (c._1, nano(lambda * c._2 - om * maxSim), c._3)
              }.reduceLeft { (a, b) =>
                if (b._2 > a._2 || (b._2 == a._2 && b._1 < a._1)) b else a
              }
            }
          picks += best
        }
        picks.iterator.zipWithIndex.map { case ((id, sn, _), i) =>
          // 6dp output derived from the integer nanos (half away from
          // zero in integer space) — round(sn/1e9, 6) would hit the
          // engines' double-tie divergence when sn ends in 500
          val m = if (sn >= 0) (sn + 500) / 1000 else -((-sn + 500) / 1000)
          (qid, i + 1, id, m.toDouble / 1e6)
        }
      }
      .toDF("qid", "sel_rank", "vec_id", "mmr")
      .orderBy(col("qid"), col("sel_rank"))
  }

  /** Oracle: the x05 candidate list + pairwise sims, with the greedy
    * unrolled into k chained argmax CTEs (a window per step over the
    * ≤ perList-row candidate frame — fine in DuckDB; the engine side
    * deliberately avoids per-step plans). Arithmetic mirrors the
    * engine exactly: 6dp sims, ⌊score·1e9⌉ comparisons, id ties.
    */
  def mmrTopKSql(nQueries: Int, perList: Int, k: Int,
      lambda: Double = 0.7): String = {
    require(k >= 2, "unrolled oracle expects k >= 2")
    val om = java.lang.Double.toString(1.0 - lambda)
    val lam = java.lang.Double.toString(lambda)
    def simJoins(t: Int): String = (1 until t).map(j =>
      s"  JOIN sims m$j ON m$j.qid = c.qid AND m$j.i1 = c.id" +
        s" AND m$j.i2 = x.p$j").mkString("\n")
    def carry(t: Int): String = (1 until t).map(j =>
      s"x.p$j, x.n$j").mkString(", ")
    val stepCtes = (2 to k).map { t =>
      val maxSim =
        if (t == 2) "m1.sim"
        else (1 until t).map(j => s"m$j.sim").mkString("greatest(", ", ", ")")
      val notIn = (1 until t).map(j => s"x.p$j").mkString(", ")
      s"""sel$t AS (
         |  SELECT qid, ${(1 until t).map(j => s"p$j, n$j").mkString(", ")},
         |         id AS p$t, sn AS n$t
         |  FROM (
         |    SELECT *, row_number()
         |      OVER (PARTITION BY qid ORDER BY sn DESC, id) AS rk
         |    FROM (
         |      SELECT c.qid, ${carry(t)}, c.id,
         |        CAST(round(($lam * c.rel - $om * $maxSim) * 1e9)
         |          AS BIGINT) AS sn
         |      FROM cand c
         |      JOIN sel${t - 1} x USING (qid)
         |${simJoins(t)}
         |      WHERE c.id NOT IN ($notIn)
         |    )
         |  ) WHERE rk = 1
         |)""".stripMargin
    }.mkString(",\n")
    // 6dp output from the integer nanos (half away from zero in
    // integer space), mirroring the engine exactly
    def mmrOut(n: String): String =
      s"CAST(CASE WHEN $n >= 0 THEN ($n + 500) // 1000" +
        s" ELSE -((-$n + 500) // 1000) END AS DOUBLE) / 1e6"
    val outArms = (1 to k).map(t =>
      s"SELECT qid, $t AS sel_rank, p$t AS vec_id," +
        s" ${mmrOut(s"n$t")} AS mmr FROM sel$k")
      .mkString("\n  UNION ALL ")
    s"""WITH cand AS MATERIALIZED (
       |  SELECT t.qid, t.vec_id AS id, t.cos AS rel, e.embedding
       |  FROM (${Similarity.cosineTopKSql(nQueries, perList)}) t
       |  JOIN embeddings e ON e.vec_id = t.vec_id
       |), sims AS MATERIALIZED (
       |  SELECT a.qid, a.id AS i1, b.id AS i2,
       |    round(sum(CAST(a.embedding[i+1] AS DOUBLE)
       |              * CAST(b.embedding[i+1] AS DOUBLE))
       |      / (sqrt(sum(CAST(a.embedding[i+1] AS DOUBLE)
       |                  * CAST(a.embedding[i+1] AS DOUBLE)))
       |       * sqrt(sum(CAST(b.embedding[i+1] AS DOUBLE)
       |                  * CAST(b.embedding[i+1] AS DOUBLE)))), 6)
       |      AS sim
       |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.id <> b.id,
       |       UNNEST(range(len(a.embedding))) AS r(i)
       |  GROUP BY 1, 2, 3
       |), sel1 AS (
       |  SELECT qid, id AS p1,
       |    CAST(round($lam * rel * 1e9) AS BIGINT) AS n1
       |  FROM (
       |    SELECT qid, id, rel, row_number()
       |      OVER (PARTITION BY qid ORDER BY rel DESC, id) AS rk
       |    FROM cand
       |  ) WHERE rk = 1
       |),
       |$stepCtes
       |SELECT qid, CAST(sel_rank AS INT) AS sel_rank, vec_id, mmr
       |FROM (
       |  $outArms
       |) ORDER BY qid, sel_rank""".stripMargin
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

  /** X2/X3': ranker-agreement report — per query, how much the
    * lexical (x74 BM25) and dense (x05 cosine) top-k rankings agree:
    * common-id count, overlap in exact basis points, and the
    * Spearman footrule Σ|rank_lex − rank_den| over the common ids
    * (all integers — no float anywhere). This is the table that says
    * whether hybrid fusion (x78) is worth its second modality: near-
    * total overlap means the dense leg adds nothing; near-zero
    * overlap with sane recall means the two legs see different
    * relevance and RRF will help. The retrieval eval face, next to
    * x107 (ANN recall) and x109 (lang-id confusion).
    *
    * Scale shape: both rankings are the existing bounded searches
    * (inverted-index probe; broadcast-query scan); the agreement is
    * one co-keyed join + aggregate over ≤ 2·nQueries·k rows, with a
    * left join back to the query spine — built from the query
    * DEFINITION (doc_id/vec_id < nQueries over both sources, ADVICE
    * r9), not from the lexical results, so a query with zero BM25
    * hits still reports a zero row.
    */
  def rankerAgreement(docs: DataFrame, emb: DataFrame, nQueries: Int,
      qTerms: Int, k: Int): DataFrame = {
    require(10000 % k == 0, "k must divide 10000 for exact overlap_bp")
    val lex = TextAnalysis.bm25TopKUnsorted(docs, nQueries, qTerms, k)
      .select(col("qid"), col("doc_id").as("id"), col("rank").as("rl"))
    val den = Similarity.cosineTopKUnsorted(emb, nQueries, k)
      .select(col("qid"), col("vec_id").as("id"), col("rank").as("rd"))
    val common = lex.join(den, Seq("qid", "id"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("nc"),
        sum(abs(col("rl") - col("rd")).cast("long")).as("fr"))
    val spine = docs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"))
      .union(emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid")))
      .distinct()
    spine
      .join(common, Seq("qid"), "left_outer")
      .select(col("qid"),
        coalesce(col("nc"), lit(0L)).as("n_common"),
        (coalesce(col("nc"), lit(0L)) * lit((10000 / k).toLong))
          .as("overlap_bp"),
        coalesce(col("fr"), lit(0L)).as("footrule"))
      .orderBy(col("qid"))
  }

  def rankerAgreementSql(nQueries: Int, qTerms: Int, k: Int): String =
    s"""WITH lex AS (
       |  SELECT qid, doc_id AS id, rank AS rl
       |  FROM (${TextAnalysis.bm25TopKSql(nQueries, qTerms, k)})
       |), den AS (
       |  SELECT qid, vec_id AS id, rank AS rd
       |  FROM (${Similarity.cosineTopKSql(nQueries, k)})
       |), common AS (
       |  SELECT l.qid, CAST(count(*) AS BIGINT) AS nc,
       |         CAST(sum(abs(l.rl - d.rd)) AS BIGINT) AS fr
       |  FROM lex l JOIN den d ON d.qid = l.qid AND d.id = l.id
       |  GROUP BY 1
       |), spine AS (
       |  SELECT DISTINCT qid FROM (
       |    SELECT doc_id AS qid FROM documents WHERE doc_id < $nQueries
       |    UNION ALL
       |    SELECT vec_id FROM embeddings WHERE vec_id < $nQueries))
       |SELECT s.qid,
       |  CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_common,
       |  CAST(COALESCE(c.nc, 0) * ${10000 / k} AS BIGINT) AS overlap_bp,
       |  CAST(COALESCE(c.fr, 0) AS BIGINT) AS footrule
       |FROM spine s LEFT JOIN common c ON c.qid = s.qid
       |ORDER BY s.qid""".stripMargin
}
