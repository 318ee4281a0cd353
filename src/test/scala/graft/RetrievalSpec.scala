package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Retrieval, Similarity}

/** Semantics of the hybrid RRF fusion (x78): presence in both
  * modality lists must dominate a good rank in one, the fused score
  * is the exact integer-nano RRF sum, and the query document never
  * retrieves itself.
  */
class RetrievalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rrf: doc in both lists outranks single-list docs; exact score") {
    import spark.implicits._
    val docs = Seq(
      (0L, "apple banana cherry"),                  // the query doc
      (5L, "apple banana cherry date"),             // lexical hit
      (6L, "apple unrelatedone unrelatedtwo"),      // weak lexical hit
      (7L, "nothing shared here at all"))           // no lexical hit
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (5L, Array(1f, 0.05f, 0f)),                   // dense rank 1
      (6L, Array(0f, 0f, 1f)),                      // orthogonal
      (7L, Array(0.9f, 0.44f, 0f)))                 // dense rank 2
      .toDF("vec_id", "embedding")
    val out = Retrieval.rrfFusion(docs, emb,
      nQueries = 1, qTerms = 8, perList = 3, k = 4).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(0L))            // self-exclusion survives fusion
    val bySc = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    // doc 5: rank 1 in both lists — 2 * floor(1e9/61) / 1e9 at 6dp
    assert(bySc(5L) == 0.032787)
    // doc 6: lex rank 2 + dense rank 3 (everything makes the dense
    // top-3 here) — floor(1e9/62) + floor(1e9/63)
    assert(bySc(6L) == 0.032002)
    // doc 7: dense rank 2 only — its single contribution loses to
    // doc 6's two worse-ranked ones: both-list presence dominates
    assert(bySc(7L) == 0.016129)
    assert(ids == Seq(5L, 6L, 7L))
  }

  test("mmr: diversification beats a redundant second pick at lambda=0.5") {
    import spark.implicits._
    // a1/a2/a3 are near-copies aligned with the query; b is less
    // relevant but diverse. Plain top-2 returns (a1, a2); MMR at
    // lambda=0.5 must return (a1, b): a2's redundancy penalty
    // (~0.5·1.0) exceeds its relevance edge over b.
    // 3-D so b can diverge from the a-cluster's plane: score(a2) =
    // 0.5·0.990 − 0.5·0.999 ≈ −0.005 < score(b) = 0.5·0.6 − 0.5·0.597
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),            // query
      (10L, Array(0.995f, 0.1f, 0f), 0),     // a1
      (11L, Array(0.99f, 0.14f, 0f), 0),     // a2
      (12L, Array(0.985f, 0.17f, 0f), 0),    // a3
      (20L, Array(0.6f, 0f, 0.8f), 1))       // b — diverse
      .toDF("vec_id", "embedding", "label")
    val plain = Similarity.cosineTopK(emb, nQueries = 1, k = 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(plain == Seq(10L, 11L))
    val mmr = Retrieval.mmrTopK(emb, nQueries = 1, perList = 4, k = 2,
        lambda = 0.5)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(mmr == Seq(10L, 20L))
  }

  test("mmr: equal candidates tie-break to the lowest id at every step") {
    import spark.implicits._
    val same = Array(0.9f, 0.44f)
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (30L, same, 0), (31L, same, 0), (32L, same, 0))
      .toDF("vec_id", "embedding", "label")
    val mmr = Retrieval.mmrTopK(emb, nQueries = 1, perList = 3, k = 3)
      .collect().map(r =>
        (r.getAs[Int]("sel_rank"), r.getAs[Long]("vec_id")))
    assert(mmr.toSeq == Seq((1, 30L), (2, 31L), (3, 32L)))
  }

  test("margin mining demotes the hub raw cosine ranks first; " +
    "zero-cos pairs keep margin 0; zero-norm candidates drop") {
    import spark.implicits._
    // probes q0, q1 orthogonal; hub equally near BOTH (cos .707107),
    // pair near q0 only (cos .69 < .707107 — raw cosine prefers the
    // hub), far vector near neither, zero vector degenerate
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f), 0),
      (2L, Array(1f, 1f, 0f), 1),           // hub
      (3L, Array(0.69f, 0f, 0.7238f), 1),   // dedicated pair for q0
      (4L, Array(0f, 0f, 1f), 1),           // far filler
      (5L, Array(0f, 0f, 0f), 1))           // zero-norm: must drop
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.marginBitextMine(emb, nQueries = 2, k = 2)
      .collect()
    val ids = out.map(r => (r.getAs[Long]("qid"),
      r.getAs[Long]("vec_id"))).toSet
    // both probes' top-2 hit lists are {hub, pair}; filler and the
    // zero vector never surface
    assert(ids == Set((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L)))
    val margin = out.map(r => (r.getAs[Long]("qid"),
      r.getAs[Long]("vec_id")) -> r.getAs[Long]("margin_micro")).toMap
    // the anti-hub property: q0's dedicated pair outmargins the hub
    // even though the hub's raw cosine is higher
    val cos = out.map(r => (r.getAs[Long]("qid"),
      r.getAs[Long]("vec_id")) -> r.getAs[Long]("cos_micro")).toMap
    assert(cos((0L, 2L)) > cos((0L, 3L)))
    assert(margin((0L, 3L)) > margin((0L, 2L)),
      s"pair ${margin((0L, 3L))} vs hub ${margin((0L, 2L))}")
    // q1↔pair: cos 0 survives the cm >= 0 cut with margin exactly 0
    assert(cos((1L, 3L)) == 0L && margin((1L, 3L)) == 0L)
  }
}
