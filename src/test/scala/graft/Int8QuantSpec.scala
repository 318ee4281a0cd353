package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Quantization-quality gate for the int8 embedding family (x80/x81):
  * codes are scale-invariant, the quantized ranking tracks the float
  * ranking on real embeddings, degenerate vectors drop instead of
  * crashing, and the reconstruction error respects the half-step
  * bound |v_i − q_i·s| ≤ s/2 that symmetric rounding guarantees.
  */
class Int8QuantSpec extends AnyFunSuite {
  import SparkTestSession._

  test("int8 codes are scale-invariant; same-direction vectors score 1") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0.5f, -0.25f, 0.125f), 0),
      (10L, Array(1.0f, -0.5f, 0.25f), 0),   // 2× the query: same codes
      (11L, Array(0.1f, 0.9f, 0.4f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.int8TopK(emb, nQueries = 1, k = 2).collect()
    assert(out.head.getAs[Long]("vec_id") == 10L)
    assert(out.head.getAs[Double]("qcos") == 1.0)
  }

  test("recall@10 of the int8 ranking vs float cosine >= 0.8 on " +
    "clustered vectors") {
    import spark.implicits._
    // 4 well-separated clusters (the PqRecallSpec convention): recall
    // floors mean something when there is structure to recover — on
    // near-orthogonal random vectors every ranking gap is smaller
    // than the quantization noise by construction
    val rng = new scala.util.Random(11)
    val vecs = (0 until 48).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(16)(j =>
        ((if (j % 4 == c) 4.0 else 0.0) + rng.nextGaussian() * 0.3)
          .toFloat), c)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    def top(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .groupBy(_.getAs[Long]("qid"))
        .map { case (q, rs) =>
          q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    // k = 10 over 12-member clusters (the PqRecallSpec convention):
    // the top-10 must come from the 11 same-cluster partners, so
    // recall measures cluster recovery, not noise-order among
    // near-equal 0.99-cosine candidates
    val exact = top(Similarity.cosineTopK(emb, nQueries = 5, k = 10))
    val quant = top(Similarity.int8TopK(emb, nQueries = 5, k = 10))
    // keys.toSeq, not keys: mapping a key SET to per-query recalls
    // would deduplicate equal recall values before the mean
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & quant(q)).size.toDouble / 10).sum / exact.size
    assert(recall >= 0.8, s"int8 recall@10 was $recall")
  }

  test("all-zero vector drops from the quantized ranking, no crash") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (10L, Array(0.9f, 0.1f), 0),
      (11L, Array(0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.int8TopK(emb, nQueries = 1, k = 5).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(10L))
  }

  test("quant error respects the half-step bound s^2/4") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0f, 0.3f, -0.7f, 0.05f), 0),
      (1L, Array(0.5f, -0.2f, 0.45f, 0.01f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.int8QuantError(emb).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_vecs") == 2L)
    // max scale here is 1.0/127; mse can never exceed (s/2)^2
    val bound = math.pow(1.0 / 127 / 2, 2) + 1e-12
    assert(row.getAs[Double]("max_mse") <= bound)
    assert(row.getAs[Double]("max_mse") > 0.0)
    assert(row.getAs[Double]("avg_mse") <= row.getAs[Double]("max_mse"))
  }
}
