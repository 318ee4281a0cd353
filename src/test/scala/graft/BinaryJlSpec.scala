package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Semantic checks for the round-9 compressed-search pair: 1-bit
  * binary quantization with Hamming prefilter (x94) and the
  * Johnson–Lindenstrauss projected search with full-dim refine (x95).
  */
class BinaryJlSpec extends AnyFunSuite {
  import SparkTestSession._

  /** 4 well-separated clusters in 64 dims (the PqRecallSpec
    * convention — recall floors mean something only with structure).
    */
  private lazy val clustered = {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    (0 until 48).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(64)(j =>
        ((if (j % 4 == c) 4.0 else 0.0) + rng.nextGaussian() * 0.3)
          .toFloat), c)
    }.toDF("vec_id", "embedding", "label")
  }

  private def top(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }

  test("binary prefilter: a high-cosine candidate OUTSIDE the Hamming " +
    "radius is pruned; one inside survives") {
    import spark.implicits._
    // query: +1 in dim 0, tiny + in dims 1..30. candidate 10 flips the
    // 30 tiny signs (Hamming 30, cosine still ~0.97); candidate 11
    // matches every sign (Hamming 0, cosine ~0.97 as well).
    def v(flip: Boolean) = Array.tabulate(64)(j =>
      if (j == 0) 1.0f
      else if (j <= 30) (if (flip) -0.01f else 0.01f)
      else 0.0f)
    val emb = Seq(
      (0L, v(flip = false), 0),
      (10L, v(flip = true), 0),
      (11L, v(flip = false), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.binaryTopK(emb, nQueries = 1, radius = 10, k = 5)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(out == Set(11L), s"expected only 11, got $out")
  }

  test("binary recall@10 vs float cosine >= 0.8 on clustered vectors " +
    "at a generous radius") {
    val exact = top(Similarity.cosineTopK(clustered, nQueries = 5, k = 10))
    // same-cluster pairs here still differ on ~24 of the 48 random
    // noise signs, so "generous" means radius > 24 + a few sd
    val bin = top(Similarity.binaryTopK(clustered, nQueries = 5,
      radius = 34, k = 10))
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & bin.getOrElse(q, Set.empty)).size.toDouble / 10)
      .sum / exact.size
    assert(recall >= 0.8, s"binary recall@10 was $recall")
  }

  test("binary: zero-norm vectors drop from the rerank, no crash") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array.fill(64)(1.0f), 0),
      (10L, Array.fill(64)(0.9f), 0),
      (11L, Array.fill(64)(0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.binaryTopK(emb, nQueries = 1, radius = 63, k = 5)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(out == Set(10L))
  }

  test("jl recall@10 vs full-dim >= 0.8 on clustered vectors, and the " +
    "err column stays inside the JL distortion envelope") {
    val exact = top(Similarity.cosineTopK(clustered, nQueries = 5, k = 10))
    val jl = Similarity.jlTopK(clustered, nQueries = 5, rDim = 16, k = 10)
    val rows = jl.collect()
    val proj = rows.groupBy(_.getAs[Long]("qid"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & proj.getOrElse(q, Set.empty)).size.toDouble / 10)
      .sum / exact.size
    assert(recall >= 0.8, s"jl recall@10 was $recall")
    // ±1 projections at rDim=16 have cosine distortion sd ~ 1/sqrt(16);
    // on structured vectors the observed gap must stay well under 2 sd
    val errs = rows.map(_.getAs[Double]("err"))
    assert(errs.max <= 0.5, s"max jl err ${errs.max}")
    assert(errs.sum / errs.length <= 0.25,
      s"mean jl err ${errs.sum / errs.length}")
  }

  test("jl: cos64 equals the micro-quantized exact cosine for an " +
    "identical-direction pair (sanity of the integer kernel)") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array.fill(64)(0.5f), 0),
      (10L, Array.fill(64)(0.25f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.jlTopK(emb, nQueries = 1, rDim = 16, k = 1).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("cos64") == 1.0)
    assert(r.head.getAs[Double]("cos16") == 1.0)
    assert(r.head.getAs[Double]("err") == 0.0)
  }
}
