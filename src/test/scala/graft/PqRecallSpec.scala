package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Quantizer-quality gate for product-quantization ANN: on clustered
  * vectors whose first-`ksub` rows (the untrained codebook AND the
  * k-means seeds) all sit in ONE cluster, the trained codebook must
  * recover the cluster structure — recall@10 against exact cosine
  * top-k ≥ 0.7 — while the untrained first-ksub baseline, measured in
  * the same run, cannot. Everything is deterministic (fixed RNG seed,
  * integer-exact training, IEEE-pinned ADC), so the thresholds are
  * exact replays, not statistical hopes.
  */
class PqRecallSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dim = 8
  private val m = 2
  private val ksub = 4
  private val k = 10
  private val nq = 8
  private val n = 48

  // 4 well-separated clusters, one-hot-ish centers per subspace;
  // ids 0-3 are ALL cluster 0 (the adversarial seeding), the rest
  // round-robin
  private def cluster(i: Int): Int = if (i < 4) 0 else i % 4
  private lazy val vecs: Array[Array[Float]] = {
    val rng = new scala.util.Random(7)
    Array.tabulate(n) { i =>
      val c = cluster(i)
      Array.tabulate(dim)(j =>
        ((if (j % 4 == c) 4.0 else 0.0) + rng.nextGaussian() * 0.3).toFloat)
    }
  }

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def recallAt10(trainIters: Int, trainTarget: Long = 0): Double = {
    import spark.implicits._
    val emb = vecs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val pq = Similarity.pqTopK(emb, dim, m, ksub, nq, k, trainIters,
      trainTarget)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    (0 until nq).map { q =>
      val exact = (0 until n).filter(_ != q)
        .sortBy(i => (-cos(vecs(q), vecs(i)), i))
        .take(k).map(_.toLong).toSet
      (pq(q.toLong) & exact).size.toDouble / k
    }.sum / nq
  }

  test("trained pq codebook: recall@10 vs exact cosine >= 0.7, " +
      "beating the untrained first-ksub baseline") {
    val untrained = recallAt10(0)
    val trained = recallAt10(3)
    info(f"recall@10: untrained=$untrained%.3f trained=$trained%.3f")
    assert(trained >= 0.7, s"trained recall $trained")
    assert(trained > untrained,
      s"training did not help: $trained <= $untrained")
  }

  test("sample-trained codebook (the 100 TB knob) keeps the recall " +
      "floor: training on the ~24-row absolute target (1-in-2 here) " +
      "still >= 0.7") {
    val sampled = recallAt10(3, trainTarget = 24)
    info(f"recall@10: sample-trained=$sampled%.3f")
    assert(sampled >= 0.7, s"sample-trained recall $sampled")
  }

  test("ivf-pq with nProbe = nLists collapses to plain pq top-k") {
    import spark.implicits._
    val emb = vecs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    // probing EVERY list removes the IVF pruning, so the composed
    // ranking must equal the un-pruned PQ ranking row-for-row
    // (same codebook, same ADC integers, same tie-break)
    val nLists = 6
    val composed = Similarity
      .ivfPqTopK(emb, nLists, nProbe = nLists, dim, m, ksub,
        nQueries = nq, k = k)
      .collect().map(_.toSeq)
    val plain = Similarity.pqTopK(emb, dim, m, ksub, nq, k)
      .collect().map(_.toSeq)
    assert(composed.nonEmpty)
    assert(composed.sameElements(plain))
  }

  test("ivf-pq probe pruning returns only vectors from probed lists") {
    import spark.implicits._
    val emb = vecs.zipWithIndex.toSeq.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val nLists = 6
    val got = Similarity
      .ivfPqTopK(emb, nLists, nProbe = 2, dim, m, ksub,
        nQueries = nq, k = k).collect()
    // with 2 of 6 lists probed the candidate pool shrinks: every
    // query still ranks *something* (clustered fixture), and ranks
    // are dense 1..|hits| per query
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.size == nq)
    byQ.values.foreach { rows =>
      val ranks = rows.map(_.getInt(1)).sorted
      assert(ranks.sameElements(1 to ranks.length))
      assert(ranks.length <= k)
    }
  }
}
