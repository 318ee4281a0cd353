package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity
import graft.tools.ModelStore

/** Train-once/serve-many gate: the serve-path PQ query (persisted
  * codebook model table) must return BIT-identical rows to the
  * in-query-trained pqTopK, the model table must be written exactly
  * once (the second serve execution reads it instead of retraining),
  * and a by-name training plan must never be built when the artifact
  * already exists.
  */
class PqServeSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dim = 8
  private val m = 2
  private val ksub = 4

  private lazy val emb = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (0 until 40).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        ((if (j % 4 == i % 4) 3.0 else 0.0) + rng.nextGaussian() * 0.2)
          .toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("pq-model").toString + "/cb"

  test("serve path is bit-identical to in-query training") {
    val path = freshPath()
    val inQuery = Similarity
      .pqTopK(emb, dim, m, ksub, nQueries = 4, k = 5,
        trainIters = 2, trainTarget = 20)
      .collect().map(_.toSeq)
    val served = Similarity
      .pqServeTopK(emb, path, dim, m, ksub, nQueries = 4, k = 5,
        trainIters = 2, trainTarget = 20)
      .collect().map(_.toSeq)
    assert(served.toSeq == inQuery.toSeq)
  }

  test("model table is written once; the second execution serves it") {
    val path = freshPath()
    def run() = Similarity
      .pqServeTopK(emb, path, dim, m, ksub, nQueries = 4, k = 5,
        trainIters = 2, trainTarget = 20)
      .collect().map(_.toSeq).toSeq
    val first = run()
    val dir = new java.io.File(path)
    assert(dir.exists(), "model table not persisted")
    val stamps = dir.listFiles().map(f => f.getName -> f.lastModified())
      .toMap
    val second = run()
    assert(second == first)
    val after = new java.io.File(path).listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(after == stamps, "model table was rewritten on serve")
  }

  test("ensure never builds the training plan when the model exists") {
    val path = freshPath()
    ModelStore.ensure(path, emb.limit(1)).collect()
    var built = false
    ModelStore.ensure(path, { built = true; emb.limit(1) }).collect()
    assert(!built, "by-name training plan was evaluated on serve")
  }

  test("pathFor discriminates hyperparameters and corpus fingerprint") {
    val d = java.nio.file.Files.createTempDirectory("fp-corpus").toString
    val p1 = ModelStore.pathFor("pq_cb", d, "a")
    assert(p1 != ModelStore.pathFor("pq_cb", d, "b"))
    // materialize a corpus table; the fingerprint must move
    emb.write.parquet(s"$d/embeddings.parquet")
    val p2 = ModelStore.pathFor("pq_cb", d, "a")
    assert(p2 != p1, "corpus fingerprint ignored")
  }
}
