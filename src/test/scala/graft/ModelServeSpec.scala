package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Bpe, QualityClassifier, Similarity}
import graft.tools.ModelStore

/** Train-once/serve-many gates for the non-PQ model families
  * (PqServeSpec covers the codebook): each serve path must return
  * BIT-identical rows to its in-query-trained twin, and the model
  * table must be written exactly once — the second execution reads it
  * instead of retraining. Plus the concurrent-trainer race: two
  * simultaneous `ensure()` calls on the same path must both return
  * the complete artifact with no partial reads and no leftover tmp
  * dirs (the tmp-dir + atomic-rename design claim, actually raced).
  */
class ModelServeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshPath(kind: String): String =
    java.nio.file.Files.createTempDirectory(s"$kind-model").toString +
      "/model"

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  private def assertServedOnce(path: String,
      run: () => Seq[Seq[Any]], trained: Seq[Seq[Any]]): Unit = {
    val first = run()
    assert(first == trained, "serve path differs from in-query training")
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

  test("classifier serve is bit-identical to in-query training and " +
      "writes the model row once") {
    val path = freshPath("lr")
    val trained = QualityClassifier.trainScore(docs)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => QualityClassifier.serveScore(docs, path)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("semantic-dedup serve is bit-identical to in-query training " +
      "and writes the centroid table once") {
    val path = freshPath("sd")
    val trained = Similarity
      .semanticDedup(emb, k = 4, threshold = 0.9, trainIters = 1,
        trainTarget = 100)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => Similarity.semanticDedupServe(emb, path, k = 4,
          threshold = 0.9, trainIters = 1, trainTarget = 100)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("cluster-sample serve is bit-identical to in-query training " +
      "and writes the centroid table once") {
    val path = freshPath("cs")
    val trained = Similarity
      .clusterSample(emb, k = 4, budget = 30, trainIters = 1,
        trainTarget = 100)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => Similarity.clusterSampleServe(emb, path, k = 4,
          budget = 30, trainIters = 1, trainTarget = 100)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("fuzzy-dedup serve is bit-identical to in-query bucket " +
      "building and writes the bucket table once") {
    val path = freshPath("fz")
    val trained = graft.llm.Dedup
      .incrementalFuzzyDedup(docs, newMod = 5, maxDist = 3)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => graft.llm.Dedup.incrementalFuzzyServe(docs, path,
          newMod = 5, maxDist = 3)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("bpe encode serve is bit-identical to in-query learning and " +
      "writes the merge table once") {
    val path = freshPath("bpe")
    val trained = Bpe.encode(docs, rounds = 3)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => Bpe.encodeServe(docs, path, rounds = 3)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("lm serve is bit-identical to in-query training and writes " +
      "the trigram table once") {
    val path = freshPath("lm")
    val trained = graft.llm.LanguageModel.trigramPerplexity(docs)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => graft.llm.LanguageModel.perplexityServe(docs, path)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("dsir serve is bit-identical to in-query training and writes " +
      "the lambda table once") {
    val path = freshPath("dsir")
    val trained = graft.llm.Importance.dsirWeights(docs)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => graft.llm.Importance.dsirServe(docs, path)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("ivf serve is bit-identical to in-query training and writes " +
      "the centroid table once") {
    val path = freshPath("ivf")
    val trained = Similarity.ivfTrainedTopK(emb, nLists = 4,
        trainIters = 2, trainTarget = 100, nProbe = 2, nQueries = 3, k = 3)
      .collect().map(_.toSeq).toSeq
    assertServedOnce(path,
      () => Similarity.ivfServeTopK(emb, path, nLists = 4,
          trainIters = 2, trainTarget = 100, nProbe = 2, nQueries = 3,
          k = 3)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("centroid-outlier serve is bit-identical to in-query training " +
      "and writes the centroid table once") {
    val path = freshPath("co")
    val trained = Similarity
      .centroidOutliers(emb, k = 4, trainIters = 1, z = 1.0,
        trainTarget = 100)
      .collect().map(_.toSeq).toSeq
    assert(trained.nonEmpty, "outlier report empty — weak fixture")
    assertServedOnce(path,
      () => Similarity.centroidOutliersServe(emb, path, k = 4,
          trainIters = 1, z = 1.0, trainTarget = 100)
        .collect().map(_.toSeq).toSeq,
      trained)
  }

  test("two concurrent ensure() trainers produce one complete " +
      "artifact, identical frames, and no leftover tmp dirs") {
    import spark.implicits._
    val path = freshPath("race")
    def train() = (0 until 64).map(i => (i.toLong, s"v$i"))
      .toDF("id", "v")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futures = (1 to 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Seq[Seq[Any]]] {
        def call(): Seq[Seq[Any]] = {
          barrier.await()
          ModelStore.ensure(path, train())
            .orderBy("id").collect().map(_.toSeq).toSeq
        }
      })
    }
    val results = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(results(0) == results(1),
      "racing trainers returned different frames")
    assert(results(0).size == 64)
    // the artifact on disk is complete and readable
    val persisted = spark.read.parquet(path)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(persisted == results(0), "persisted artifact differs")
    // the losing trainer's tmp dir was cleaned up
    val parent = new java.io.File(path).getParentFile
    val leftovers = parent.listFiles().map(_.getName)
      .filter(_.contains(".tmp-"))
    assert(leftovers.isEmpty,
      s"leftover tmp dirs: ${leftovers.mkString(", ")}")
  }

  test("a bumped trainer spec retrains; an unchanged spec serves the " +
      "artifact byte-identically; empty spec keeps legacy behavior") {
    import spark.implicits._
    val path = freshPath("spec")
    var trains = 0
    def train(rows: Seq[(Long, String)]) = {
      trains += 1
      rows.toDF("id", "v")
    }
    val v1 = Seq((1L, "a")); val v2 = Seq((2L, "b"))
    assert(ModelStore.ensure(path, train(v1), spec = "trainer v1")
      .collect().map(_.toSeq).toSeq == Seq(Seq(1L, "a")))
    assert(trains == 1)
    // unchanged spec: served, not retrained, artifact untouched
    val stamps = new java.io.File(path).listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(ModelStore.ensure(path, train(v1), spec = "trainer v1")
      .collect().map(_.toSeq).toSeq == Seq(Seq(1L, "a")))
    assert(trains == 1, "unchanged spec retrained")
    assert(new java.io.File(path).listFiles()
      .map(f => f.getName -> f.lastModified()).toMap == stamps,
      "artifact rewritten on spec-matched serve")
    // bumped spec: the CHANGED trainer actually runs and replaces
    // the artifact (the r9 staleness hole: write-once-forever would
    // silently serve v1 here)
    assert(ModelStore.ensure(path, train(v2), spec = "trainer v2")
      .collect().map(_.toSeq).toSeq == Seq(Seq(2L, "b")))
    assert(trains == 2, "bumped spec did not retrain")
    // the new artifact now serves without retraining
    assert(ModelStore.ensure(path, train(v2), spec = "trainer v2")
      .collect().map(_.toSeq).toSeq == Seq(Seq(2L, "b")))
    assert(trains == 2)
    // no stale-* residue from the swap
    val parent = new java.io.File(path).getParentFile
    assert(parent.listFiles().map(_.getName)
      .count(_.contains(".stale-")) == 0)
    // empty expected spec accepts any stamped artifact (legacy)
    assert(ModelStore.ensure(path, train(v1))
      .collect().map(_.toSeq).toSeq == Seq(Seq(2L, "b")))
    assert(trains == 2)
  }
}
