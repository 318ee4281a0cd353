package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Degenerate-axis sweep for the EMBEDDING-consuming operators — the
  * vector-table counterpart of EmptyInputSpec's corpus shapes. At
  * 100 TB, zero-norm vectors (failed upstream encoders emit exactly
  * these), single-dimension projections, and n < k corpora are
  * routine; an operator that divides by a zero norm or indexes past a
  * short vector crashes in production. EmptyInputSpec already sweeps
  * n = 0/1/10 (so every k > n path) and all-identical vectors; this
  * spec adds the axes it cannot express: all-zero vectors, a mix of
  * zero-norm and normal vectors, and dim-1 corpora (via direct
  * operator calls with dim-consistent hyperparameters, since the
  * declared queries hard-code dim = 64).
  */
class EmbeddingDegenerateSpec extends AnyFunSuite {
  import SparkTestSession._

  private val embQueries = Seq("x05_cosine_topk", "x06_embed_lsh",
    "x16_embed_neardup", "x18_ivf_topk", "x24_embed_centroids",
    "x36_kmeans_refine", "x46_pq_topk", "x49_hard_negatives",
    "x57_semantic_dedup", "x66_pq_serve",
    "x80_int8_topk", "x81_int8_error", "x84_mmr_rerank",
    "x85_cluster_sample", "x94_binary_topk", "x95_jl_topk",
    "x97_centroid_outliers", "x105_semantic_decontaminate",
    "x107_ann_recall", "x110_ivf_occupancy", "x111_ranker_agreement",
    "x114_embed_diversity")

  /** 50 rows per table, with the embeddings rewritten by `vec`. */
  private def corpusWith(vec: org.apache.spark.sql.Column,
      tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"$tag-sf").toString
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents")
    names.foreach { n =>
      spark.read.parquet(s"$sf/$n.parquet").limit(50)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      .withColumn("embedding", vec.cast("array<float>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(50)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Every embedding the zero vector (dim 64 preserved). */
  private lazy val zeroDir: String = corpusWith(
    array_repeat(lit(0.0f), 64), "zero-emb")

  /** Zero-norm vectors interleaved with normal ones — the realistic
    * failed-encoder shape: even ids keep their vector, odd ids are
    * zeroed (including some of every query/seed prefix).
    */
  private lazy val mixedDir: String = corpusWith(
    when(pmod(col("vec_id"), lit(2)) === 1, array_repeat(lit(0.0f), 64))
      .otherwise(col("embedding")), "mixed-emb")

  private def sweep(dir: String, label: String): Unit = {
    val failures = embQueries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).count(); None }
      catch {
        case e: Throwable => Some(s"$name: " + Option(e.getMessage)
          .getOrElse(e.toString).linesIterator.take(1).mkString.take(160))
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on $label embeddings:\n" +
        failures.mkString("\n"))
  }

  test("every embedding query executes when ALL vectors are zero") {
    sweep(zeroDir, "all-zero")
  }

  test("every embedding query executes with zero-norm vectors " +
      "interleaved among normal ones") {
    sweep(mixedDir, "mixed zero-norm")
  }

  test("zero-norm corpus members never outrank real neighbors: " +
      "cosine top-k on the mixed corpus returns only finite scores") {
    val rows = Similarity
      .cosineTopK(Tables.embeddings(spark, mixedDir), nQueries = 2, k = 5)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(!c.isNaN && !c.isInfinite, s"non-finite cosine in $r")
    }
  }

  /** dim-1 corpus: 20 single-element vectors (values ±1..±10), with
    * the `label` column hardNegatives contractually reads.
    */
  private lazy val dim1: DataFrame = {
    import spark.implicits._
    (0 until 20).map { i =>
      (i.toLong,
        Array(((i % 10) + 1).toFloat * (if (i % 2 == 0) 1 else -1)),
        (i % 3).toString)
    }.toDF("vec_id", "embedding", "label")
  }

  test("dim-1 vectors: every operator runs with dim-consistent " +
      "hyperparameters") {
    val ops: Seq[(String, () => Long)] = Seq(
      "cosineTopK" -> (() =>
        Similarity.cosineTopK(dim1, nQueries = 3, k = 5).count()),
      "hardNegatives" -> (() =>
        Similarity.hardNegatives(dim1, nQueries = 3, k = 3).count()),
      "ivfTopK" -> (() =>
        Similarity.ivfTopK(dim1, nLists = 4, nProbe = 2, nQueries = 3,
          k = 3).count()),
      "lshBuckets" -> (() =>
        Similarity.lshBuckets(dim1, nPlanes = 4, dim = 1).count()),
      "nearDupPairs" -> (() =>
        Similarity.nearDupPairs(dim1, bands = 2, planesPerBand = 2,
          dim = 1, threshold = 0.8, bucketCap = 16).count()),
      "kmeansRefine" -> (() =>
        Similarity.kmeansRefine(dim1, k = 4, iters = 2).count()),
      "semanticDedup" -> (() =>
        Similarity.semanticDedup(dim1, k = 4, threshold = 0.9,
          trainIters = 1).count()),
      "pqTopK" -> (() =>
        Similarity.pqTopK(dim1, dim = 1, m = 1, ksub = 4, nQueries = 3,
          k = 3, trainIters = 1).count()),
      "semanticDecontaminate" -> (() =>
        Similarity.semanticDecontaminate(dim1, benchIds = 3,
          thetaC4 = 9000L).count()),
      "annRecallReport" -> (() =>
        Similarity.annRecallReport(dim1, nLists = 4, nProbe = 2,
          nQueries = 3, k = 2).count()),
      "ivfListOccupancy" -> (() =>
        Similarity.ivfListOccupancy(dim1, nLists = 4).count()),
      "embedDiversity" -> (() =>
        Similarity.embedDiversity(dim1).count()))
    val failures = ops.flatMap { case (name, run) =>
      try { run(); None }
      catch {
        case e: Throwable => Some(s"$name: " + Option(e.getMessage)
          .getOrElse(e.toString).linesIterator.take(1).mkString.take(160))
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} operators crash on dim-1 vectors:\n" +
        failures.mkString("\n"))
  }

  test("all-zero k-means keeps every centroid finite (no 0/0 mean)") {
    val rows = Similarity
      .kmeansRefine(Tables.embeddings(spark, zeroDir), k = 4, iters = 2)
      .collect()
    rows.foreach { r =>
      val v = r.getAs[Double]("centroid")
      assert(!v.isNaN && !v.isInfinite,
        s"non-finite centroid component in $r")
    }
  }
}
