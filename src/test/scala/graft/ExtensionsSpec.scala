package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Extensions
import graft.llm.{Multimodal, Similarity}

class ExtensionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every extension query runs non-empty and has an oracle") {
    Extensions.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
      assert(Extensions.oracles.contains(name), s"$name missing oracle")
    }
  }

  test("minhash buckets contain genuinely similar candidates") {
    // identical docs must land in the same bucket in every band
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"), (2L, "a b c d e f g"),
      (3L, "x y z w q r s")).toDF("doc_id", "text")
    val buckets = graft.llm.Dedup.minhashBuckets(docs, 4).collect()
    assert(buckets.length == 4) // one shared bucket per band for docs 1,2
    buckets.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2)
      assert(r.getAs[Long]("d_min") == 1L && r.getAs[Long]("d_max") == 2L)
    }
  }

  test("simhash of identical docs is identical, different docs differ") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark data engine fast"), (2L, "spark data engine fast"),
      (3L, "completely unrelated words here")).toDF("doc_id", "text")
    val sh = graft.llm.Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(3L))
  }

  test("cosine top-k: identical vector ranks first with cos 1") {
    import spark.implicits._
    val docs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f)),
      (12L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(docs, nQueries = 1, k = 2).collect()
    assert(top(0).getAs[Long]("vec_id") == 10L)
    assert(math.abs(top(0).getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("near-dup pairs: identical vectors are always candidates with cos 1") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val vecs = Seq(
      (1L, base), (2L, base.clone()), // exact dup pair
      (3L, Array.fill(64)(rnd.nextGaussian().toFloat)),
      (4L, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(vecs, bands = 4, planesPerBand = 4,
      dim = 64, threshold = 0.9).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
    assert(math.abs(pairs(0).getDouble(2) - 1.0) < 1e-6)
  }

  test("pq top-k: a clone of a codebook query ranks first at distance 0") {
    import spark.implicits._
    // ids 0-3 are the codebook (and 0-1 the queries); 10/11 are exact
    // clones of queries 1/0, so their PQ codes hit the query's own
    // centroid in every subspace and the ADC distance is exactly 0
    val vecs = Seq(
      (0L, Array(4.0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (1L, Array(0f, 4.0f, 0f, 0f, 0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 4.0f, 0f, 0f, 0f, 1f, 0f)),
      (3L, Array(0f, 0f, 0f, 4.0f, 0f, 0f, 0f, 1f)),
      (10L, Array(0f, 4.0f, 0f, 0f, 0f, 1f, 0f, 0f)),
      (11L, Array(4.0f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)),
      (12L, Array(9f, 9f, 9f, 9f, 9f, 9f, 9f, 9f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(vecs, dim = 8, m = 2, ksub = 4,
      nQueries = 2, k = 3).collect()
    val byQ = top.groupBy(_.getAs[Long]("qid"))
    assert(byQ(0L).head.getAs[Long]("vec_id") == 11L)
    assert(byQ(0L).head.getAs[Long]("adist_u6") == 0L)
    assert(byQ(1L).head.getAs[Long]("vec_id") == 10L)
    assert(byQ(1L).head.getAs[Long]("adist_u6") == 0L)
    // ADC distances are non-decreasing in rank for every query
    byQ.values.foreach { rows =>
      val ds = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("adist_u6"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
    // self never appears among its own hits
    assert(top.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
  }

  test("d02 global coefs equal hand-computed DLSA of d01 chunk coefs") {
    val d01 = graft.queries.DarimaQueries.queries("d01_chunk_coefs")(spark, sf)
    val raw = graft.pipeline.Darima.fitChunkCoefs(spark,
      Tables.events(spark, sf).select(
        org.apache.spark.sql.functions.col("ts").cast("double").as("time"),
        org.apache.spark.sql.functions.col("value")),
      graft.pipeline.DarimaConfig(numChunks = 4, freq = 24, tol = 24,
        maxP = 3, maxQ = 2)).collect()
    // d01 now runs the closed-form olsar(2) config: 4 chunks ×
    // (beta0, beta1, sigma2, ar1, ar2)
    assert(d01.count() == 4 * 5)
    // hand-compute DLSA for one AR coefficient and compare to combine()
    val ar1 = raw.filter(_.getString(1) == "ar1")
    val want = ar1.map(r => r.getDouble(3) * r.getDouble(4)).sum /
      ar1.map(_.getDouble(4)).sum
    val got = graft.pipeline.Darima.combine(
      graft.pipeline.Darima.fitChunkCoefs(spark,
        Tables.events(spark, sf).select(
          org.apache.spark.sql.functions.col("ts").cast("double").as("time"),
          org.apache.spark.sql.functions.col("value")),
        graft.pipeline.DarimaConfig(numChunks = 4, freq = 24, tol = 24,
          maxP = 3, maxQ = 2)), "dlsa")
      .filter(org.apache.spark.sql.functions.col("coef") === "ar1")
      .collect()(0).getDouble(2)
    assert(math.abs(got - want) < 1e-9, s"dlsa $got vs hand $want")
  }

  test("PNG encode -> real ImageIO decode round-trips every pixel stat") {
    val media = Multimodal.encodePng(spark, Tables.documents(spark, sf))
    // media really is a PNG container
    val first = media.orderBy(col("doc_id")).head()
    val bytes = first.getAs[Array[Byte]]("media")
    assert(bytes.take(4).map(_ & 0xff).toSeq == Seq(0x89, 'P'.toInt,
      'N'.toInt, 'G'.toInt), "not a PNG signature")
    val got = Multimodal.extractFeatures(spark, media).collect()
    assert(got.nonEmpty && got.forall(_.features.length == 8))
    got.foreach { r =>
      val (w, h) = Multimodal.pngDims(r.doc_id)
      val px = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixel(r.doc_id, x, y)
      val s = px.map(_.toLong).sum
      val want = Array(w, h, px.min, px.max, (s % 997).toInt,
        (s / (w.toLong * h)).toInt, px.head, px.last).map(_.toFloat)
      assert(r.features.toSeq == want.toSeq, s"doc ${r.doc_id}")
    }
  }

  test("extractFeatures accepts an injected decoder double") {
    // the retired md5-nibble fake lives on as a test double proving
    // the decode stage is pluggable (a jpeg/ffmpeg decoder slots in
    // the same way)
    val fake = (payload: Array[Byte]) => {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(payload)
      Array.tabulate(8) { i =>
        val nibble = (digest(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xf
        nibble / 15.0f
      }
    }
    val media = Multimodal.mediaTable(Tables.documents(spark, sf))
    val f1 = Multimodal.extractFeatures(spark, media, fake).collect()
    assert(f1.forall(_.features.length == 8))
    assert(f1.forall(_.features.forall(v => v >= 0.0f && v <= 1.0f)))
  }
}
