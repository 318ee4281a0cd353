package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.DocumentsStream

/** Batch-parity specs for the streaming curation twins: the stream
  * must make exactly the decisions the batch pipeline makes.
  */
class DocumentsStreamSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("docs-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf + "/documents.parquet"),
      dir.resolve("documents.parquet"))
    dir.toString
  }

  test("streaming quality filter keeps the batch keep-set") {
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    assert(stream.isStreaming)
    val q = DocumentsStream.qualityFilter(stream)
      .filter(col("verdict") === "keep")
      .writeStream.outputMode("append")
      .format("memory").queryName("quality_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id FROM quality_out")
        .collect().map(_.getLong(0)).toSet
      val batch = graft.llm.TextAnalysis.quality(Tables.documents(spark, sf))
        .filter(col("verdict") === "keep")
        .collect().map(_.getLong(0)).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming classifier apply matches batch training scores") {
    // train in batch, serve on the stream: probabilities must agree
    val docs = Tables.documents(spark, sf)
    val batchScores = graft.llm.QualityClassifier.trainScore(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // re-derive the stats + weights exactly as trainScore does (the
    // operator API returns scores; the spec replays its internals via
    // a second training run and checks the stream agrees with batch)
    val (mu, sd, w) = graft.llm.QualityClassifier.trainedModel(docs)
    val q = DocumentsStream
      .applyClassifier(DocumentsStream.readDocuments(spark, docsDir),
        mu, sd, w)
      .select(col("doc_id"), col("prob"))
      .writeStream.outputMode("append")
      .format("memory").queryName("clf_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, prob FROM clf_out")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size == batchScores.size)
      assert(got.forall { case (id, p) =>
        math.abs(p - batchScores(id)) < 1e-9 })
    } finally q.stop()
  }

  test("streaming pq encode-on-ingest matches batch codes bit-for-bit") {
    import graft.llm.Similarity
    val embDir = {
      val dir = java.nio.file.Files.createTempDirectory("emb-stream")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf + "/embeddings.parquet"),
        dir.resolve("embeddings.parquet"))
      dir.toString
    }
    val emb = Tables.embeddings(spark, sf)
    val (dim, m, ksub) = (64, 4, 16)
    val cbRow = Similarity.pqCodebook(emb, dim, m, ksub)
    val batch = Similarity.pqEncode(emb, cbRow, dim, m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // codebook collected once (bounded: m*ksub entries) -> literals
    val cb = cbRow.collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val stream = graft.streaming.EmbeddingsStream
      .readEmbeddings(spark, embDir)
    assert(stream.isStreaming)
    val q = graft.streaming.EmbeddingsStream
      .pqEncode(stream, cb, m, dim / m)
      .writeStream.outputMode("append")
      .format("memory").queryName("pq_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT vec_id, codes FROM pq_out")
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(got.size == batch.size)
      assert(got.forall { case (id, codes) => codes == batch(id) })
    } finally q.stop()
  }

  test("streaming int8 scoring drains to the exact batch x80 ranking") {
    import graft.llm.Similarity
    import org.apache.spark.sql.functions.col
    val embDir = {
      val dir = java.nio.file.Files.createTempDirectory("emb-stream-i8")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf + "/embeddings.parquet"),
        dir.resolve("embeddings.parquet"))
      dir.toString
    }
    val emb = Tables.embeddings(spark, sf)
    // frozen query codes: the batch quantization of vec_id < 3,
    // collected once (bounded by construction) -> literals
    val queries = Similarity.int8Vectors(emb)
      .filter(col("vec_id") < 3)
      .select(col("vec_id"), col("qv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val stream = graft.streaming.EmbeddingsStream
      .readEmbeddings(spark, embDir)
    val q = graft.streaming.EmbeddingsStream
      .int8ScoreOnIngest(stream, queries)
      .writeStream.outputMode("append")
      .format("memory").queryName("i8_scores_out").start()
    try {
      q.processAllAvailable()
      val got = graft.streaming.EmbeddingsStream
        .int8TopKAtDrain(spark.sql("SELECT * FROM i8_scores_out"), k = 5)
        .collect().map(_.toSeq).toSeq
      val batch = Similarity.int8TopK(emb, nQueries = 3, k = 5)
        .collect().map(_.toSeq).toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming cluster assignment drains to the exact batch x85 " +
    "sample") {
    import graft.llm.Similarity
    import org.apache.spark.sql.functions.col
    val embDir = {
      val dir = java.nio.file.Files.createTempDirectory("emb-stream-ca")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf + "/embeddings.parquet"),
        dir.resolve("embeddings.parquet"))
      dir.toString
    }
    val emb = Tables.embeddings(spark, sf)
    // frozen trained centroids, collected once (<= k rows) -> literals
    val cents = Similarity.kmeansCentroids(emb, k = 8, iters = 1,
        trainTarget = 250).collect()
      .map(r => (r.getAs[Long]("__cid"),
        r.getAs[Seq[Double]]("ce").toArray)).toSeq
    val stream = graft.streaming.EmbeddingsStream
      .readEmbeddings(spark, embDir)
    val q = graft.streaming.EmbeddingsStream
      .clusterAssignOnIngest(stream, cents)
      .writeStream.outputMode("append")
      .format("memory").queryName("ca_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT vec_id, cid FROM ca_out")
      // assignments bit-equal to the batch argmax aggregate
      val gotAssign = drained.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batchAssign = Similarity.assignToCentroids(emb,
          Similarity.kmeansCentroids(emb, 8, 1, 250)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotAssign == batchAssign)
      // shared finisher reproduces x85 exactly
      val got = graft.streaming.EmbeddingsStream
        .clusterSampleAtDrain(drained, budget = 100)
        .collect().map(_.toSeq).toSeq
      val batch = Similarity.clusterSample(emb, k = 8, budget = 100)
        .collect().map(_.toSeq).toSeq
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming decontamination scoring drains to the exact batch " +
      "x105 report") {
    import graft.llm.Similarity
    import org.apache.spark.sql.functions.col
    import graft.functions.VectorFunctions.dot_product
    val embDir = {
      val dir = java.nio.file.Files.createTempDirectory("emb-stream-dc")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(sf + "/embeddings.parquet"),
        dir.resolve("embeddings.parquet"))
      dir.toString
    }
    val emb = Tables.embeddings(spark, sf)
    // frozen benchmark slice, collected once (< benchIds rows, the
    // zero-norm exclusion applied exactly as in batch) -> literals
    val bench = emb
      .filter(col("vec_id") < 32 &&
        dot_product(col("embedding"), col("embedding")) > 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val stream = graft.streaming.EmbeddingsStream
      .readEmbeddings(spark, embDir)
    val q = graft.streaming.EmbeddingsStream
      .deconScoreOnIngest(stream, bench, benchIds = 32)
      .writeStream.outputMode("append")
      .format("memory").queryName("dc_scores_out").start()
    try {
      q.processAllAvailable()
      val got = graft.streaming.EmbeddingsStream
        .deconReportAtDrain(spark.sql("SELECT * FROM dc_scores_out"),
          thetaC4 = 3000L)
        .collect().map(_.toSeq).toSeq
      val batch = Similarity.semanticDecontaminate(emb, benchIds = 32,
          thetaC4 = 3000L)
        .collect().map(_.toSeq).toSeq
      assert(got == batch)
      assert(batch.nonEmpty, "weak fixture: empty batch report")
    } finally q.stop()
  }

  test("streaming content dedup keeps one copy per digest") {
    val q = DocumentsStream
      .dedupByContent(DocumentsStream.readDocuments(spark, docsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT count(*) FROM dedup_out").collect()(0)
      val batch = Tables.documents(spark, sf)
        .select(md5(col("text"))).distinct().count()
      assert(got.getLong(0) == batch)
    } finally q.stop()
  }

  test("streaming decontamination drops exactly the batch-flagged docs") {
    val docs = Tables.documents(spark, sf)
    // benchmark = docs 0-4's 4-grams, as in x28
    val benchGrams = graft.llm.Dedup.nGrams(docs.filter(col("doc_id") < 5), 4)
      .select(col("g")).distinct().collect().map(_.getString(0)).toSeq
    val contaminated = graft.llm.Dedup.decontaminate(docs, benchIds = 5, n = 4)
      .collect().map(_.getLong(0)).toSet
    val q = DocumentsStream
      .decontaminate(DocumentsStream.readDocuments(spark, docsDir)
        .filter(col("doc_id") >= 5), benchGrams, 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_out").start()
    try {
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM decon_out")
        .collect().map(_.getLong(0)).toSet
      val all = docs.filter(col("doc_id") >= 5)
        .collect().map(_.getLong(0)).toSet
      assert(kept == all -- contaminated)
    } finally q.stop()
  }

  test("streaming shard assignment matches the batch shuffle's shards") {
    val q = DocumentsStream
      .shardAssign(DocumentsStream.readDocuments(spark, docsDir),
        "cast(doc_id as string)", shards = 8)
      .select(col("doc_id"), col("shard"))
      .writeStream.outputMode("append")
      .format("memory").queryName("shard_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, shard FROM shard_out")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val batch = graft.llm.Packing
        .shardShuffle(Tables.documents(spark, sf),
          "cast(doc_id as string)", shards = 8)
        .collect().map(r => r.getLong(2) -> r.getInt(0)).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming corpus-health running sums equal the batch rollup") {
    val q = DocumentsStream
      .corpusHealthRunning(DocumentsStream.readDocuments(spark, docsDir))
      .writeStream.outputMode("update")
      .format("memory").queryName("health_out").start()
    try {
      q.processAllAvailable()
      // update mode emits one row per source per update; the LAST
      // update per source is the drained running total
      val got = spark.sql(
        """SELECT source, n_docs, n_keep, s_uq6, total_chars FROM (
          |  SELECT *, row_number() OVER (PARTITION BY source
          |    ORDER BY n_docs DESC) AS rk FROM health_out) WHERE rk = 1
          |""".stripMargin)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val batch = graft.llm.TextAnalysis
        .corpusHealth(Tables.documents(spark, sf))
        .collect().map { r =>
          val keep = math.round(
            r.getAs[Double]("keep_rate") * r.getAs[Long]("n_docs"))
          r.getString(0) -> (r.getAs[Long]("n_docs"), keep,
            r.getAs[Long]("total_chars"))
        }.toMap
      // the quantized-uniqueness sum, exactly, via the SHARED
      // per-document projection (the one field with float-parity risk)
      val batchUq6 = graft.llm.TextAnalysis
        .healthProjection(Tables.documents(spark, sf))
        .groupBy(col("source")).agg(sum(col("uq6")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.keySet == batch.keySet)
      got.foreach { case (src, (n, k, uq6, c)) =>
        val (bn, bk, bc) = batch(src)
        assert(n == bn && k == bk && c == bc, s"source $src")
        assert(uq6 == batchUq6(src), s"source $src uq6")
      }
    } finally q.stop()
  }

  test("streaming bloom prescreen keeps exactly the batch non-pass set") {
    val docs = Tables.documents(spark, sf)
    // "already ingested": even doc_ids; build the filter in batch
    val seen = docs.filter(col("doc_id") % 2 === 0)
    val bloom = graft.operators.BloomPrune
      .buildFilter(seen, "doc_id", bits = 4096, k = 3)
      .select(explode(col("bloom"))).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    // batch pass set (possibly-seen keys, FPs included)
    val pass = graft.operators.BloomPrune
      .pruneAudit(docs, seen.select(col("doc_id").as("k")),
        "doc_id", "k", bits = 4096, k = 3)
      .collect().map(_.getLong(0)).toSet
    val q = DocumentsStream
      .bloomPrescreen(DocumentsStream.readDocuments(spark, docsDir),
        bloom, "doc_id", bits = 4096, k = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("bloom_out").start()
    try {
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM bloom_out")
        .collect().map(_.getLong(0)).toSet
      val all = docs.collect().map(_.getLong(0)).toSet
      assert(kept == all -- pass)
      // no false negatives: nothing "seen" survives the prescreen
      assert(kept.forall(_ % 2 == 1))
    } finally q.stop()
  }

  test("stateless shingle-route candidates cover the batch containment " +
      "pairs on the streamed slice") {
    val docs = Tables.documents(spark, sf)
    // batch-built bucket table at x62's dfCap, over the full corpus
    val buckets = graft.llm.Dedup.shingleBuckets(docs, dfCap = 10)
    val q = DocumentsStream
      .shingleCandidates(DocumentsStream.readDocuments(spark, docsDir),
        buckets)
      .writeStream.outputMode("append")
      .format("memory").queryName("shingle_cand_out").start()
    try {
      q.processAllAvailable()
      val cand = spark.sql("SELECT DISTINCT a, b FROM shingle_cand_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cand.nonEmpty)
      // every batch x62 containment pair must be a drained candidate
      // (threshold 0 keeps ALL bucket-surviving pairs: the candidate
      // superset property must not depend on the score cut)
      val batch = graft.llm.Dedup
        .containmentPairs(docs, dfCap = 10, threshold = 0.0)
        .select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty)
      val missing = batch -- cand
      assert(missing.isEmpty,
        s"${missing.size} batch pairs never surfaced: ${missing.take(5)}")
    } finally q.stop()
  }

  test("streaming LM scoring against the frozen trigram model " +
      "matches the batch scores") {
    val docs = Tables.documents(spark, sf)
    val lmRows = graft.llm.LanguageModel.lmTable(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val batch = graft.llm.LanguageModel.trigramPerplexity(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val q = DocumentsStream
      .scoreLmAgainst(DocumentsStream.readDocuments(spark, docsDir), lmRows)
      .writeStream.outputMode("append")
      .format("memory").queryName("lm_serve_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, n_tri, avg_nll, flagged FROM lm_serve_out")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
      assert(got.size == batch.size)
      assert(got.forall { case (id, (nt, nll, fl)) =>
        val (bnt, bnll, bfl) = batch(id)
        nt == bnt && math.abs(nll - bnll) < 1e-9 && fl == bfl
      })
    } finally q.stop()
  }

  test("streaming DSIR weighting against the frozen lambda model " +
      "equals the batch weights bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    val lam = graft.llm.Importance.lambdaTable(docs)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batch = graft.llm.Importance.dsirWeights(docs)
      .collect().map(_.toSeq).toSet
    val q = DocumentsStream
      .scoreDsirAgainst(DocumentsStream.readDocuments(spark, docsDir), lam)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_serve_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT doc_id, n_tokens, log_weight, keep FROM dsir_serve_out")
        .collect().map(_.toSeq).toSet
      assert(got == batch,
        s"stream≠batch: only-stream=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("streamed SCD2 version rows + drain finisher EQUAL batch x144 " +
      "intervals row-for-row") {
    val q = DocumentsStream
      .versionRowsOnIngest(DocumentsStream.readDocuments(spark, docsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("scd2_vr_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT doc_id, v, h FROM scd2_vr_out")
      val got = DocumentsStream.scd2AtDrain(drained)
        .collect().map(_.toSeq).toSet
      val batch = graft.llm.Dedup.scd2Intervals(Tables.documents(spark, sf))
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(got == batch,
        s"drained≠batch: only-drained=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("streamed substring-dup positions + drain finisher EQUAL " +
      "batch x73 spans on the streamed slice") {
    val docs = Tables.documents(spark, sf)
    val k = 8
    val grams = graft.llm.Dedup.gramTable(docs, k)
    val sliceDir = java.nio.file.Files
      .createTempDirectory("docs-sub-slice").toString
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(sliceDir)
    val q = DocumentsStream
      .substringDupPositions(
        DocumentsStream.readDocuments(spark, sliceDir), grams, k)
      .writeStream.outputMode("append")
      .format("memory").queryName("sub_dup_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT doc_id, pos FROM sub_dup_out")
      val got = DocumentsStream
        .substringSpansAtDrain(drained, docs, k)
        .collect().map(_.toSeq).toSet
      val batch = graft.llm.Dedup.substringDupSpans(docs, k)
        .filter(col("doc_id") % 3 === 0)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty, "batch restriction is empty — weak fixture")
      assert(got == batch,
        s"drained≠batch: only-drained=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("streamed novelty grams + drain finisher EQUAL batch x96 " +
      "row-for-row when frozen + streamed cover the corpus") {
    val docs = Tables.documents(spark, sf)
    val k = 8
    val frozen = graft.llm.Dedup.distinctGrams(
      docs.filter(col("doc_id") % 3 =!= 0), k)
    val sliceDir = java.nio.file.Files
      .createTempDirectory("docs-novelty-slice").toString
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(sliceDir)
    val q = DocumentsStream
      .noveltyGramsOnIngest(
        DocumentsStream.readDocuments(spark, sliceDir), k)
      .writeStream.outputMode("append")
      .format("memory").queryName("novelty_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT doc_id, h FROM novelty_out")
      val got = DocumentsStream.noveltyAtDrain(drained, frozen)
        .collect().map(_.toSeq).toSet
      val batch = graft.llm.Dedup.ngramNovelty(docs, k)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(got == batch,
        s"drained≠batch: only-drained=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("ingest scrub drain finisher: known content removed, novel " +
      "text survives, corpus stays canonical") {
    import spark.implicits._
    val ten = (1 to 10).map(i => s"s$i").mkString(" ")
    val other = (1 to 10).map(i => s"o$i").mkString(" ")
    val corpus = Seq((1L, ten), (2L, other)).toDF("doc_id", "text")
    val arrivals = Seq(
      (100L, ten),                        // exact re-serve -> empty
      (101L, s"n1 n2 n3 $other n4 n5"),   // embedded known run
      (102L, "v1 v2 v3 v4 v5 v6"))        // novel -> untouched
      .toDF("doc_id", "text")
    val k = 4
    val grams = graft.llm.Dedup.gramTable(corpus, k)
    val dir = java.nio.file.Files
      .createTempDirectory("docs-scrub-stream").toString
    arrivals.select(col("doc_id"), col("text"),
      lit("en").as("lang"), lit("srcX").as("source"),
      length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(dir)
    val q = DocumentsStream
      .substringDupPositions(
        DocumentsStream.readDocuments(spark, dir), grams, k)
      .writeStream.outputMode("append")
      .format("memory").queryName("scrub_pos_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT doc_id, pos FROM scrub_pos_out")
      val out = DocumentsStream.scrubAtDrain(drained, arrivals, k)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_removed_spans"),
            r.getAs[String]("clean_text")))).toMap
      assert(out.size == 3)
      assert(out(100L) == ((1L, "")))
      assert(out(101L) == ((1L, "n1 n2 n3 n4 n5")))
      assert(out(102L) == ((0L, "v1 v2 v3 v4 v5 v6")))
    } finally q.stop()
  }

  test("streamed BM25 retrieval + drain finisher EQUALS batch x74 " +
      "on the streamed query slice") {
    val docs = Tables.documents(spark, sf)
    val (postings, stats) = graft.llm.TextAnalysis.bm25Index(docs)
    // stream a SLICE of the batch query set (even ids among the
    // first 6), so the restriction in the equality claim is real
    val sliceDir = java.nio.file.Files
      .createTempDirectory("docs-bm25-slice").toString
    docs.filter(col("doc_id") < 6 && col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(sliceDir)
    val q = DocumentsStream
      .bm25Candidates(DocumentsStream.readDocuments(spark, sliceDir),
        postings, stats, qTerms = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("bm25_cand_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT qid, doc_id, nano FROM bm25_cand_out")
      val got = DocumentsStream.bm25AtDrain(drained, k = 5)
        .collect().map(_.toSeq).toSet
      val batch = graft.llm.TextAnalysis
        .bm25TopK(docs, nQueries = 6, qTerms = 8, k = 5)
        .filter(col("qid") % 2 === 0)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty, "batch restriction is empty — weak fixture")
      assert(got == batch,
        s"drained≠batch: only-drained=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("drain-time containment finisher EQUALS batch x62 on the " +
      "streamed slice — scores included, not a superset") {
    val docs = Tables.documents(spark, sf)
    val buckets = graft.llm.Dedup.shingleBuckets(docs, dfCap = 10)
    // stream only a SLICE of the corpus (every third doc) so the
    // restriction in the equality claim is exercised for real
    val sliceDir = java.nio.file.Files
      .createTempDirectory("docs-slice").toString
    docs.filter(col("doc_id") % 3 === 0)
      .write.mode("overwrite").parquet(sliceDir)
    val q = DocumentsStream
      .shingleCandidates(DocumentsStream.readDocuments(spark, sliceDir),
        buckets)
      .writeStream.outputMode("append")
      .format("memory").queryName("shingle_slice_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT a, b FROM shingle_slice_out")
      val got = DocumentsStream
        .containmentAtDrain(drained, buckets, threshold = 0.5)
        .collect().map(_.toSeq).toSet
      val batch = graft.llm.Dedup
        .containmentPairs(docs, dfCap = 10, threshold = 0.5)
        .filter(col("a") % 3 === 0)
        .collect().map(_.toSeq).toSet
      assert(batch.nonEmpty, "batch restriction is empty — weak fixture")
      assert(got == batch,
        s"drained≠batch: only-drained=${(got -- batch).take(3)} " +
          s"only-batch=${(batch -- got).take(3)}")
    } finally q.stop()
  }

  test("running source counts + drain-time quotas match the batch " +
    "temperature mix allocation") {
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.sourceCountsRunning(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("src_counts").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT source, cnt FROM src_counts")
      val batchCnt = Tables.documents(spark, sf)
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      // per-source running state drains to the exact batch counts
      assert(drained.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == batchCnt.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      // identical counts through the shared finisher → identical quotas
      val sq = DocumentsStream.temperatureQuotas(drained, 200)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val bq = graft.llm.Sampling.allocations(batchCnt, 200, 0.7)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(sq == bq)
      assert(sq.values.sum == 200, s"quota sum ${sq.values.sum}")
      // the x45 batch operator admits exactly alloc docs per source
      // (or everything it has, for an undersized source)
      val admitted = graft.llm.Sampling
        .temperatureMix(Tables.documents(spark, sf), 200)
        .groupBy(col("source")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      admitted.foreach { case (src, n) => assert(n <= bq(src), src) }
    } finally q.stop()
  }

  test("ingest token counts feed the exact batch sorted-batches layout") {
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.tokenCountsOnIngest(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("tok_counts").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT doc_id, n_tokens FROM tok_counts")
      val fromStream = graft.llm.Packing
        .batchesFromTokenCounts(drained, 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3))).toSeq
      val batch = graft.llm.Packing
        .sortedBatches(Tables.documents(spark, sf), 32)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3))).toSeq
      assert(fromStream == batch)
    } finally q.stop()
  }

  test("running vocab counts + stateless OOV serving match batch " +
    "vocab coverage") {
    val docs = Tables.documents(spark, sf)
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.vocabCountsRunning(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("vocab_counts").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT w, c FROM vocab_counts")
      // drained counts ≡ batch counts, and the shared top-V finisher
      // over them ≡ the batch cut
      val batchCounts = docs
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      assert(drained.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        == batchCounts.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
      val vocab = DocumentsStream.vocabTopV(drained, 16)
        .collect().map(_.getString(0)).toSeq
      assert(vocab == graft.llm.TextAnalysis
        .topVocab(batchCounts, 16).collect().map(_.getString(0)).toSeq)
      // stateless serving with that vocabulary reproduces the batch
      // operator row for row
      val q2 = DocumentsStream.oovScore(
          DocumentsStream.readDocuments(spark, docsDir), vocab)
        .writeStream.outputMode("append")
        .format("memory").queryName("oov_out").start()
      try {
        q2.processAllAvailable()
        val got = spark.sql("SELECT * FROM oov_out").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSet
        val batch = graft.llm.TextAnalysis.vocabCoverage(docs, 16)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3))).toSet
        assert(got == batch)
      } finally q2.stop()
    } finally q.stop()
  }

  test("running (source, token) counts drain into the exact batch " +
    "source-divergence matrix") {
    val docs = Tables.documents(spark, sf)
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.tfCountsRunning(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tf_counts").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT source, w, c FROM tf_counts")
      val got = DocumentsStream.divergenceAtDrain(drained)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val batch = graft.llm.TextAnalysis.sourceDivergence(docs)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("length-bucket routing on ingest agrees with the batch expression") {
    val bounds = Seq(50L, 100L, 200L)
    val q = DocumentsStream.lengthBucketAssign(
        DocumentsStream.readDocuments(spark, docsDir), bounds)
      .select(col("doc_id"), col("n_tokens"), col("bucket"))
      .writeStream.outputMode("append")
      .format("memory").queryName("len_buckets").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM len_buckets").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val batch = DocumentsStream.lengthBucketAssign(
          Tables.documents(spark, sf), bounds)
        .select(col("doc_id"), col("n_tokens"), col("bucket")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == batch)
      // the boundaries actually split this corpus
      assert(got.map(_._3).size >= 2)
    } finally q.stop()
  }

  test("running count-min sketch drains bit-equal to batch; estimates " +
    "match x61") {
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.cmSketchRunning(stream, depth = 3, width = 16)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_sketch_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT sk FROM cm_sketch_out")
      val docs = Tables.documents(spark, sf)
      // elementwise-sum merges: the drained grid is bit-equal to batch
      val batchSk = graft.llm.HeavyHitters.cmSketch(docs, 3, 16)
        .collect()(0).getSeq[Long](0)
      assert(drained.collect()(0).getSeq[Long](0) == batchSk)
      // and the shared estimate machinery reproduces x61 exactly
      val fromStream = DocumentsStream
        .cmEstimatesAtDrain(docs, drained, 3, 16)
        .collect().map(_.toSeq).toSeq
      val batch = graft.llm.HeavyHitters.cmEstimates(docs, 3, 16)
        .collect().map(_.toSeq).toSeq
      assert(fromStream == batch)
    } finally q.stop()
  }

  test("running psi counts drain to the exact batch x82 psi values") {
    val docs = Tables.documents(spark, sf)
    val baseline = graft.llm.TextAnalysis.psiBaseline(docs)
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.psiCountsRunning(stream, baseline)
      .writeStream.outputMode("complete")
      .format("memory").queryName("psi_counts_out").start()
    try {
      q.processAllAvailable()
      val fromStream = DocumentsStream.psiAtDrain(
          spark.sql("SELECT * FROM psi_counts_out"), baseline)
        .collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Double]("psi"))
        .toMap
      val batch = graft.llm.TextAnalysis.psiDrift(docs).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Double]("psi"))
        .toMap
      assert(fromStream == batch)
    } finally q.stop()
  }

  test("streaming gopher rules reproduce the batch verdict table " +
    "bit-for-bit") {
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.gopherRulesOnIngest(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT * FROM gopher_out").collect()
        .map(_.toSeq).toSet
      val batch = graft.llm.TextAnalysis
        .gopherRules(Tables.documents(spark, sf)).collect()
        .map(_.toSeq).toSet
      assert(got == batch)
      // the fixture corpus actually splits on the verdicts
      assert(spark.sql("SELECT DISTINCT keep FROM gopher_out")
        .count() == 2)
    } finally q.stop()
  }

  test("streaming filter funnel at drain equals the batch x113 " +
    "table exactly") {
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.gopherRulesOnIngest(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_verdicts_out").start()
    try {
      q.processAllAvailable()
      val fromStream = DocumentsStream.funnelAtDrain(
          spark.sql("SELECT * FROM funnel_verdicts_out"))
        .collect().map(_.toSeq).toSeq
      val batch = graft.llm.TextAnalysis
        .filterFunnel(Tables.documents(spark, sf))
        .collect().map(_.toSeq).toSeq
      assert(fromStream == batch)
      // the fixture corpus produces a non-degenerate funnel (some
      // docs removed, some surviving)
      assert(batch.last.last.asInstanceOf[Long] > 0L)
      assert(batch.map(_(4).asInstanceOf[Long]).sum > 0L)
    } finally q.stop()
  }

  test("ingest-time fuzzy dedup: re-served content drops against the " +
    "frozen rep buckets, novel arrivals keep") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s0"),
      (2L, "alpha beta gamma delta epsilon zeta", "s0"),
      (3L, "alpha beta gamma delta epsilon zeta", "s1"),
      (9L, "utterly different content entirely here now", "s2"))
      .toDF("doc_id", "text", "source")
    // the serving signature must be bit-equal to the batch groupBy form
    val mapOnly = graft.llm.Dedup.simhashSignatureMapOnly(corpus)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchSig = graft.llm.Dedup.simhash32Signatures(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapOnly == batchSig)
    val buckets = graft.llm.Dedup.repSignatureBuckets(corpus, maxDist = 3)
    // reps: 1 (cluster {1,2,3}) and 9 (singleton) — members 2, 3 absent
    assert(buckets.select("rep_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(1L, 9L))
    val dir = java.nio.file.Files.createTempDirectory("fuzzy-ingest")
    Seq(
      (101L, "alpha beta gamma delta epsilon zeta", "en", "s9", 35L),
      (102L, "wholly novel arrival content nothing matches", "en", "s9",
        44L),
      (103L, "utterly different content entirely here now", "en", "s9",
        43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.toString)
    val q = DocumentsStream.fuzzyMatchesOnIngest(
        DocumentsStream.readDocuments(spark, dir.toString), buckets,
        maxDist = 3)
      .writeStream.outputMode("append").format("memory")
      .queryName("fuzzy_ingest_out").start()
    try {
      q.processAllAvailable()
      val verdicts = DocumentsStream.fuzzyVerdictsAtDrain(
          spark.read.parquet(dir.toString),
          spark.sql("SELECT * FROM fuzzy_ingest_out"))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(1), Option(r.get(2))))).toMap
      assert(!verdicts(101L)._1 && verdicts(101L)._2 == Some(1L))
      assert(verdicts(102L)._1 && verdicts(102L)._2.isEmpty)
      assert(!verdicts(103L)._1 && verdicts(103L)._2 == Some(9L))
    } finally q.stop()
  }

  test("running hll registers drain bit-equal to batch; estimates " +
    "match x79") {
    val stream = DocumentsStream.readDocuments(spark, docsDir)
    val q = DocumentsStream.hllRegistersRunning(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_regs_out").start()
    try {
      q.processAllAvailable()
      val drained = spark.sql("SELECT source, idx, reg FROM hll_regs_out")
      val docs = Tables.documents(spark, sf)
      // max merges: the drained register table is bit-equal to batch
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getAs[String]("source"), r.getAs[Int]("idx"))
      val batchRegs = graft.llm.Hll.registers(docs).collect()
        .map(r => key(r) -> r.getAs[Int]("reg")).toMap
      val gotRegs = drained.collect()
        .map(r => key(r) -> r.getAs[Int]("reg")).toMap
      assert(gotRegs == batchRegs)
      // shared finisher reproduces the x79 estimate columns exactly
      val fromStream = DocumentsStream.hllEstimatesAtDrain(drained)
        .collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("zeros"), r.getAs[Double]("est")))).toMap
      val batchEst = graft.llm.Hll
        .estimatesFromRegisters(graft.llm.Hll.registers(docs)).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("zeros"), r.getAs[Double]("est")))).toMap
      assert(fromStream == batchEst)
      assert(fromStream.contains("ALL"))
    } finally q.stop()
  }
}
