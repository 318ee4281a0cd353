package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twin of the vector-ingest surface
  * (graft.llm.Similarity): embeddings landing from an encoder fleet
  * are product-quantized on ingest, so the searchable code table
  * grows continuously while the (batch-trained) codebook stays
  * fixed — the standard vector-database write path. The quantizer
  * rides as literals (train-in-batch / serve-in-stream, like
  * DocumentsStream.applyClassifier): a stateless per-row projection,
  * no join, no shuffle, no state store; at 100 TB/day it scales with
  * executors.
  */
object EmbeddingsStream {

  val schema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** PQ encode-on-ingest: the codebook (from
    * [[graft.llm.Similarity.pqCodebook]], collected once — it is
    * bounded at m·ksub entries by construction) becomes a literal
    * array column, and the argmin projection is the exact expression
    * the batch encoder uses, so stream and batch codes agree
    * bit-for-bit.
    */
  def pqEncode(vecs: DataFrame, codebook: Seq[(Int, Int, Array[Float])],
      m: Int, subDim: Int): DataFrame = {
    val cbLit: Column = array(
      codebook.sortBy(e => (e._1, e._2)).map { case (sub, cid, cvec) =>
        struct(lit(sub).as("sub"), lit(cid).as("cid"),
          array(cvec.map(lit(_)): _*).as("cvec"))
      }: _*)
    vecs.withColumn("cb", cbLit)
      .select(col("vec_id"),
        graft.llm.Similarity.pqArgminCodes(col("embedding"), m, subDim)
          .as("codes"))
  }

  /** Int8-quantized scoring on ingest — the streaming half of x80:
    * each arriving vector quantizes in the projection (the shared
    * int8Vectors expressions — scale = max|v|/127, exact-integer
    * codes) and scores against the FROZEN query codes carried as
    * literals (train-in-batch / serve-in-stream, like [[pqEncode]]).
    * Stateless: no join, no state store; emits one (qid, vec_id,
    * qcos) row per (arrival, query), cost ∝ |queries| per arrival.
    * Scales cancel in the quantized cosine, so the streamed scores
    * are bit-equal to the batch x80 scores.
    */
  def int8ScoreOnIngest(vecs: DataFrame,
      queries: Seq[(Long, Array[Double])]): DataFrame = {
    val qLit: Column = array(queries.map { case (qid, qq) =>
      struct(lit(qid).as("qid"), array(qq.map(lit(_)): _*).as("qq"))
    }: _*)
    graft.llm.Similarity.int8Vectors(vecs)
      .withColumn("q", explode(qLit))
      .filter(col("vec_id") =!= col("q.qid"))
      .withColumn("qcos",
        round(graft.functions.VectorFunctions
          .cosine_similarity(col("qv"), col("q.qq")), 6))
      .filter(col("qcos").isNotNull)
      .select(col("q.qid").as("qid"), col("vec_id"), col("qcos"))
  }

  /** Drain-time finisher: the shared x80 ranking tail over the
    * drained score rows — identical output to the batch search.
    */
  def int8TopKAtDrain(scored: DataFrame, k: Int): DataFrame =
    graft.llm.Similarity.int8Finish(scored, k)

  /** Cluster assignment on ingest — the serving half of the trained-
    * centroid family (x57/x68/x85): each arriving vector takes the
    * argmax-cosine cluster of the FROZEN centroids, carried as
    * literal columns (train-in-batch / serve-in-stream). The argmax
    * is `array_min(array(struct(−cos_i, cid_i)...)).cid` — the exact
    * ordering of the batch `min(struct(−cos, cid))` aggregate — so
    * streamed assignments are bit-equal to batch. Stateless: one
    * projection, k fused-kernel cosines per row, no join, no state.
    */
  def clusterAssignOnIngest(vecs: DataFrame,
      centroids: Seq[(Long, Array[Double])]): DataFrame = {
    val entries = centroids.map { case (cid, ce) =>
      struct(
        (-round(graft.functions.VectorFunctions.cosine_similarity(
          col("embedding"), array(ce.map(lit(_)): _*)), 6)).as("nc"),
        lit(cid).as("cid"))
    }
    vecs.select(col("vec_id"),
      array_min(array(entries: _*)).getField("cid").as("cid"))
  }

  /** Drain-time finisher: the shared x85 quota-and-select tail over
    * the drained assignment table — identical output to the batch
    * cluster sample.
    */
  def clusterSampleAtDrain(assigned: DataFrame, budget: Int,
      tau: Double = 0.5): DataFrame =
    graft.llm.Similarity.clusterSampleFromAssigned(assigned, budget, tau)

  /** Semantic decontamination on ingest — the streaming half of
    * x105: each arriving vector scores its max cosine to the FROZEN
    * benchmark vectors, carried as a literal array (train-in-batch /
    * serve-in-stream, like [[clusterAssignOnIngest]]). The scoring
    * expression is [[graft.llm.Similarity.deconMaxC4]] verbatim (the
    * batch operator evaluates it against the 1-row broadcast bench
    * aggregate), so streamed c4 scores are bit-equal to batch.
    * Stateless: one projection, |bench| fused-kernel cosines per
    * arrival, no join, no state store.
    */
  def deconScoreOnIngest(vecs: DataFrame,
      bench: Seq[(Long, Array[Float])], benchIds: Int): DataFrame = {
    require(bench.nonEmpty, "frozen benchmark set must be non-empty")
    val bLit: Column = array(bench.sortBy(_._1).map { case (bid, be) =>
      struct(lit(bid).as("bid"), array(be.map(lit(_)): _*).as("be"))
    }: _*)
    graft.llm.Similarity.deconCorpus(vecs, benchIds)
      .select(col("vec_id"), col("label"),
        graft.llm.Similarity.deconMaxC4(bLit).as("c4"))
  }

  /** Drain-time finisher: the shared x105 per-label report over the
    * drained (label, c4) rows — identical output to the batch
    * decontamination report.
    */
  def deconReportAtDrain(scored: DataFrame, thetaC4: Long): DataFrame =
    graft.llm.Similarity.deconReport(scored, thetaC4)
}
