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
}
