package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.9 X4): media as opaque
  * `binary` columns + typed metadata structs, with decode /
  * feature-extraction as per-partition batch functions.
  *
  * The container has no image/audio codecs, so [[FakeDecoder]] is a
  * clearly-marked deterministic STUB standing in for the real decoder
  * (libjpeg/ffmpeg would slot into `decodeOne`); everything around
  * it — the binary column plumbing, metadata schema, partition-batch
  * shape, and feature-vector output — is the real 100 TB design: one
  * `mapPartitions` pass, no driver collection, codec state reused
  * across a partition's rows.
  */
object Multimodal {

  /** Media record: opaque payload + typed metadata (the schema a
    * parquet media lake would carry).
    */
  final case class MediaRecord(doc_id: Long, media: Array[Byte],
      width: Int, height: Int, frames: Int)

  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      features: Array[Float])

  /** Build the media table from `documents`: payload = utf-8 bytes of
    * text (stand-in for image bytes), metadata derived
    * deterministically from payload size so the oracle can reproduce
    * it in SQL.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("media"),
      (lit(1) + length(col("text").cast("binary")) % 64).as("width"),
      (lit(1) + (length(col("text").cast("binary")) * 7) % 48).as("height"),
      (lit(1) + col("doc_id") % 16).cast("int").as("frames"))

  /** STUB decoder: a real implementation would parse the container
    * format and decode pixels/samples. This fake derives 8 floats
    * from the payload bytes deterministically so tests and oracles
    * have a fixed point. The *signature* (bytes → fixed-length
    * feature vector) is the real contract.
    */
  object FakeDecoder {
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      // ??? real codec goes here; deterministic fake below
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(payload)
      Array.tabulate(8) { i =>
        val nibble = (digest(i / 2) >> (if (i % 2 == 0) 4 else 0)) & 0xf
        nibble / 15.0f
      }
    }
  }

  /** Resize planning: target dimensions under an aspect-preserving
    * max-edge constraint plus the crop box for a center square —
    * the pure-arithmetic half of an image resize stage (the pixel
    * resampling itself belongs in the [[FakeDecoder]] slot). Integer
    * arithmetic only, reproduced verbatim in the x27 oracle.
    */
  def resizePlan(media: DataFrame, maxEdge: Int): DataFrame = {
    val scaleNum = lit(maxEdge)
    val longEdge = greatest(col("width"), col("height"))
    // floor-scaled target edges, aspect preserved, never upscaled
    val tw = when(longEdge <= maxEdge, col("width"))
      .otherwise((col("width") * scaleNum) / longEdge)
    val th = when(longEdge <= maxEdge, col("height"))
      .otherwise((col("height") * scaleNum) / longEdge)
    media.select(col("doc_id"), col("width"), col("height"),
      tw.cast("int").as("target_w"), th.cast("int").as("target_h"),
      // center-square crop in source coordinates
      least(col("width"), col("height")).as("crop_edge"),
      ((col("width") - least(col("width"), col("height"))) / 2)
        .cast("int").as("crop_x"),
      ((col("height") - least(col("width"), col("height"))) / 2)
        .cast("int").as("crop_y"))
  }

  /** Distributed feature extraction: one decoder instance per
    * partition (the expensive part for a real codec), streaming
    * through rows — the Spark-side shape a real multimodal pipeline
    * needs, independent of what decodeOne does.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        // per-partition decoder setup happens once, here
        it.map { case (id, payload, w, h) =>
          MediaFeatures(id, w, h, FakeDecoder.decodeOne(payload))
        }
      }
  }
}
