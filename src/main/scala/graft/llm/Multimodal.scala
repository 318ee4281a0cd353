package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (SURVEY.md §2.9 X4): media as opaque
  * `binary` columns + typed metadata structs, with decode /
  * feature-extraction as per-partition batch functions.
  *
  * The decode stage is REAL: [[PngDecoder]] parses PNG containers via
  * the JDK's built-in `javax.imageio` (no external codec needed) and
  * emits pixel-statistic features. The fixture PNGs come from
  * [[encodePng]], which renders each document a small grayscale image
  * with a closed-form pixel function — PNG is lossless, so the DuckDB
  * oracle can verify the decoded statistics from the same closed form
  * without ever touching an image. The surrounding plumbing — binary
  * columns, metadata schema, partition-batch shape, feature-vector
  * output — is the 100 TB design: one `mapPartitions` pass, no driver
  * collection, codec state reused across a partition's rows.
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

  /** Grayscale pixel value of the synthetic fixture image — shared by
    * the encoder, the round-trip spec, and (inlined as arithmetic)
    * the x12 oracle SQL.
    */
  def pixel(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

  /** Fixture dimensions per document (small on purpose — the decode
    * path is what's under test, not codec throughput).
    */
  def pngDims(docId: Long): (Int, Int) =
    ((4 + docId % 5).toInt, (3 + docId % 4).toInt)

  /** Render each document a real PNG (grayscale values from
    * [[pixel]]) in one `mapPartitions` pass: (doc_id, media, width,
    * height) with `media` holding genuine container bytes.
    */
  def encodePng(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    javax.imageio.ImageIO.setUseCache(false)
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h) = pngDims(id)
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = pixel(id, x, y)
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray, w, h)
        }
      }
      .toDF("doc_id", "media", "width", "height")
  }

  /** REAL decoder: parse the PNG container with the JDK's ImageIO and
    * reduce the pixels to 8 integer-valued statistics (exact in
    * float): [width, height, min, max, sum mod 997, mean (integer
    * division), first pixel, last pixel]. The signature (bytes →
    * fixed-length feature vector) is the decoder contract; a JPEG/
    * ffmpeg-backed implementation slots into the same
    * [[extractFeatures]] parameter.
    */
  object PngDecoder {
    javax.imageio.ImageIO.setUseCache(false)
    /** Corrupt/unparseable payloads decode to an empty feature vector
      * (ImageIO.read returns null or throws): a 100 TB media lake
      * always contains truncated objects, and one of them must not
      * kill the whole stage. Downstream posexplode drops the row.
      */
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      // NonFatal, not just IOException: the JDK readers throw
      // IllegalArgument/IndexOutOfBounds-style RuntimeExceptions on
      // some malformed chunk structures
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) return Array.empty
      val w = img.getWidth
      val h = img.getHeight
      var mn = 255
      var mx = 0
      var s = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = img.getRGB(x, y) & 0xff
          if (g < mn) mn = g
          if (g > mx) mx = g
          s += g
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Array(w, h, mn, mx, (s % 997).toInt, (s / n).toInt,
        img.getRGB(0, 0) & 0xff, img.getRGB(w - 1, h - 1) & 0xff)
        .map(_.toFloat)
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

  /** 63-bit perceptual hash (aHash) from REAL decoded pixels: an 8×8
    * sampled grid (x = ⌊i·w/8⌋, y = ⌊j·h/8⌋; cell (7,7) dropped so
    * the hash never touches the sign bit — signed-64 portability
    * across engines), bit(i,j) set iff 63·g ≥ Σg (the mean test in
    * exact integer arithmetic). PNG is lossless and the fixture
    * pixels are closed-form, so the DuckDB oracle reproduces the
    * identical hash from [[pixel]]/[[pngDims]] arithmetic without
    * decoding anything. Corrupt payloads drop (no row), the
    * [[PngDecoder]] convention.
    */
  def pHash(spark: SparkSession, pngs: DataFrame): DataFrame = {
    import spark.implicits._
    javax.imageio.ImageIO.setUseCache(false)
    pngs.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) None
          else {
            val w = img.getWidth
            val h = img.getHeight
            val gs = new Array[Int](64)
            var s = 0L
            var k = 0
            while (k < 63) {
              val i = k / 8
              val j = k % 8
              val g = img.getRGB(i * w / 8, j * h / 8) & 0xff
              gs(k) = g
              s += g
              k += 1
            }
            var ph = 0L
            k = 0
            while (k < 63) {
              if (63L * gs(k) >= s) ph |= 1L << k
              k += 1
            }
            Some((id, ph))
          }
        }
      }
      .toDF("doc_id", "ph")
  }

  /** X4: perceptual-hash image near-dup pairs — the media face of the
    * dedup family: images whose sampled luminance PATTERN matches
    * (aHash Hamming ≤ maxDist) pair up, regardless of absolute
    * brightness (a constant shift moves every sample and the mean
    * together, so the bits — and the hash — are unchanged). The
    * fixture corpus genuinely clusters: documents sharing a
    * dimension class whose pixel windows don't wrap mod 256 hash
    * identically.
    *
    * Scale shape: the simhash LSH layout on a 63-bit hash — 4
    * 16-bit bands, cap-and-drop BoundedMinK buckets (an over-full
    * band is non-discriminative; no member list ever materializes),
    * pair enumeration inside surviving buckets, distinct across
    * bands, Hamming filter via two co-keyed hash joins. Decode cost
    * is one mapPartitions pass over the media bytes.
    */
  def phashPairs(spark: SparkSession, docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame = {
    val ph = pHash(spark, encodePng(spark, docs))
    val buckets = ph
      .select(col("doc_id"), col("ph"),
        explode(expr("array(0, 1, 2, 3)")).as("band"))
      .withColumn("key",
        expr("(ph div shiftleft(1L, 16 * band)) % 65536"))
      .groupBy(col("band"), col("key"))
      .agg(graft.functions.MinK.bounded_min_k(bucketCap)(col("doc_id"))
        .as("ds"))
      .filter(size(col("ds")) > 0)
    buckets
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)),
          |            y -> struct(x AS d1, y AS d2))))""".stripMargin))
        .as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
      .join(ph.select(col("doc_id").as("d1"), col("ph").as("p1")), "d1")
      .join(ph.select(col("doc_id").as("d2"), col("ph").as("p2")), "d2")
      .withColumn("dist", expr("cast(bit_count(p1 ^ p2) as int)"))
      .filter(col("dist") <= maxDist)
      .select(col("d1"), col("d2"), col("dist"))
      .orderBy(col("d1"), col("d2"))
  }

  /** Oracle: the identical hash from the closed-form fixture
    * arithmetic — dims from pngDims, samples from pixel(), the same
    * 63·g ≥ Σg bit rule, band buckets, cap, and Hamming filter.
    */
  def phashPairsSql(maxDist: Int, bucketCap: Int = 64): String =
    s"""WITH dims AS (
       |  SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
       |         CAST(3 + doc_id % 4 AS BIGINT) AS h
       |  FROM documents
       |), cells AS (
       |  SELECT doc_id, CAST(8 * i + j AS INT) AS k,
       |    (doc_id * 31 + ((i * w) // 8) * 7 + ((j * h) // 8) * 13) % 256
       |      AS g
       |  FROM dims, UNNEST(range(8)) r1(i), UNNEST(range(8)) r2(j)
       |  WHERE NOT (i = 7 AND j = 7)
       |), ph AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN 63 * g >= s
       |      THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS ph
       |  FROM (SELECT doc_id, k, g,
       |          sum(g) OVER (PARTITION BY doc_id) AS s
       |        FROM cells)
       |  GROUP BY 1
       |), buck AS (
       |  SELECT band, (ph // (CAST(1 AS BIGINT) << (16 * band))) % 65536
       |           AS key, doc_id
       |  FROM ph, UNNEST([0, 1, 2, 3]) b(band)
       |), ok AS (
       |  SELECT band, key FROM buck GROUP BY 1, 2
       |  HAVING count(*) <= $bucketCap
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM buck a
       |  JOIN ok USING (band, key)
       |  JOIN buck b ON a.band = b.band AND a.key = b.key
       |              AND a.doc_id < b.doc_id
       |)
       |SELECT p.d1, p.d2,
       |       CAST(bit_count(xor(h1.ph, h2.ph)) AS INT) AS dist
       |FROM pairs p
       |JOIN ph h1 ON h1.doc_id = p.d1
       |JOIN ph h2 ON h2.doc_id = p.d2
       |WHERE bit_count(xor(h1.ph, h2.ph)) <= $maxDist
       |ORDER BY d1, d2""".stripMargin

  /** Distributed feature extraction: one decoder instance per
    * partition (the expensive part for a real codec), streaming
    * through rows — the Spark-side shape a real multimodal pipeline
    * needs, independent of what `decode` does. Defaults to the real
    * PNG decoder; tests inject doubles through the parameter.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decode: Array[Byte] => Array[Float] = PngDecoder.decodeOne)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        // per-partition decoder setup happens once, here
        it.map { case (id, payload, w, h) =>
          MediaFeatures(id, w, h, decode(payload))
        }
      }
  }
}
