package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.dot_product

/** Similarity search over the `embeddings` table (SURVEY.md §2.9 X2):
  * brute-force cosine top-k as the exactness baseline, and
  * random-hyperplane LSH bucketing as the sublinear scale path.
  *
  * All vector math is `zip_with`/`aggregate` on array columns cast to
  * double (codegen'd Catalyst expressions — no UDF), so the same
  * arithmetic is expressible in the DuckDB oracle.
  */
object Similarity {

  /** Brute-force cosine top-k: query vectors (vec_id < nQueries)
    * against the full table. The query side is tiny → broadcast; the
    * scan side streams. At 100 TB this is one broadcast-join pass —
    * the correct exact baseline. Ties broken by rounded cosine then
    * vec_id so ranking is deterministic across engines.
    */
  def cosineTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // graft.functions.DotProduct: codegen'd primitive loop (the HOF
    // zip_with/aggregate form is interpreted per element)
    val pairs = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("dot", dot_product(col("embedding"), col("qe")))
      .withColumn("na", dot_product(col("embedding"), col("embedding")))
      .withColumn("nb", dot_product(col("qe"), col("qe")))
      .withColumn("cos",
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6))
    pairs
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
      .orderBy(col("qid"), col("rank"))
  }

  def cosineTopKSql(nQueries: Int, k: Int): String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id < $nQueries
       |), prods AS (
       |  SELECT q.qid, e.vec_id,
       |         sum(CAST(e.embedding[i+1] AS DOUBLE)
       |             * CAST(q.qe[i+1] AS DOUBLE)) AS dot,
       |         sum(CAST(e.embedding[i+1] AS DOUBLE)
       |             * CAST(e.embedding[i+1] AS DOUBLE)) AS na,
       |         sum(CAST(q.qe[i+1] AS DOUBLE)
       |             * CAST(q.qe[i+1] AS DOUBLE)) AS nb
       |  FROM embeddings e
       |  CROSS JOIN q,
       |       UNNEST(range(len(e.embedding))) AS r(i)
       |  WHERE e.vec_id <> q.qid
       |  GROUP BY 1, 2
       |), scored AS (
       |  SELECT qid, vec_id, round(dot / (sqrt(na) * sqrt(nb)), 6) AS cos
       |  FROM prods
       |), ranked AS (
       |  SELECT qid, vec_id, cos,
       |         row_number() OVER (PARTITION BY qid
       |           ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored
       |)
       |SELECT qid, rank, vec_id, cos FROM ranked WHERE rank <= $k
       |ORDER BY qid, rank""".stripMargin

  /** Deterministic pseudo-random hyperplanes (fixed seed) shared by
    * the Spark plan and the generated oracle SQL as literal arrays.
    */
  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(20260812L)
    Array.fill(nPlanes, dim)(rnd.nextDouble() * 2.0 - 1.0)
  }

  /** Random-hyperplane LSH: bucket id = sign-bit string of the dot
    * products with `nPlanes` fixed hyperplanes. Same-bucket vectors
    * are ANN candidates; this is the sublinear scale path (bucket
    * join instead of all-pairs).
    */
  def lshBuckets(emb: DataFrame, nPlanes: Int, dim: Int): DataFrame = {
    val ps = planes(nPlanes, dim)
    val bitCols = ps.zipWithIndex.map { case (p, j) =>
      val plane: Column = array(p.map(lit): _*)
      when(dot_product(col("embedding"), plane) >= 0, lit(1 << j))
        .otherwise(lit(0))
    }
    emb.select(col("vec_id"), bitCols.reduce(_ + _).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("vec_id")).as("v_min"),
        max(col("vec_id")).as("v_max"))
      .orderBy(col("bucket"))
  }

  def lshBucketsSql(nPlanes: Int, dim: Int): String = {
    val ps = planes(nPlanes, dim)
    val bitTerms = ps.zipWithIndex.map { case (p, j) =>
      val litArr = p.map(v => s"CAST('$v' AS DOUBLE)")
        .mkString("[", ", ", "]")
      s"""CASE WHEN list_dot_product(
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)),
         |  $litArr) >= 0 THEN ${1 << j} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""WITH b AS (SELECT vec_id, $bitTerms AS bucket FROM embeddings)
       |SELECT bucket, count(*) AS n, min(vec_id) AS v_min,
       |       max(vec_id) AS v_max
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  }
}
