package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dot_product computes exact sums on float and double arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val got = df.select(
      dot_product(col("f"), col("d")).as("fd"),
      dot_product(col("f"), col("f")).as("ff"),
      dot_product(col("d"), col("d")).as("dd")).collect()(0)
    assert(got.getDouble(0) == 32.0)
    assert(got.getDouble(1) == 14.0)
    assert(got.getDouble(2) == 77.0)
  }

  test("dot_product matches the interpreted HOF form bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val hof = "aggregate(zip_with(embedding, embedding, (x, y) -> " +
      "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), " +
      "(acc, v) -> acc + v)"
    val diff = emb
      .select((dot_product(col("embedding"), col("embedding")) -
        expr(hof)).as("d"))
      .agg(sum(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"native vs HOF drift: $diff")
  }

  test("fused cosine matches the composed dot/(norm*norm) bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val a = emb.select(col("vec_id"), col("embedding"))
    val b = Tables.embeddings(spark, sf).limit(5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val joined = a.crossJoin(b)
    val composed = dot_product(col("embedding"), col("qe")) /
      (sqrt(dot_product(col("embedding"), col("embedding"))) *
        sqrt(dot_product(col("qe"), col("qe"))))
    val fused = graft.functions.VectorFunctions
      .cosine_similarity(col("embedding"), col("qe"))
    val drift = joined.select((composed - fused).as("d"))
      .agg(sum(abs(col("d")))).collect()(0).getDouble(0)
    assert(drift == 0.0, s"fused vs composed drift: $drift")
  }

  test("fused cosine null semantics: dim mismatch and zero vectors") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 0.0)), Some(Array(1.0, 0.0))), // cos = 1
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0, 5.0))), // mismatch
      (Some(Array(0.0, 0.0)), Some(Array(1.0, 1.0)))) // zero norm
      .toDF("a", "b")
    val rows = df.select(graft.functions.VectorFunctions
      .cosine_similarity(col("a"), col("b")).as("c")).collect()
    assert(rows(0).getDouble(0) == 1.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("dot_product null and length semantics") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))), // equal length
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0, 99.0))), // mismatch
      (None, Some(Array(1.0)))) // null input
      .toDF("a", "b")
    val rows = df.select(dot_product(col("a"), col("b")).as("d")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    // dimension mismatch is null, not a silent truncation
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("dot_product registers for SQL") {
    graft.functions.VectorFunctions.register(spark)
    val v = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }

  test("rejects non-array inputs with a clear error") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("i", "s")
    val e = intercept[Exception] {
      df.select(dot_product(col("i"), col("s"))).collect()
    }
    assert(e.getMessage.contains("dot_product") ||
      e.getMessage.toLowerCase.contains("type"))
  }
}
