package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tools.PlanAudit

/** The bounded-broadcast certificate must accept every hint shape the
  * engine actually uses and reject the evasions — an unbounded
  * relation does not become broadcastable by touching a bounded
  * fragment somewhere in its subtree.
  */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  private def analyzed(df: DataFrame) = df.queryExecution.analyzed
  private def corpus = Tables.documents(spark, sf)

  test("accepts the engine's bounded hint shapes") {
    // literal id prefix (query/seed/benchmark sides)
    assert(PlanAudit.provablyBounded(analyzed(
      corpus.filter(col("doc_id") < 5))))
    // conjunct with a bound among other predicates
    assert(PlanAudit.provablyBounded(analyzed(
      corpus.filter(col("doc_id") < 5 && col("lang") === "en"))))
    // scalar aggregate; explicit limit; literal range
    assert(PlanAudit.provablyBounded(analyzed(
      corpus.agg(count(lit(1))))))
    assert(PlanAudit.provablyBounded(analyzed(corpus.limit(3))))
    assert(PlanAudit.provablyBounded(analyzed(
      spark.range(32).toDF("__tgt"))))
    // aggregate keyed on an internal bucket column
    assert(PlanAudit.provablyBounded(analyzed(
      corpus.withColumn("__bucket", col("doc_id") % 4)
        .groupBy(col("__bucket")).count())))
    // OrderedRank's quantile-bucket id: 0 + Σ when(key > bound, 1, 0)
    // has integer range [0, #bounds] — certified by range analysis
    assert(PlanAudit.provablyBounded(analyzed(
      corpus.withColumn("__bucket",
        Seq(10.0, 20.0, 30.0).foldLeft(lit(0)) { (acc, b) =>
          acc + when(col("n_chars") > lit(b), 1).otherwise(0)
        })
        .groupBy(col("__bucket")).count())))
    // filter ABOVE an explode (benchmark n-gram side)
    assert(PlanAudit.provablyBounded(analyzed(
      corpus.select(col("doc_id"), explode(split(col("text"), " ")).as("g"))
        .filter(col("doc_id") < 5))))
    // STRUCTURAL certificate: grouping on a modulo-by-literal key is
    // bounded by the divisor regardless of the column's name
    assert(PlanAudit.provablyBounded(analyzed(
      corpus.withColumn("shard", col("doc_id") % 8)
        .groupBy(col("shard")).count())))
  }

  test("modulo certificate demands a literal divisor") {
    // modulo by another column can have corpus cardinality
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.withColumn("shard", col("doc_id") % col("n_chars"))
        .groupBy(col("shard")).count())))
    // Union reuses the FIRST child's exprIds: a modulo alias in one
    // branch proves nothing about the other branches' values, so the
    // certificate must refuse through any Union
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.select((col("doc_id") % 8).as("k"))
        .union(corpus.select(col("doc_id").as("k")))
        .groupBy(col("k")).count())))
    // the __ prefix alone certifies NOTHING: a plain rename of an
    // unbounded corpus key must be rejected (the name rule is gone —
    // only the structural range certificate counts)
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.withColumn("__k", col("doc_id"))
        .groupBy(col("__k")).count())))
    // a modulo by a HUGE literal is structurally a modulo but
    // practically unbounded — the divisor magnitude is part of the
    // certificate
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.withColumn("shard", col("doc_id") % 1000000000L)
        .groupBy(col("shard")).count())))
  }

  test("rejects unbounded relations dressed with bounded fragments") {
    // per-key aggregate over the corpus (the r3 jaccard `sizes` bug)
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.groupBy(col("doc_id")).count())))
    // corpus joined against a bounded side is still O(corpus)
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.join(corpus.limit(5).select(col("doc_id").as("d2")),
        col("doc_id") === col("d2")))))
    // a bound inside an OR is no bound
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.filter(col("doc_id") < 5 || col("n_chars") > 0))))
    // explode ABOVE the bound can expand without limit
    assert(!PlanAudit.provablyBounded(analyzed(
      corpus.filter(col("doc_id") < 5)
        .select(explode(split(col("text"), " ")).as("g"))
        .groupBy(col("g")).count()
        .withColumnRenamed("g", "w").groupBy(col("w")).count()
        .select(col("w")))))
    // plain corpus scan
    assert(!PlanAudit.provablyBounded(analyzed(corpus.select(col("doc_id")))))
  }

  test("a LocalRelation (driver-collected model frame) is bounded") {
    import spark.implicits._
    val local = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(PlanAudit.provablyBounded(analyzed(local)))
  }

  test("q22's scalar subquery carries the 1-row structural " +
      "certificate — not an allow-list entry") {
    val certs = PlanAudit.joinCertificates(analyzed(
      SparkEntry.queries("q22_scalar_subquery")(spark, sf)))
    assert(certs.contains("scalar-subquery-1row"), certs.toString)
    assert(!certs.contains("UNCERTIFIED-CROSS"), certs.toString)
  }

  test("q23's correlated average certifies as a co-partitioned " +
      "aggregate join (both sides shuffle on l_partkey)") {
    val certs = PlanAudit.joinCertificates(analyzed(
      SparkEntry.queries("q23_corr_avg")(spark, sf)))
    assert(certs.contains("copartitioned-agg-join"), certs.toString)
    assert(!certs.contains("UNCERTIFIED-CROSS"), certs.toString)
  }

  test("a cross join with no bounded side is UNCERTIFIED at any sf") {
    val certs = PlanAudit.joinCertificates(analyzed(
      corpus.crossJoin(corpus.select(col("doc_id").as("d2")))))
    assert(certs.contains("UNCERTIFIED-CROSS"), certs.toString)
  }
}
