package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}
import graft.operators.PitJoin

/** Semantic checks for the round-10 versioning/temporal trio: SCD2
  * interval build (x144), the point-in-time dimension-history join
  * (x145), and multi-probe LSH calibration (x146).
  */
class VersioningOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- x144: SCD2 intervals ----------------------------------------

  test("scd2: intervals are well-formed, disjoint, and change-delimited") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rows = Dedup.scd2Intervals(docs).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_.getAs[Int]("valid_from"))
      sorted.foreach { r =>
        val f = r.getAs[Int]("valid_from"); val t = r.getAs[Int]("valid_to")
        assert(f >= 0 && t <= 3 && f <= t)
        assert(r.getAs[Boolean]("is_current") == (t == 3))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getAs[Int]("valid_from") - a.getAs[Int]("valid_to")
          assert(gap >= 1, "intervals must be disjoint and ordered")
          // adjacent (gap-free) intervals only exist because content
          // changed — identical content would have merged into one
          if (gap == 1)
            assert(a.getAs[String]("content_h") !=
              b.getAs[String]("content_h"))
        case _ => ()
      }
    }
  }

  test("scd2: interval lengths cover exactly the presence rows") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val covered = Dedup.scd2Intervals(docs).collect()
      .map(r => r.getAs[Int]("valid_to") - r.getAs[Int]("valid_from") + 1L)
      .sum
    // presence slice mirrored from the operator: version v drops the
    // (hb + v) % 17 bucket
    val present = docs
      .select(col("doc_id"),
        expr(
          "cast(conv(substr(md5(cast(doc_id as string)), 1, 4), 16, 10) as int)")
          .as("hb"),
        explode(expr("sequence(0, 3)")).as("v"))
      .filter((col("hb") + col("v")) % 17 =!= 0)
      .count()
    assert(covered == present)
  }

  test("scd2 merge: incremental apply equals the from-scratch rebuild") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merged = Dedup.scd2Merge(docs, versions = 4).collect()
      .map(_.toSeq).toSet
    val rebuilt = Dedup.scd2Intervals(docs, versions = 5).collect()
      .map(_.toSeq).toSet
    assert(merged == rebuilt)
  }

  // ---- x145: point-in-time join ------------------------------------

  test("pit join: covering interval matches, bounds are [from, to)") {
    import spark.implicits._
    val hist = Seq(
      ("k1", 0.0, 10.0, "v0"),
      ("k1", 10.0, 20.0, "v1"),
      // k1 has a coverage gap [20, 30)
      ("k1", 30.0, 40.0, "v3"),
      ("k2", 0.0, 100.0, "w0"))
      .toDF("k", "valid_from", "valid_to", "attr")
    val facts = Seq(
      ("k1", 0.0),   // inclusive lower bound -> v0
      ("k1", 9.99),  // -> v0
      ("k1", 10.0),  // exclusive upper bound -> v1, not v0
      ("k1", 25.0),  // coverage gap -> dropped
      ("k1", 39.0),  // -> v3
      ("k3", 5.0))   // no history -> dropped
      .toDF("k", "t")
    val got = PitJoin.pitJoin(facts, hist, "k", "t")
      .select(col("k"), col("t"), col("attr"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
      .toSet
    assert(got == Set(
      ("k1", 0.0, "v0"), ("k1", 9.99, "v0"),
      ("k1", 10.0, "v1"), ("k1", 39.0, "v3")))
  }

  test("pit join: each fact matches at most one SCD2 interval") {
    import spark.implicits._
    val hist = Seq(
      ("k", 0.0, 5.0, "a"), ("k", 5.0, 9.0, "b"), ("k", 9.0, 12.0, "c"))
      .toDF("k", "valid_from", "valid_to", "attr")
    val facts = (0 until 12).map(i => ("k", i.toDouble)).toDF("k", "t")
    val joined = PitJoin.pitJoin(facts, hist, "k", "t")
    assert(joined.count() == 12)
    assert(joined.groupBy("t").count().filter(col("count") > 1).count() == 0)
  }

  // ---- x146: multi-probe LSH ---------------------------------------

  test("multi-probe: dominates the base probe, bounded by k, full spine") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val rows = Similarity
      .multiProbeRecall(emb, nPlanes = 8, dim = 64, nQueries = 8, k = 10)
      .collect()
    assert(rows.length == 8, "every query reports, even with no candidates")
    rows.foreach { r =>
      val cb = r.getAs[Long]("cand_base"); val cm = r.getAs[Long]("cand_multi")
      val hb = r.getAs[Long]("hits_base"); val hm = r.getAs[Long]("hits_multi")
      assert(cm >= cb, "multi-probe candidates contain the base bucket")
      assert(hm >= hb, "recall can only grow with more probes")
      assert(hb <= 10 && hm <= 10)
      assert(hb <= cb && hm <= cm)
    }
  }

  test("multi-probe: one plane means base bucket plus its complement") {
    import spark.implicits._
    // with nPlanes = 1 the probe set {b, b^1} covers BOTH buckets, so
    // cand_multi must equal corpus-1 and hits_multi must equal k
    // (for any query) while cand_base counts only the query's side
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(64)
    val n = emb.count()
    val rows = Similarity
      .multiProbeRecall(emb, nPlanes = 1, dim = 64, nQueries = 2, k = 5)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("cand_multi") == n - 1)
      assert(r.getAs[Long]("hits_multi") == 5L)
    }
  }
}
