package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextAnalysis}

/** Degenerate-input hardening: the harness documents are well-formed,
  * but a real corpus has empty strings, single tokens, repeated
  * whitespace, and non-ASCII — none of these may crash an operator
  * or produce absurd values.
  */
class EdgeCaseSpec extends AnyFunSuite {
  import SparkTestSession._

  private def weirdDocs = {
    import spark.implicits._
    Seq(
      (1L, ""),                       // empty
      (2L, "solo"),                   // single token (no shingles)
      (3L, "two words"),              // below shingle width
      (4L, "a  b   c"),               // repeated whitespace
      (5L, "naïve café 模型 тест"),   // non-ASCII
      (6L, "x y z x y z x y z"))      // heavy repetition
      .toDF("doc_id", "text")
  }

  test("shingles drop sub-width docs and never crash") {
    val sh = Dedup.shingles(weirdDocs).collect()
    val ids = sh.map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && !ids.contains(3L))
    assert(ids.contains(6L))
  }

  test("exact groups, simhash, fingerprint handle degenerate docs") {
    assert(Dedup.exactGroups(weirdDocs).count() == 6) // all distinct
    val sh = Dedup.simhash(weirdDocs).collect()
    assert(sh.length == 6)
    sh.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 16)))
    assert(TextAnalysis.fingerprint(weirdDocs).count() == 6)
  }

  test("minhash and jaccard on degenerate docs return no spurious pairs") {
    assert(Dedup.minhashBuckets(weirdDocs, 4)
      .filter(col("n_docs") > 1).count() == 0)
    assert(Dedup.jaccardPairs(weirdDocs, 10, 0.2).count() == 0)
  }

  test("text analysis produces finite values on degenerate docs") {
    val q = TextAnalysis.quality(weirdDocs).collect()
    assert(q.length == 6)
    q.foreach { r =>
      assert(r.getInt(1) >= 1) // split("") yields [""] → 1 token
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
    }
    val lid = TextAnalysis.langId(weirdDocs).collect()
    assert(lid.forall(r => !r.getDouble(1).isNaN)) // no lang col here
    val ng = TextAnalysis.langIdNgram(weirdDocs).collect()
    assert(ng.length == 6)
    val ts = TextAnalysis.tokenStats(weirdDocs).collect()
    assert(ts.forall(_.getLong(2) >= 0))
  }
}
