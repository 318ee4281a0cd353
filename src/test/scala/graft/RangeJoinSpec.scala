package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.llm.Sampling

class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("point-in-interval equals the brute-force theta join") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val points = Seq.tabulate(500)(i => (i.toLong, rnd.nextDouble() * 1000))
      .toDF("pid", "t")
    val intervals = Seq.tabulate(40) { j =>
      val s = rnd.nextDouble() * 950
      (j.toLong, s, s + rnd.nextDouble() * 120) // spans 0–120 units
    }.toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals,
      col("t"), col("s"), col("e"), width = 50.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("interval endpoints are inclusive and bucket edges are safe") {
    import spark.implicits._
    // points exactly on interval ends and on bucket boundaries
    val points = Seq((1L, 100.0), (2L, 150.0), (3L, 200.0), (4L, 99.999),
      (5L, 200.001)).toDF("pid", "t")
    val intervals = Seq((7L, 100.0, 200.0)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals,
      col("t"), col("s"), col("e"), width = 100.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("no nested-loop join in the plan") {
    import spark.implicits._
    val points = Seq((1L, 5.0)).toDF("pid", "t")
    val intervals = Seq((1L, 0.0, 10.0)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, intervals,
      col("t"), col("s"), col("e"), width = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("weighted sample is deterministic and weight-monotone") {
    import spark.implicits._
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, "en", if (i == 42) 1000000 else 10 + i % 7))
      .toDF("doc_id", "lang", "n_chars")
    val pick = Sampling.weightedSample(docs, "cast(doc_id as string)",
      "n_chars", k = 20, tieBreak = "doc_id")
      .select("doc_id").as[Long].collect().toSet
    // same run twice → identical set (no RNG)
    val pick2 = Sampling.weightedSample(docs, "cast(doc_id as string)",
      "n_chars", k = 20, tieBreak = "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(pick == pick2)
    assert(pick.size == 20)
    // a 1e6-weight doc among 10–16-weight docs is effectively certain:
    // its key ln(u)/w is > ln(u_min)/1e6 ≈ −1.2e-5, while light docs
    // need u > exp(−2e-4) ≈ 0.9998 to beat it — none of 199 hashes do
    assert(pick.contains(42L))
  }
}
