package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, EventsAnalytics, HeavyHitters, TextAnalysis}

/** Semantic checks for the round-6 sketch/analysis additions:
  * Count–Min estimates, n-gram containment, z-score anomalies, the
  * Zipf curve, and source vocabulary overlap — each on a hand corpus
  * with closed-form expected values.
  */
class SketchOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("count-min rejects widths the 16-bit cell hash cannot reach") {
    new graft.functions.CountMin(3, 65536) // max reachable: fine
    intercept[IllegalArgumentException] {
      new graft.functions.CountMin(3, 65537)
    }
    intercept[IllegalArgumentException] {
      new graft.functions.CountMin(0, 1024)
    }
  }

  test("count-min: est >= exact always; exact when cells don't collide") {
    import spark.implicits._
    // doc 0 is the probe document (its distinct words are the query
    // set); words chosen so CountMin.cell maps them to distinct cells
    // at width 1024 (asserted below, not assumed)
    val words = Seq("alpha", "beta", "gamma")
    val depth = 3
    val wide = 1024
    for (j <- 0 until depth) {
      val cells = words.map(w => graft.functions.CountMin.cell(j, w, wide))
      assert(cells.distinct.length == words.length,
        s"test words collide at row $j — pick different words")
    }
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha alpha beta"),
      (2L, "alpha noise more noise")).toDF("doc_id", "text")
    val wideRes = HeavyHitters.cmEstimates(docs, depth, wide)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("est"), r.getAs[Long]("cnt")))).toMap
    assert(wideRes.keySet == Set("alpha", "beta", "gamma"))
    // no collisions at width 1024 for these words -> est is exact
    assert(wideRes("alpha") == ((4L, 4L)))
    assert(wideRes("beta") == ((2L, 2L)))
    assert(wideRes("gamma") == ((1L, 1L)))
    // width 2 forces collisions: the CMS guarantee est >= cnt must
    // hold on every row, and at least one probe genuinely overcounts
    val tight = HeavyHitters.cmEstimates(docs, depth, width = 2).collect()
    assert(tight.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("cnt")))
    assert(tight.exists(r => r.getAs[Long]("overcount") > 0L),
      "width=2 over a 6-type vocab should collide somewhere")
  }

  test("count-min: sketch is partitioning-invariant (elementwise-sum merge)") {
    import spark.implicits._
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"w${i % 7} w${i % 3} shared")).toDF("doc_id", "text")
    def run(parts: Int) =
      HeavyHitters.cmEstimates(docs.repartition(parts), depth = 3, width = 8)
        .collect().map(_.toSeq).toSeq
    assert(run(1) == run(7))
  }

  test("containment: embedded doc scores 1.0 forward, Jaccard-low backward") {
    import spark.implicits._
    // doc 1's three 3-shingles all occur in doc 2 (6 shingles):
    // containment 1->2 = 3/3, 2->1 = 3/6
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, dfCap = 10, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("sz_a"),
          r.getAs[Double]("containment"))).toMap
    assert(rows.keySet == Set((1L, 2L), (2L, 1L)))
    assert(rows((1L, 2L)) == ((3L, 3L, 1.0)))
    assert(rows((2L, 1L)) == ((3L, 6L, 0.5)))
  }

  test("containment: direction below threshold is dropped") {
    import spark.implicits._
    // doc 2 is long enough that 3/|grams(2)| < 0.3 while 1->2 stays 1.0
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, dfCap = 10, threshold = 0.6)
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("a") == 1L && rows(0).getAs[Long]("b") == 2L)
  }

  test("z-score anomalies: closed-form z on a planted outlier") {
    import spark.implicits._
    // ten 1.00s and one 100.00: mean100=1000, population sd100 =
    // sqrt(8_100_000) -> outlier z = 9000/sd = sqrt(10) = 3.16228
    val ev = (1 to 10).map(i => (i.toLong, "t", 1.00)) :+ (11L, "t", 100.00)
    val df = ev.toDF("event_id", "event_type", "value")
    val rows = EventsAnalytics.anomalies(df, z = 3.0).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("event_id") == 11L)
    assert(rows(0).getAs[Long]("z4") == 31623L) // round(sqrt(10)*1e4)
  }

  test("zipf curve: ranks by count desc then token, cumulates to 1e6") {
    import spark.implicits._
    val docs = Seq((1L, "b b b a a c")).toDF("doc_id", "text")
    val rows = TextAnalysis.zipfCurve(docs).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("w"),
        r.getAs[Long]("cnt"), r.getAs[Long]("cum_frac6")))
    assert(rows.toSeq == Seq(
      (1L, "b", 3L, 500000L),
      (2L, "a", 2L, 833333L),
      (3L, "c", 1L, 1000000L)))
  }

  test("source overlap: Jaccard over distinct-token sets, zero pairs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "s1"),
      (2L, "b c d", "s2"),
      (3L, "x", "s3"),
      (4L, "c b", "s2") // duplicates within a source must not inflate
    ).toDF("doc_id", "text", "source")
    val rows = TextAnalysis.sourceOverlap(docs).collect()
    assert(rows.length == 1) // s3 shares nothing -> no s3 rows
    val r = rows(0)
    assert(r.getAs[String]("s1") == "s1" && r.getAs[String]("s2") == "s2")
    assert(r.getAs[Long]("inter") == 2L && r.getAs[Long]("sz1") == 3L &&
      r.getAs[Long]("sz2") == 3L)
    assert(r.getAs[Double]("jaccard") == 0.5)
  }

  test("psi drift: a skewed source trips 'shifted', matching sources " +
    "stay stable, missing buckets penalize finitely") {
    import spark.implicits._
    // s0/s1 carry the corpus-typical mix and dominate the corpus
    // baseline; s2 is one small all-'zonly' doc — its distribution
    // has diverged from the (mostly-typical) corpus and must trip
    // the 0.25 threshold with a finite psi even though it misses
    // every top bucket
    val typical = (0 until 10).map(i => s"w$i").mkString(" ")
    val docs = ((0 until 10).map(i => (i.toLong, typical, "s0")) ++
      (10 until 20).map(i => (i.toLong, typical, "s1")) :+
      ((20L, Seq.fill(10)("zonly").mkString(" "), "s2")))
      .toDF("doc_id", "text", "source")
    val r = graft.llm.TextAnalysis.psiDrift(docs, v = 8).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Double]("psi"), x.getAs[String]("verdict")))).toMap
    assert(r("s0")._2 == "stable" && r("s0")._1 < 0.1)
    assert(r("s1")._2 == "stable")
    assert(r("s2")._2 == "shifted" && r("s2")._1 > 0.25)
    assert(!r("s2")._1.isInfinite && !r("s2")._1.isNaN)
    // s0 and s1 are identical mixes: identical psi
    assert(r("s0")._1 == r("s1")._1)
  }

  test("minhash estimate: exact on identical docs, 3-sigma on " +
    "half-overlap") {
    import spark.implicits._
    val a = (0 until 40).map(i => s"w$i").mkString(" ")
    // doc 2 shares the first 20 tokens' shingles with doc 0/1:
    // J(0,2) ~ 18/58 of the 38-shingle sets
    val b = ((0 until 20).map(i => s"w$i") ++
      (0 until 20).map(i => s"z$i")).mkString(" ")
    val docs = Seq((0L, a), (1L, a), (2L, b)).toDF("doc_id", "text")
    val rows = graft.llm.Dedup
      .minhashEstimate(docs, perms = 128, dfCap = 10, threshold = 0.2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("exact_jac"), r.getAs[Double]("est_jac"),
          r.getAs[Double]("abs_err")))).toMap
    val (e01, s01, err01) = rows((0L, 1L))
    assert(e01 == 1.0 && s01 == 1.0 && err01 == 0.0)
    val (e02, _, err02) = rows((0L, 2L))
    assert(e02 > 0.2 && e02 < 0.5)
    // sigma = sqrt(J(1-J)/128) ~ 0.04; 3 sigma + rounding slack
    assert(err02 < 0.15, s"err=$err02")
  }

  test("hll: estimate within the m=256 error envelope on 5k distincts") {
    import spark.implicits._
    // 5000 distinct tokens spread over 50 docs — far past the
    // linear-counting cutover (2.5m = 640), so this exercises the
    // raw harmonic-mean branch
    val docs = (0 until 50).map { d =>
      (d.toLong, (0 until 100).map(i => s"tok${d * 100 + i}")
        .mkString(" "), "s0")
    }.toDF("doc_id", "text", "source")
    val r = graft.llm.Hll.hllDistinct(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("s0").getAs[Long]("exact_distinct") == 5000L)
    // standard error 1.04/sqrt(256) = 6.5%; 3 sigma ~ 20%
    assert(r("s0").getAs[Double]("rel_err") < 0.2)
    assert(r("s0").getAs[Long]("zeros") == 0L)
    // the merged row sketches the identical token set
    assert(r("ALL").getAs[Double]("hll_est") ==
      r("s0").getAs[Double]("hll_est"))
  }

  test("hll: merged row estimates the union of disjoint source vocabs") {
    import spark.implicits._
    val docs = Seq(
      (0L, (0 until 2000).map(i => s"a$i").mkString(" "), "sa"),
      (1L, (0 until 2000).map(i => s"b$i").mkString(" "), "sb"))
      .toDF("doc_id", "text", "source")
    val r = graft.llm.Hll.hllDistinct(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("ALL").getAs[Long]("exact_distinct") == 4000L)
    // merged registers must see all 4000, not either side's 2000
    val est = r("ALL").getAs[Double]("hll_est")
    assert(est > 3200 && est < 4800)
    assert(r("ALL").getAs[Double]("rel_err") < 0.2)
  }
}
