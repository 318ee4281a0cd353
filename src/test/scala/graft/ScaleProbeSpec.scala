package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, LanguageModel}
import graft.tools.PlanAudit

/** Systematic 10× scale probes for the cost tier (VERDICT r9 #2):
  * the 10 slowest declared queries, each run as its OPERATOR on a
  * synthetic corpus at n and 10n. Two assertions per probe:
  *
  *  1. wall time grows ≤ ~linearly (generous 25× bound on a 10× input
  *     — anything super-linear (pair explosion, quadratic join) blows
  *     far past it, while scheduler noise stays well inside);
  *  2. the analyzed plan stays PlanAudit-certified — no unbounded
  *     broadcast hints, no uncertified cross join — at the LARGE
  *     size, where a data-dependent plan would degrade.
  *
  * The corpus plants exact-duplicate structure (every 17th doc copies
  * its predecessor) so the dedup machinery does real work; the vocab
  * is a 500-token space so non-planted trigram collisions stay rare
  * (candidate generation must stay linear, not lucky-empty).
  */
class ScaleProbeSpec extends AnyFunSuite {
  import SparkTestSession._

  private val N1 = 2000L
  private val N10 = 20000L
  // generous: 10× data, 2.5× slack for fixed costs + noise. A probe
  // that goes quadratic lands at ~100×.
  private val MaxRatio = 25.0
  private val FloorSec = 8.0 // below this, ratios are all noise

  private def corpus(n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 39),
        |  j -> concat('w', pmod(hash((CASE WHEN id % 17 = 1
        |    THEN id - 1 ELSE id END) * 40 + j), 500))))""".stripMargin)
        .as("text"),
      lit("en").as("lang"),
      concat(lit("s"), pmod(hash(col("id")), lit(4))).as("source"))
      .withColumn("n_chars", length(col("text")))

  private def vectors(n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(0, 63), j ->
        |  cast(pmod(hash((CASE WHEN id % 17 = 1
        |    THEN id - 1 ELSE id END) * 64 + j), 1000) as float)
        |  / cast(1000.0 as float))""".stripMargin).as("embedding"),
      concat(lit("l"), pmod(hash(col("id") * 7L), lit(5)))
        .as("label"))

  private def runTimed(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def probe(name: String, build: Long => DataFrame): Unit = {
    val big = build(N10)
    // plan certification at the LARGE size
    val analyzed = big.queryExecution.analyzed
    assert(PlanAudit.unboundedBroadcasts(analyzed).isEmpty,
      s"$name: unbounded broadcast hint at 10×")
    assert(!PlanAudit.joinCertificates(analyzed)
      .contains("UNCERTIFIED-CROSS"),
      s"$name: uncertified cross join at 10×")
    runTimed(build(N1)) // warm: JIT + codegen cache
    val t1 = runTimed(build(N1))
    val t10 = runTimed(big)
    info(f"$name%-22s n=$N1%d: $t1%6.2f s   n=$N10%d: $t10%6.2f s" +
      f"   ratio ${t10 / t1}%5.1f×")
    assert(t10 <= math.max(t1 * MaxRatio, FloorSec),
      f"$name: $t1%.2f s → $t10%.2f s on 10× data " +
        f"(${t10 / t1}%.1f× > $MaxRatio×) — super-linear growth")
  }

  test("x131 incremental fuzzy dedup stays linear at 10×") {
    probe("x131_incr_fuzzy", n =>
      Dedup.incrementalFuzzyDedup(corpus(n), newMod = 5, maxDist = 3))
  }

  test("x87 minhash calibration stays linear at 10×") {
    probe("x87_minhash_est", n =>
      Dedup.minhashEstimate(corpus(n), perms = 128, dfCap = 10,
        threshold = 0.5))
  }

  test("x51 perplexity buckets stay linear at 10×") {
    probe("x51_ppl_buckets", n =>
      LanguageModel.perplexityBuckets(corpus(n)))
  }

  test("x33 connected components stay linear at 10×") {
    probe("x33_dedup_clusters", { n =>
      val docs = corpus(n)
      Dedup.connectedComponents(docs.select(col("doc_id")),
        Dedup.simhashNearDup(docs, maxDist = 3)
          .select(col("d1"), col("d2")))
    })
  }

  test("x117 signal correlation stays linear at 10×") {
    probe("x117_signal_corr", n =>
      LanguageModel.signalCorrelation(corpus(n)))
  }

  test("x106 cross-modal consensus stays linear at 10×") {
    probe("x106_cross_modal", n =>
      Dedup.crossModalNearDup(corpus(n), vectors(n), dfCap = 10,
        thetaText = 0.5, bands = 4, planesPerBand = 6, dim = 64,
        thetaEmbed = 0.4))
  }

  test("x118 cluster histogram stays linear at 10×") {
    probe("x118_cluster_hist", n =>
      Dedup.clusterSizeHistogram(corpus(n), maxDist = 3))
  }

  test("x116 lsh planner stays linear at 10×") {
    probe("x116_lsh_planner", n =>
      Dedup.lshPlanner(corpus(n), dfCap = 10, threshold = 0.2,
        dupTheta = 0.8))
  }

  test("x90 leakage audit stays linear at 10×") {
    probe("x90_leakage_audit", n =>
      Dedup.leakageAudit(corpus(n), maxDist = 3))
  }

  test("x48 cluster representatives stay linear at 10×") {
    probe("x48_cluster_reps", n =>
      Dedup.clusterRepresentatives(corpus(n), maxDist = 3))
  }

  test("x141 planner-driven minhash stays linear at 10×") {
    probe("x141_planned_minhash", n =>
      Dedup.plannedMinhash(corpus(n), dfCap = 10, threshold = 0.2,
        dupTheta = 0.8))
  }

  test("x143 soft-dedup weights stay linear at 10×") {
    probe("x143_soft_dedup", n =>
      Dedup.softDedupWeights(corpus(n), maxDist = 3))
  }

  test("x147 scd2 merge stays linear at 10×") {
    probe("x147_scd2_merge", n => Dedup.scd2Merge(corpus(n)))
  }

  /** Like [[probe]], but the BUILD runs inside the timer: the graph /
    * power-iteration operators pin every round eagerly (Materialize),
    * so their real cost lands at plan-construction time — timing only
    * the final noop write would measure a cache read.
    */
  private def probeBuilt(name: String, build: Long => DataFrame): Unit = {
    val analyzed = build(N10).queryExecution.analyzed
    assert(PlanAudit.unboundedBroadcasts(analyzed).isEmpty,
      s"$name: unbounded broadcast hint at 10×")
    assert(!PlanAudit.joinCertificates(analyzed)
      .contains("UNCERTIFIED-CROSS"),
      s"$name: uncertified cross join at 10×")
    def runAll(n: Long): Double = {
      val t0 = System.nanoTime()
      build(n).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runAll(N1) // warm: JIT + codegen cache
    val t1 = runAll(N1)
    val t10 = runAll(N10)
    info(f"$name%-22s n=$N1%d: $t1%6.2f s   n=$N10%d: $t10%6.2f s" +
      f"   ratio ${t10 / t1}%5.1f×")
    assert(t10 <= math.max(t1 * MaxRatio, FloorSec),
      f"$name: $t1%.2f s → $t10%.2f s on 10× data " +
        f"(${t10 / t1}%.1f× > $MaxRatio×) — super-linear growth")
  }

  test("x151 pagerank stays linear at 10× (iterative joins, pinned " +
    "lineage)") {
    probeBuilt("x151_pagerank", n =>
      graft.llm.GraphRank.pagerank(corpus(n), dfCap = 10,
        threshold = 0.02, iters = 3))
  }

  test("x155 triangle counting stays linear at 10× (degree " +
    "orientation bounds the wedge join)") {
    probeBuilt("x155_triangles", n =>
      graft.llm.GraphRank.triangles(corpus(n), dfCap = 10,
        threshold = 0.02))
  }

  test("x159 top-component removal stays linear at 10× (matvec " +
    "passes, no Gram matrix)") {
    probeBuilt("x159_top_removal", n =>
      graft.llm.Similarity.topRemoval(vectors(n), iters = 3,
        iters2 = 2))
  }
}
