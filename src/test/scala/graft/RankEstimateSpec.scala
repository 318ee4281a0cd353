package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Diagnostics, EventsAnalytics, GraphRank, HeavyHitters, Similarity}

/** Semantic checks for the round-10 rank/estimation additions:
  * PageRank over the near-dup graph (x151), sketch join-size
  * estimation (x152), cross-source quantile normalization (x153),
  * and the power-iteration top component (x154) — each on a hand
  * corpus with closed-form expected structure.
  */
class RankEstimateSpec extends AnyFunSuite {
  import SparkTestSession._

  private val S = 1000000000000L

  test("pagerank: star graph ranks the hub above symmetric spokes; " +
    "mass stays within deterministic floor losses") {
    import spark.implicits._
    // hub shares a distinct trigram block with each spoke; spokes
    // share nothing with each other -> a 4-node star
    val docs = Seq(
      (0L, "w1 w2 w3 s1 s2 s3 t1 t2 t3"),
      (1L, "w1 w2 w3 p1 q1 r1"),
      (2L, "s1 s2 s3 p2 q2 r2"),
      (3L, "t1 t2 t3 p3 q3 r3")).toDF("doc_id", "text")
    val pr = GraphRank.pagerank(docs, dfCap = 10, threshold = 0.01,
      iters = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.keySet == Set(0L, 1L, 2L, 3L))
    // spokes are symmetric -> identical rank; hub strictly above
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L))
    assert(pr(0L) > pr(1L))
    // total mass: each of the 3 iterations loses < N units to the
    // contribution floor + < N to the combine floor, plus N at init
    val total = pr.values.sum
    assert(total <= S && total >= S - 100)
  }

  test("pagerank: two disconnected symmetric pairs rank identically") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a1 a2 a3 x x x"),
      (11L, "a1 a2 a3 y y y"),
      (20L, "b1 b2 b3 z z z"),
      (21L, "b1 b2 b3 w w w")).toDF("doc_id", "text")
    val pr = GraphRank.pagerank(docs, dfCap = 10, threshold = 0.01,
      iters = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.values.toSet.size == 1, s"symmetric nodes diverged: $pr")
  }

  test("join size estimate: est >= exact per row; exact without collisions") {
    import spark.implicits._
    val a = Seq("1", "1", "2", "3").toDF("k")
    val b = Seq("1", "2", "2", "4").toDF("k")
    // exact join size: key 1 -> 2*1, key 2 -> 1*2, total 4
    val wide = HeavyHitters.joinSizeEstimate(a, b, depth = 3, width = 1024)
      .collect()
    assert(wide.length == 3)
    wide.foreach { r =>
      assert(r.getAs[Long]("exact") == 4L)
      assert(r.getAs[Long]("est") >= 4L)
    }
    // 4 distinct keys at width 1024: collisions are possible in
    // principle but the min over rows is what the estimator reports —
    // at least one row must be exact here (verified: no collisions)
    assert(wide.map(_.getAs[Long]("est")).min == 4L)
    // width 1 collapses everything into one cell: est per row is
    // |a|*|b| = 16, the degenerate upper bound
    val narrow = HeavyHitters.joinSizeEstimate(a, b, depth = 2, width = 1)
      .collect()
    assert(narrow.forall(_.getAs[Long]("est") == 16L))
  }

  test("join size estimate: an empty side yields an empty report") {
    import spark.implicits._
    val a = Seq.empty[String].toDF("k")
    val b = Seq("1", "2").toDF("k")
    assert(HeavyHitters.joinSizeEstimate(a, b, 3, 64).isEmpty)
  }

  test("quantile normalization maps within-source ranks onto the " +
    "global distribution; singleton sources take the global median") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "B", 100L)).toDF("doc_id", "source", "n_chars")
    val out = Diagnostics.quantileNormalize(docs)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("norm_score")).toMap
    // global sorted scores: 10, 20, 30, 100 (N = 4)
    // A(r=1,ns=3) -> g = 1 + 0*3 div 2 = 1 -> 10
    // A(r=2)      -> g = 1 + 1*3 div 2 = 2 -> 20
    // A(r=3)      -> g = 1 + 2*3 div 2 = 4 -> 100
    // B singleton -> g = (4+1) div 2 = 2   -> 20
    assert(out == Map(1L -> 10L, 2L -> 20L, 3L -> 100L, 4L -> 20L))
  }

  test("top component recovers a pure axis exactly: unit direction " +
    "and share_bp = 10000") {
    import spark.implicits._
    // every vector lies on dim 5 of an 8-dim space
    val emb = (0 until 6).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j == 5) 0.1 * (i + 1) else 0.0))
    }.toDF("vec_id", "embedding")
    val out = Similarity.topComponent(emb, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 8)
    out.foreach { case (j, v, share) =>
      assert(v == (if (j == 5) 1000000L else 0L), s"dim $j -> $v")
      assert(share == 10000L)
    }
  }

  test("top component picks the dominant of two axes; share < 10000") {
    import spark.implicits._
    val rows =
      (0 until 8).map(i => (i.toLong,
        Array.tabulate(4)(j => if (j == 0) 0.4 else 0.0))) ++
      (8 until 12).map(i => (i.toLong,
        Array.tabulate(4)(j => if (j == 1) 0.1 else 0.0)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.topComponent(emb, iters = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val byDim = out.map(t => t._1 -> t._2).toMap
    assert(byDim(0) == 1000000L)
    assert(math.abs(byDim(1)) < 1000000L)
    // trace = 8*0.16 + 4*0.01 = 1.32; top eigenvalue = 1.28
    // share = floor(1.28/1.32 * 10000) with exact integer moments
    val share = out.head._3
    assert(share > 9000L && share < 10000L, s"share_bp = $share")
  }

  test("triangles: clique scores 10000 bp, chain tail scores 0; " +
    "counts and wedges are exact") {
    import spark.implicits._
    // docs 1-2-3 form a 3-clique (shared trigram "t1 t2 t3");
    // doc 4 hangs off doc 3 (shared "c1 c2 c3") — a chain edge
    val docs = Seq(
      (1L, "t1 t2 t3 a1 a2 a3"),
      (2L, "t1 t2 t3 b1 b2 b3"),
      (3L, "t1 t2 t3 c1 c2 c3"),
      (4L, "c1 c2 c3 d1 d2 d3")).toDF("doc_id", "text")
    val out = GraphRank.triangles(docs, dfCap = 10, threshold = 0.01)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("triangles"),
          r.getAs[Long]("wedges"), r.getAs[Long]("clustering_bp")))).toMap
    assert(out(1L) == ((2L, 1L, 1L, 10000L)))
    assert(out(2L) == ((2L, 1L, 1L, 10000L)))
    assert(out(3L) == ((3L, 1L, 3L, 3333L)))
    assert(out(4L) == ((1L, 0L, 0L, 0L)))
  }

  test("z-order layout: every 1024-key bucket covers a <=32x32 tile; " +
    "row counts are conserved") {
    import spark.implicits._
    val events = (0 until 2000).map { i =>
      (i.toLong * 37 % 300, // user_id beyond the 256 wrap
        new java.sql.Timestamp(800000000000L + i.toLong * 97000))
    }.toDF("user_id", "ts")
    val out = Diagnostics.zorderLayout(events).collect()
    assert(out.map(_.getAs[Long]("n")).sum == 2000L)
    out.foreach { r =>
      assert(r.getAs[Int]("x_span") <= 31,
        s"bucket ${r.getLong(0)}: x_span ${r.getAs[Int]("x_span")}")
      assert(r.getAs[Int]("y_span") <= 31,
        s"bucket ${r.getLong(0)}: y_span ${r.getAs[Int]("y_span")}")
    }
    // a z-bucket holds only rows whose interleaved key lands in it:
    // spot-check one row against a scala-side reference interleave
    def zRef(x: Int, y: Int): Int =
      (0 until 8).map(i => (((x >> i) & 1) << (2 * i)) +
        (((y >> i) & 1) << (2 * i + 1))).sum
    val xb = (0L * 37 % 300 % 256).toInt
    val yb = ((800000000000L / 1000 / 60) % 1440 / 6).toInt
    val b0 = zRef(xb, yb) / 1024
    assert(out.exists(_.getLong(0) == b0))
  }

  test("label propagation: clique converges to majority label with " +
    "lexicographic ties; isolated docs keep their own") {
    import spark.implicits._
    // docs 1-2-3 share a trigram (one clique); doc 9 is isolated
    val docs = Seq(
      (1L, "t1 t2 t3 a1 a2 a3", "en"),
      (2L, "t1 t2 t3 b1 b2 b3", "de"),
      (3L, "t1 t2 t3 c1 c2 c3", "de"),
      (9L, "z1 z2 z3 z4 z5 z6", "fr")).toDF("doc_id", "text", "lang")
    val out = GraphRank.labelPropagate(docs, dfCap = 10,
      threshold = 0.01, iters = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getBoolean(3)))).toMap
    // round 1: node 1 sees {de, de} -> de; nodes 2/3 see {en, de} ->
    // tie broken to the smaller label, de. round 2: stable all-de.
    assert(out(1L) == (("en", "de", true)))
    assert(out(2L) == (("de", "de", false)))
    assert(out(3L) == (("de", "de", false)))
    assert(out(9L) == (("fr", "fr", false)))
  }

  test("type trends: exact nano-cent slope on a hand ramp; " +
    "zero-time-variance types are excluded") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val events = Seq(
      ("ramp", ts(1000), 1.0), ("ramp", ts(1010), 2.0),
      ("ramp", ts(1020), 3.0),
      ("flat", ts(2000), 5.0), ("flat", ts(2000), 7.0), // same instant
      ("solo", ts(3000), 1.0)
    ).toDF("event_type", "ts", "value")
    val out = EventsAnalytics.typeTrends(events).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("y_mean_c"),
          r.getAs[Long]("slope_nano_c")))).toMap
    // ramp: +100 cents per 10 s = 10 c/s = 1e10 nano-c/s, exactly
    assert(out == Map("ramp" -> ((3L, 200L, 10000000000L))))
  }

  test("top removal: a rank-1 cloud deflates to exactly zero (stage 1 " +
    "vanishes); a two-axis cloud hands the residual to the minor axis") {
    import spark.implicits._
    // rank-1: every vector on dim 2 -> deflation leaves the zero
    // cloud, whose power iteration is empty -> only stage 0 reports
    val rank1 = (0 until 5).map(i => (i.toLong,
      Array.tabulate(4)(j => if (j == 2) 0.2 * (i + 1) else 0.0)))
      .toDF("vec_id", "embedding")
    val r1 = Similarity.topRemoval(rank1, iters = 3, iters2 = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(r1.toSeq == Seq((0, 10000L, 10000L)))
    // two axes: dominant e0 cloud + weak e1 cloud. removing e0 leaves
    // (almost exactly) the e1 cloud: tiny residual trace, but that
    // residual is again single-direction dominated
    val rows =
      (0 until 8).map(i => (i.toLong,
        Array.tabulate(4)(j => if (j == 0) 0.4 else 0.0))) ++
      (8 until 12).map(i => (i.toLong,
        Array.tabulate(4)(j => if (j == 1) 0.1 else 0.0)))
    val r2 = Similarity.topRemoval(rows.toDF("vec_id", "embedding"),
      iters = 3, iters2 = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val (share0, trace0) = r2(0)
    val (share1, trace1) = r2(1)
    assert(trace0 == 10000L)
    assert(share0 > 9000L && share0 < 10000L)
    // residual trace is the e1 cloud's ~3% of total energy
    assert(trace1 < 1000L, s"trace1 = $trace1")
    assert(share1 > 9000L, s"share1 = $share1")
  }

  test("hll overlap: exact intersections are exact; sketch " +
    "inclusion-exclusion tracks them at small cardinalities") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "A"), (2L, "c d e", "B"), (3L, "z", "C"))
      .toDF("doc_id", "text", "source")
    val out = graft.llm.Hll.hllOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
          r.getAs[Double]("est_union"), r.getAs[Double]("est_inter"),
          r.getAs[Long]("exact_inter")))).toMap
    assert(out.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(out(("A", "B"))._5 == 2L) // {c, d}
    assert(out(("A", "C"))._5 == 0L)
    assert(out(("B", "C"))._5 == 0L)
    out.foreach { case (pair, (ea, eb, eu, ei, exact)) =>
      // union-merge monotonicity and small-cardinality accuracy
      assert(eu >= math.max(ea, eb) - 1e-9, s"$pair: union < max side")
      assert(math.abs(ei - exact) < 1.5,
        s"$pair: est_inter $ei vs exact $exact")
    }
  }

  test("a/b welch readout: hash arms are deterministic, means are " +
    "exact cents, t matches the closed form; thin arms are excluded") {
    import spark.implicits._
    def parity(uid: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
      ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 2)
    }
    val uids = (0L until 40L)
    val a0 = uids.filter(parity(_) == 0).take(4)
    val a1 = uids.filter(parity(_) == 1).take(4)
    assert(a0.size == 4 && a1.size == 4)
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // arm 0 spends {1, 1, 2, 2}; arm 1 spends {3, 3, 5, 5} (dollars)
    val spend0 = Seq(1.0, 1.0, 2.0, 2.0)
    val spend1 = Seq(3.0, 3.0, 5.0, 5.0)
    val rows =
      a0.zip(spend0).map { case (u, v) => ("buy", ts(1000 + u), u, v) } ++
      a1.zip(spend1).map { case (u, v) => ("buy", ts(1000 + u), u, v) } ++
      // "thin" has one user per arm -> must be excluded
      Seq(("thin", ts(2000), a0.head, 9.0), ("thin", ts(2001), a1.head, 9.0))
    val events = rows.toDF("event_type", "ts", "user_id", "value")
    val out = EventsAnalytics.abWelch(events).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("buy"))
    val r = out.head
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("mean_a_c") == 150L)
    assert(r.getAs[Long]("mean_b_c") == 400L)
    // closed form: var_a = (sum 100²·2+200²·2 − 600²/4)/3 cents²
    val (va, vb) = (10000.0 / 3, 40000.0 / 3)
    val se2 = va / 4 + vb / 4
    val t = (150.0 - 400.0) / math.sqrt(se2)
    assert(math.abs(r.getAs[Double]("t_welch") - t) < 1e-3,
      s"t = ${r.getAs[Double]("t_welch")} vs $t")
  }

  test("top component: an all-zero cloud yields an empty report, " +
    "not a division by zero") {
    import spark.implicits._
    val emb = Seq((0L, Array(0.0, 0.0, 0.0)), (1L, Array(0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    assert(Similarity.topComponent(emb, iters = 2).isEmpty)
  }
}
