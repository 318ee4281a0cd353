package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Sampling, Similarity}

/** Semantic checks for the round-9 curation operators: n-gram novelty
  * (x96), trained-centroid outliers (x97), the epoch-capped token mix
  * plan (x98), and incremental exact dedup (x99).
  */
class NoveltyMixSpec extends AnyFunSuite {
  import SparkTestSession._

  test("ngram novelty: the first holder scores 10000, an exact copy " +
    "scores 0, a half-new doc lands strictly between") {
    import spark.implicits._
    val base = (1 to 10).map(i => s"w$i").mkString(" ")
    val fresh = (1 to 10).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base), // exact copy: every gram first held by doc 1
      (3L, base.split(" ").take(5).mkString(" ") + " " +
        fresh.split(" ").take(5).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(docs, k = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("novelty_bp"))
      .toMap
    assert(out(1L) == 10000L)
    assert(out(2L) == 0L)
    assert(out(3L) > 0L && out(3L) < 10000L)
  }

  test("centroid outliers: a no-cluster vector is flagged, tight " +
    "cluster members are not") {
    import spark.implicits._
    // vec_ids 0 and 1 seed the two clusters; 11 more members each
    // (tight), plus one vector orthogonal-ish to both clusters
    val rng = new scala.util.Random(7)
    def cvec(c: Int) = Array.tabulate(64)(j =>
      ((if (j / 32 == c) 4.0 else 0.0) + rng.nextGaussian() * 0.1).toFloat)
    val members = (0 until 24).map(i => (i.toLong, cvec(i % 2), i % 2))
    val outlier = (99L,
      Array.tabulate(64)(j => (if (j % 2 == 0) 1.0f else -1.0f)), 0)
    val emb = (members :+ outlier).toDF("vec_id", "embedding", "label")
    val flagged = Similarity
      .centroidOutliers(emb, k = 2, trainIters = 1, z = 1.5)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(flagged == Set(99L), s"flagged $flagged")
  }

  test("silhouette report: per-cluster own/second affinity means, " +
    "margins, and ambiguity counts match hand computation") {
    import spark.implicits._
    // trainIters=0 -> centroids are the raw seed vectors 0 and 1.
    // c0 = (1,0), c1 = (0,1).
    //   v0: a4 10000 (c0), b4 0      -> margin 10000
    //   v2: a4 10000 (c0), b4 10     -> margin  9990
    //   v3: cos 0.707107 to both -> tie to c0, margin 0 (ambiguous)
    //   v1: a4 10000 (c1), b4 0      -> margin 10000
    //   v4: a4 0 (c1), b4 -10000     -> margin 10000
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f), 1),
      (2L, Array(1.0f, 0.001f), 0),
      (3L, Array(1.0f, 1.0f), 0),
      (4L, Array(-1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity
      .silhouetteReport(emb, k = 2, trainIters = 0, ambThresh4 = 500L)
      .collect()
      .map(r => r.getAs[Long]("cid") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("mean_own4"),
          r.getAs[Long]("mean_second4"), r.getAs[Long]("mean_margin4"),
          r.getAs[Long]("n_ambiguous"))))
      .toMap
    // c0: n 3, own (10000+10000+7071) -> 9023, second (0+10+7071) -> 2360
    //     margin (10000+9990+0) div 3 = 6663, 1 ambiguous
    // c1: n 2, own (10000+0) -> 5000, second (0-10000) -> -5000,
    //     margin 10000, 0 ambiguous
    assert(rows == Map(
      0L -> ((3L, 9023L, 2360L, 6663L, 1L)),
      1L -> ((2L, 5000L, -5000L, 10000L, 0L))),
      s"got: $rows")
  }

  test("incremental fuzzy dedup: a batch near-copy of a kept corpus " +
    "rep is flagged with that rep, novel content is kept") {
    import spark.implicits._
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val u = (1 to 30).map(i => s"v$i").mkString(" ")
    val fresh = (1 to 30).map(i => s"z$i").mkString(" ")
    // frozen corpus: docs 10/11 identical (rep = 10 by doc_id tie),
    // doc 12 distinct; batch: doc 20 re-serves t byte-for-byte
    // (simhash dist 0 to rep 10), doc 21 is novel
    val corpus = Seq(
      (10L, t, "srcA"), (11L, t, "srcA"), (12L, u, "srcB"))
      .toDF("doc_id", "text", "source")
    val batch = Seq((20L, t, "srcC"), (21L, fresh, "srcC"))
      .toDF("doc_id", "text", "source")
    val buckets = graft.llm.Dedup
      .repSignatureBuckets(corpus, maxDist = 3)
    val rows = graft.llm.Dedup
      .fuzzyVerdicts(batch,
        graft.llm.Dedup.fuzzyProbe(batch, buckets, maxDist = 3))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("kept"), Option(r.getAs[java.lang.Long]("rep_id")),
          Option(r.getAs[java.lang.Integer]("dist")))))
      .toMap
    assert(rows(20L) == ((false, Some(10L), Some(0))), s"got ${rows(20L)}")
    assert(rows(21L) == ((true, None, None)), s"got ${rows(21L)}")
  }

  test("knn label purity: a mislabeled neighbor halves the probe's " +
    "purity, clean clusters score 10000 bp") {
    import spark.implicits._
    // probe 0 (label 0): nearest two are v2 (label 0) and v3
    // (label 1 -> impure); probe 1 (label 1): v4, v5 both label 1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 1),
      (2L, Array(0.99f, 0.01f), 0), (3L, Array(0.98f, 0.02f), 1),
      (4L, Array(0.01f, 0.99f), 1), (5L, Array(0.02f, 0.98f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.knnLabelPurity(emb, nQueries = 2, k = 2)
      .collect()
      .map(r => r.getAs[Int]("qlabel") ->
        ((r.getAs[Long]("n_queries"), r.getAs[Long]("mean_purity_bp"),
          r.getAs[Long]("min_purity_bp"), r.getAs[Long]("max_purity_bp"))))
      .toMap
    assert(rows == Map(
      0 -> ((1L, 5000L, 5000L, 5000L)),
      1 -> ((1L, 10000L, 10000L, 10000L))),
      s"got: $rows")
  }

  test("fisher separability: within/between scatter and ratio match " +
    "the hand-computed two-class geometry") {
    import spark.implicits._
    // label 0: (1,0), (3,0)  -> mean (2,0),  within var 1
    // label 1: (0,10),(0,14) -> mean (0,12), within var 4
    // global mean (1,6): between 0 = |(1,-6)|^2 = 37, between 1 =
    // |(-1,6)|^2 = 37; fisher 37/1 and 37/4.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(3.0f, 0.0f), 0),
      (2L, Array(0.0f, 10.0f), 1), (3L, Array(0.0f, 14.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.fisherSeparability(emb)
      .collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("within_var"),
          r.getAs[Double]("between_sqdist"),
          r.getAs[Double]("fisher_ratio"))))
      .toMap
    assert(rows == Map(
      0 -> ((2L, 1.0, 37.0, 37.0)),
      1 -> ((2L, 4.0, 37.0, 9.25))),
      s"got: $rows")
  }

  test("epoch mix: one waterfill round moves a capped source's " +
    "stranded budget to the uncapped one, exactly") {
    import spark.implicits._
    // source a: 100 tokens, source b: 900. tau=0.5 -> weights 10/30,
    // want 250/750 at budget 1000; cap(1 epoch) 100/900 -> a strands
    // 150, all of it flows to b: alloc 100/900, both end capped.
    def doc(id: Long, src: String, n: Int) =
      (id, (1 to n).map(i => s"t$i").mkString(" "), src)
    val docs = Seq(doc(1, "a", 100), doc(2, "b", 450), doc(3, "b", 450))
      .toDF("doc_id", "text", "source")
    val out = Sampling.epochMixPlan(docs, budget = 1000L, tau = 0.5,
      maxEpochs = 1).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Long]("alloc"),
          r.getAs[Long]("epochs_bp"), r.getAs[Boolean]("capped"))).toMap
    assert(out("a") == ((100L, 100L, 10000L, true)))
    assert(out("b") == ((900L, 900L, 10000L, true)))
  }

  test("epoch mix: under-budget sources keep their proportional " +
    "allocation uncapped") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, (1 to n).map(i => s"t$i").mkString(" "), src)
    val docs = Seq(doc(1, "a", 100), doc(2, "b", 900))
      .toDF("doc_id", "text", "source")
    // tau=1 -> proportional: want 50/450, caps 100/900 -> untouched
    val out = Sampling.epochMixPlan(docs, budget = 500L, tau = 1.0,
      maxEpochs = 1).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("alloc"), r.getAs[Boolean]("capped"))).toMap
    assert(out("a") == ((50L, false)))
    assert(out("b") == ((450L, false)))
  }

  test("incremental dedup: newMod=1 makes everything a batch; " +
    "first-occurrence wins within it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "totally different text"),
      (4L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(docs, newMod = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("keep_id")))).toMap
    assert(out(1L) == (("novel", None)))
    assert(out(2L) == (("dup_in_batch", Some(1L))))
    assert(out(3L) == (("novel", None)))
    assert(out(4L) == (("dup_in_batch", Some(1L))))
  }

  test("incremental dedup: a new doc whose text lives in the frozen " +
    "corpus is dup_of_corpus with the corpus keeper") {
    import spark.implicits._
    // learn the operator's own hash split, then assert its verdicts
    // against a straightforward recomputation
    val texts = Seq(
      "one two three", "one two three", "four five six",
      "seven eight nine", "four five six", "ten eleven twelve",
      "one two three", "thirteen fourteen", "four five six",
      "fifteen sixteen")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val newIds = docs.select(col("doc_id"))
      .filter(expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 4), 16, 10) " +
          "as int) % 3 = 0"))
      .collect().map(_.getLong(0)).toSet
    assume(newIds.nonEmpty && newIds.size < texts.size,
      "fixture must split into both old and new")
    val byText = texts.zipWithIndex.groupBy(_._1)
    val out = Dedup.incrementalDedup(docs, newMod = 3).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == newIds)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = texts(id.toInt)
      val oldHolders = byText(t).map(_._2.toLong)
        .filterNot(newIds.contains)
      val earlierNew = byText(t).map(_._2.toLong)
        .filter(x => newIds.contains(x) && x < id)
      val expected =
        if (oldHolders.nonEmpty) ("dup_of_corpus", Some(oldHolders.min))
        else if (earlierNew.nonEmpty) ("dup_in_batch", Some(earlierNew.min))
        else ("novel", None)
      val got = (r.getAs[String]("verdict"),
        Option(r.getAs[java.lang.Long]("keep_id")).map(_.toLong))
      assert(got == expected, s"doc $id: got $got expected $expected")
    }
  }
}
