package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Bpe, Importance, LanguageModel, QualityClassifier}

/** Semantic checks for the round-5 pretraining-pipeline operators:
  * BPE merge learning, trigram-LM perplexity, DSIR importance
  * weights, and quality-classifier training.
  */
class PretrainOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bpe: learns the most frequent pair first, with exact counts") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val m = Bpe.merges(docs, rounds = 2).collect()
    assert(m.length == 2)
    assert(m(0).getAs[String]("lhs") == "a" &&
      m(0).getAs[String]("rhs") == "a" &&
      m(0).getAs[String]("merged") == "aa" &&
      m(0).getAs[Long]("cnt") == 2) // the two "aa" occurrences
    assert(m(1).getAs[String]("merged") == "ab" &&
      m(1).getAs[Long]("cnt") == 1)
  }

  test("bpe: greedy left-to-right rewrite does not overlap") {
    import spark.implicits._
    // "aaaa" -> <a><a><a><a>: pair (a,a) counts 3; after merging,
    // greedy non-overlapping rewrite must give <aa><aa>, so round 2
    // sees exactly one (aa,aa) pair.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val m = Bpe.merges(docs, rounds = 2).collect()
    assert(m(0).getAs[String]("merged") == "aa" && m(0).getAs[Long]("cnt") == 3)
    assert(m(1).getAs[String]("merged") == "aaaa" &&
      m(1).getAs[Long]("cnt") == 1)
  }

  test("bpe: stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val m = Bpe.merges(docs, rounds = 5).collect()
    assert(m.isEmpty) // all words are single symbols
  }

  test("bpe encode: tokenizes with learned merges, hand-checked counts") {
    import spark.implicits._
    // vocab: aaab(2), ab(1). Round 1 merges (a,a) [cnt 4], round 2
    // merges (a,b) [cnt 3] -> aaab encodes as <aa><ab> (2 tokens),
    // ab as <ab> (1 token). doc 3's only word contains '<' and is
    // excluded by the tokenizer contract -> 0 chars, 0 tokens.
    val docs = Seq(
      (1L, "aaab aaab"), (2L, "ab"), (3L, "x<y")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, rounds = 2).collect()
    val byId = enc.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"))).toMap
    assert(byId(1L) == ((8L, 4L))) // two words x <aa><ab>
    assert(byId(2L) == ((2L, 1L)))
    assert(byId(3L) == ((0L, 0L)))
  }

  test("bpe size sweep: prefix tokenizers price hand-checked token " +
    "counts, monotone in the merge budget") {
    import spark.implicits._
    // corpus "aaab aaab" + "ab": merges (a,a) then (a,b).
    // m=1: aaab -> <aa><a><b> (3), ab -> <a><b> (2) => 8 tokens
    // m=2: aaab -> <aa><ab> (2), ab -> <ab> (1)     => 5 tokens
    val docs = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val rows = Bpe.sizeSweep(docs, mergeCounts = Seq(1, 2)).collect()
      .map(r => r.getAs[Int]("n_merges") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("chars_per_token_micro"))))
      .toMap
    assert(rows == Map(
      1 -> ((10L, 8L, 1250000L)),
      2 -> ((10L, 5L, 2000000L))),
      s"got: $rows")
    // the full-budget arm equals the standalone encode totals
    val enc = Bpe.encode(docs, rounds = 2).collect()
    assert(enc.map(_.getAs[Long]("n_tokens")).sum == 5L)
  }

  test("bpe encode: merges never span the word separator") {
    import spark.implicits._
    // "b a" adjacent across the space must NOT merge even when (b,a)
    // would be a learnable in-word pair from "ba"
    val docs = Seq((1L, "ba ba"), (2L, "b a")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, rounds = 1).collect()
    val byId = enc.map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    assert(byId(1L) == 2L) // two <ba> tokens
    assert(byId(2L) == 2L) // separator blocks the cross-word merge
  }

  test("lm perplexity: out-of-distribution text scores higher") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (2L, "the quick brown fox jumps over the lazy dog once more here", "en"),
      (3L, "zzqx zzqx vvkk wwpp qqzz xxvv kkww ppqq zzxx vvqq kkpp wwzz", "de"))
      .toDF("doc_id", "text", "lang")
    val out = LanguageModel.trigramPerplexity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    assert(out(3L) > out(1L) && out(3L) > out(2L))
  }

  test("dsir: target-like documents get positive weight") {
    import spark.implicits._
    // token counts large enough that the add-1/B smoothing doesn't
    // swamp the real distributions
    val alpha100 = Seq.fill(100)("alpha").mkString(" ")
    val beta100 = Seq.fill(100)("beta").mkString(" ")
    val mixed = (Seq.fill(50)("alpha") ++ Seq.fill(50)("beta")).mkString(" ")
    val docs = Seq(
      (1L, alpha100, "src1"),
      (2L, beta100, "src9"),
      (3L, mixed, "src9"))
      .toDF("doc_id", "text", "source")
    val w = Importance.dsirWeights(docs, buckets = 64,
        targetSources = Seq("src1")).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("log_weight"), r.getAs[Boolean]("keep"))).toList
      .sortBy(_._1)
    val byId = w.map(t => t._1 -> t).toMap
    assert(byId(1L)._3, "pure-target doc must be kept")
    assert(!byId(2L)._3, "pure-raw doc must be dropped")
    assert(byId(1L)._2 > byId(3L)._2 && byId(3L)._2 > byId(2L)._2)
  }

  test("quality classifier: separable labels are separated") {
    import spark.implicits._
    val en = (1L to 10L).map(i =>
      (i, "the a of and in to is the a of and in to is", "en"))
    val de = (11L to 20L).map(i =>
      (i, "der das und ein eine mit von der das und ein eine mit von", "de"))
    val docs = (en ++ de).toDF("doc_id", "text", "lang")
    val out = QualityClassifier.trainScore(docs).collect()
    val probs = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("prob")).toMap
    val minEn = (1L to 10L).map(probs).min
    val maxDe = (11L to 20L).map(probs).max
    assert(minEn > maxDe,
      s"en prob floor $minEn must exceed de prob ceiling $maxDe")
  }

  test("calibration: buckets partition the corpus and mean prob " +
    "stays inside its band") {
    import spark.implicits._
    val en = (1L to 10L).map(i =>
      (i, "the a of and in to is the a of and in to is", "en"))
    val de = (11L to 20L).map(i =>
      (i, "der das und ein eine mit von der das und ein eine mit von",
        "de"))
    val docs = (en ++ de).toDF("doc_id", "text", "lang")
    val rows = QualityClassifier.calibration(docs).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 20L)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val ap = r.getAs[Double]("avg_prob")
      val or = r.getAs[Double]("obs_rate")
      // the band's mean prediction must lie in the band itself
      // (last band is closed above)
      assert(ap >= b / 10.0 - 1e-6 &&
        (ap < (b + 1) / 10.0 + 1e-6 || b == 9), s"b=$b ap=$ap")
      assert(or >= 0.0 && or <= 1.0)
      assert(r.getAs[Double]("gap") ==
        BigDecimal.valueOf(math.abs(ap - or))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the separable fixture puts en-docs in high bands, de in low —
    // at least two distinct bands with opposite observed rates
    val byRate = rows.map(r => r.getAs[Double]("obs_rate"))
    assert(byRate.max == 1.0 && byRate.min == 0.0)
  }

  test("misra-gries: candidate set always contains true heavy hitters") {
    import spark.implicits._
    // 60% "hot", the rest unique cold tokens — hot must be a candidate
    // for every k, on any partitioning
    val docs = (1L to 50L).map(i =>
      (i, if (i <= 30) "hot hot hot" else s"cold${i}a cold${i}b cold${i}c"))
      .toDF("doc_id", "text")
    val out = graft.llm.HeavyHitters.heavyHitters(docs, k = 8).collect()
    assert(out.nonEmpty)
    assert(out(0).getAs[String]("w") == "hot")
    assert(out(0).getAs[Long]("cnt") == 90)
    // nothing else exceeds n/(k+1)
    assert(out.length == 1)
  }

  test("temperature mix: budget apportioned, hash-order picks, flattened") {
    import spark.implicits._
    val docs = (1L to 300L).map(i =>
      (i, s"text $i", if (i <= 240) "big" else "small", 10L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = graft.llm.Sampling.temperatureMix(docs, budget = 50, tau = 0.5)
      .collect()
    assert(out.length == 50)
    val bySrc = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    // sqrt weights: sqrt(240)=15.49, sqrt(60)=7.75 -> 33.3/16.7 split
    assert(bySrc("big") == 33 && bySrc("small") == 17, bySrc.toMap.toString)
    // temperature flattens: raw proportion would be 40/10
    assert(bySrc("small") > 10)
    // rk is 1..alloc per source
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val rks = rows.map(_.getAs[Int]("rk")).sorted
      assert(rks.toSeq == (1 to rks.length).toSeq)
    }
  }

  test("truncation loss: exact dropped-token counts per (source, cap)") {
    import spark.implicits._
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    // A: 10 + 40 tokens; B: exactly 64 (a cap of 64 drops NOTHING —
    // the over test is strict)
    val docs = Seq(
      (1L, words(10), "A"), (2L, words(40), "A"), (3L, words(64), "B"))
      .toDF("doc_id", "text", "source")
    val rows = graft.llm.TextAnalysis
      .truncationLoss(docs, lens = Seq(32, 64)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("max_len")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("docs_over"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("tokens_dropped"),
          r.getAs[Double]("drop_rate")))).toMap
    assert(rows(("A", 32)) == ((2L, 1L, 50L, 8L, 0.16)))
    assert(rows(("A", 64)) == ((2L, 0L, 50L, 0L, 0.0)))
    assert(rows(("B", 32)) == ((1L, 1L, 64L, 32L, 0.5)))
    assert(rows(("B", 64)) == ((1L, 0L, 64L, 0L, 0.0)))
  }

  test("curriculum order: phases are difficulty-monotone, sizes " +
      "ntile-exact, within-phase order is the md5 shuffle") {
    import spark.implicits._
    val docs = (0L until 10L).map { i =>
      // token counts 1..10 → with 3 phases: sizes 4, 3, 3
      (i, (0 to i.toInt).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.llm.Sampling.curriculumOrder(docs, phases = 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"),
        r.getAs[Int]("phase"), r.getAs[Long]("ord")))
    assert(out.length == 10)
    val byPhase = out.groupBy(_._3).view.mapValues(_.toSeq).toMap
    assert(byPhase.keySet == Set(1, 2, 3))
    assert(byPhase(1).size == 4 && byPhase(2).size == 3 &&
      byPhase(3).size == 3)
    // every doc in a later phase is at least as hard as any earlier
    assert(byPhase(1).map(_._2).max <= byPhase(2).map(_._2).min)
    assert(byPhase(2).map(_._2).max <= byPhase(3).map(_._2).min)
    // within-phase order = rank of md5(doc_id)
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    byPhase.values.foreach { rows =>
      val want = rows.sortBy(r => md5(r._1.toString)).map(_._1)
      val got = rows.sortBy(_._4).map(_._1)
      assert(got == want, s"shuffle order: $got vs $want")
      assert(rows.map(_._4).sorted == (1L to rows.size).toSeq)
    }
  }
}
