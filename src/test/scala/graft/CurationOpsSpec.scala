package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, LanguageModel, Packing, Similarity}
import graft.operators.BloomPrune

/** Semantic checks for the curation/serving operators added late in
  * round 5: cluster representatives, hard-negative mining, the
  * training-shard shuffle, perplexity buckets, and bloom pruning.
  */
class CurationOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cluster reps: identical docs collapse, tie-break keeps min id") {
    import spark.implicits._
    // docs 1,2,3 identical (one cluster, equal scores -> min id wins);
    // doc 9 unique (its own singleton cluster)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (9L, "utterly different content entirely here now"))
      .toDF("doc_id", "text")
    val reps = Dedup.clusterRepresentatives(docs, maxDist = 3).collect()
      .map(r => r.getAs[Long]("component") ->
        (r.getAs[Long]("rep_id"), r.getAs[Long]("n_docs"))).toMap
    assert(reps(1L) == ((1L, 3L)))
    assert(reps(9L) == ((9L, 1L)))
  }

  test("cluster reps: higher-quality member beats lower doc_id") {
    import spark.implicits._
    // 60 shared distinct tokens dominate the simhash bit votes, so a
    // 3-token suffix difference stays within 3 bits — one cluster —
    // while doc 1's repeated suffix lowers its uniq_ratio below
    // doc 2's: the argmax must key on score, not id.
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      (1L, base + " dup dup dup"),
      (2L, base + " unique1 unique2 unique3"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(docs, maxDist = 3).count()
    assume(pairs == 1, "fixture texts must be simhash near-dups")
    val reps = Dedup.clusterRepresentatives(docs, maxDist = 3).collect()
    assert(reps.length == 1)
    assert(reps(0).getAs[Long]("rep_id") == 2L) // higher uniq_ratio
    assert(reps(0).getAs[Long]("n_docs") == 2L)
  }

  test("hard negatives: never returns the anchor's own label") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),  // anchor, label 0
      (10L, Array(0.99f, 0.1f, 0f), 0),   // same label, most similar — excluded
      (11L, Array(0.9f, 0.2f, 0f), 1),    // different label — the hard negative
      (12L, Array(0f, 1f, 0f), 1),
      (13L, Array(0f, 0f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, nQueries = 1, k = 2).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(11L, 13L) ||
      out.map(_.getAs[Long]("vec_id")).toSeq == Seq(11L, 12L))
    assert(out(0).getAs[Long]("vec_id") == 11L) // hardest negative first
    assert(!out.map(_.getAs[Long]("vec_id")).contains(10L))
  }

  test("shard shuffle: contiguous per-shard positions, partition-invariant") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Packing.shardShuffle(docs, "cast(doc_id as string)", 8).collect()
    val b = Packing.shardShuffle(docs.repartition(7),
      "cast(doc_id as string)", 8).collect()
    // deterministic under any input partitioning
    assert(a.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq)
    assert(a.length == 200)
    // positions are exactly 0..n_s-1 within every shard
    a.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val pos = rows.map(_.getLong(1)).sorted
      assert(pos.toSeq == (0L until pos.length).toSeq)
    }
    // the layout is decorrelated from doc_id order: shard 0's docs
    // are not simply the first doc_ids
    val s0 = a.filter(_.getInt(0) == 0).map(_.getLong(2)).toSeq
    assert(s0.nonEmpty && s0.sorted != (0L until s0.length).toSeq)
  }

  test("perplexity buckets: exact terciles, ordered by score") {
    import spark.implicits._
    // 9 docs >= 3 chars, same lang: terciles of 3/3/3
    val docs = (1L to 9L).map { i =>
      val rep = "the common trigram stream " * i.toInt
      (i, rep + ("zq" * (10 - i).toInt), "en")
    }.toDF("doc_id", "text", "lang")
    val out = LanguageModel.perplexityBuckets(docs).collect()
    val byBucket = out.groupBy(_.getAs[String]("bucket"))
    assert(byBucket.view.mapValues(_.length).toMap ==
      Map("head" -> 3, "middle" -> 3, "tail" -> 3))
    val nll = out.map(r =>
      r.getAs[String]("bucket") -> r.getAs[Double]("avg_nll"))
    val maxHead = nll.filter(_._1 == "head").map(_._2).max
    val minTail = nll.filter(_._1 == "tail").map(_._2).min
    assert(maxHead <= nll.filter(_._1 == "middle").map(_._2).min)
    assert(nll.filter(_._1 == "middle").map(_._2).max <= minTail)
  }

  test("bloom prune: no false negatives, FPs are flagged non-members") {
    import spark.implicits._
    val dim = (0L until 40L).map(i => Tuple1(i * 3)).toDF("o_orderkey")
    val fact = (0L until 600L).map(Tuple1(_)).toDF("l_orderkey")
    val out = BloomPrune.pruneAudit(fact, dim, "l_orderkey", "o_orderkey",
      bits = 1024, k = 3).collect()
    val passSet = out.map(_.getLong(0)).toSet
    val members = (0L until 40L).map(_ * 3).filter(_ < 600).toSet
    // every true member passes the filter
    assert(members.subsetOf(passSet))
    // the member flag is exact
    out.foreach { r =>
      assert(r.getAs[Boolean]("member") == members.contains(r.getLong(0)))
    }
    // the prune actually prunes (some non-members rejected)
    assert(passSet.size < 600)
  }

  test("cluster reps: corpus with no near-dups is all singletons") {
    import spark.implicits._
    val docs = Seq(
      (1L, "completely distinct first document body here"),
      (2L, "another unrelated text with different words"),
      (3L, "third standalone entry nothing shared at all"))
      .toDF("doc_id", "text")
    val reps = Dedup.clusterRepresentatives(docs, maxDist = 3).collect()
    assert(reps.length == 3)
    reps.foreach { r =>
      assert(r.getAs[Long]("component") == r.getAs[Long]("rep_id"))
      assert(r.getAs[Long]("n_docs") == 1L)
    }
  }

  test("shard shuffle: single shard degenerates to a total hash order") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Packing.shardShuffle(docs, "cast(doc_id as string)", 1)
      .collect()
    assert(out.length == 50)
    assert(out.forall(_.getInt(0) == 0))
    assert(out.map(_.getLong(1)).sorted.toSeq == (0L until 50L).toSeq)
  }

  test("perplexity buckets: fewer docs than tiles still covers all docs") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef", "en"), (2L, "ghijkl", "en"))
      .toDF("doc_id", "text", "lang")
    val out = LanguageModel.perplexityBuckets(docs, tiles = 3).collect()
    assert(out.length == 2)
    // SQL ntile with n < k: tiles 1 and 2 get one row each
    val buckets = out.map(_.getAs[String]("bucket")).toSet
    assert(buckets == Set("head", "middle"))
  }

  test("doc chunks: overlap coverage and hand-checked window count") {
    import spark.implicits._
    // n=10, width=4, overlap=1 (step 3): COVER count — starts 1,4,7
    // reach the end with full-width windows, no 1-char tail chunk;
    // n=3 (≤ width) is a single chunk
    val docs = Seq((1L, "abcdefghij"), (2L, "xyz")).toDF("doc_id", "text")
    val out = Packing.chunkDocuments(docs, width = 4, overlap = 1).collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 1, 4), (1, 4, 4), (2, 7, 4)))
    // full coverage: the last window's end (7 + 4 - 1) reaches n
    assert(d1.last.getInt(2) + d1.last.getInt(3) - 1 == 10)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 1, 3)))
    // consecutive chunks overlap by exactly `overlap` characters
    // (verified through the starts: 4 - 1 = step = width - overlap)
  }

  test("sorted batches: batches are contiguous length ranges") {
    import spark.implicits._
    val docs = (1L to 100L).map { i =>
      (i, Seq.fill(((i * 37) % 50 + 1).toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Packing.sortedBatches(docs, batchSize = 16).collect()
    assert(out.length == 100)
    // every batch's max token count <= next batch's min token count
    val byBatch = out.groupBy(_.getAs[Int]("batch_idx")).toSeq.sortBy(_._1)
    byBatch.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        assert(a.map(_.getAs[Long]("n_tokens")).max <=
          b.map(_.getAs[Long]("n_tokens")).min)
      case _ =>
    }
    // all batches full except possibly the last
    byBatch.dropRight(1).foreach { case (_, rows) =>
      assert(rows.length == 16)
    }
  }

  test("salted join: identical result to the plain join, spread salts") {
    import spark.implicits._
    // one hot key (90% of fact rows) + a long tail
    val fact = (0L until 1000L).map { i =>
      (if (i < 900) 7L else i % 20, i)
    }.toDF("k", "row_id")
    val dim = (0L until 20L).map(k => (k, s"v$k")).toDF("k", "payload")
    val plain = fact.join(dim, "k")
      .select(col("k"), col("row_id"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(identity)
    val salted = graft.operators.SaltedJoin
      .join(fact, dim, "k", "cast(row_id as string)", salts = 8)
      .select(col("k"), col("row_id"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(identity)
    assert(salted.toSeq == plain.toSeq)
    // the hot key's rows really spread: every one of the 8 salts gets
    // a share, and no salt keeps more than 30% of the hot rows
    val saltCounts = fact.filter(col("k") === 7L)
      .withColumn("salt", expr(
        s"(${graft.llm.Dedup.hash16Expr("instr", "cast(row_id as string)")} % 8)"))
      .groupBy(col("salt")).count().collect()
    assert(saltCounts.length == 8)
    assert(saltCounts.map(_.getAs[Long]("count")).max < 270L)
  }

  test("bloom prune: empty dimension passes nothing") {
    import spark.implicits._
    val dim = Seq.empty[Long].toDF("o_orderkey")
    val fact = (0L until 100L).map(Tuple1(_)).toDF("l_orderkey")
    val out = BloomPrune.pruneAudit(fact, dim, "l_orderkey", "o_orderkey",
      bits = 1024, k = 3)
    assert(out.count() == 0)
  }

  test("bloom prune: pass set is partition-invariant") {
    import spark.implicits._
    val dim = (0L until 25L).map(Tuple1(_)).toDF("o_orderkey")
    val fact = (0L until 300L).map(Tuple1(_)).toDF("l_orderkey")
    val a = BloomPrune.pruneAudit(fact, dim, "l_orderkey", "o_orderkey",
      bits = 1024, k = 3).collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val b = BloomPrune.pruneAudit(fact.repartition(13), dim.repartition(5),
      "l_orderkey", "o_orderkey", bits = 1024, k = 3)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("semantic dedup: clone of a seed is marked dup, orthogonal is not") {
    import spark.implicits._
    // seeds 0,1 orthogonal; 10 is a near-clone of seed 0 (same
    // direction, scaled — cosine 1), 11 is aligned with seed 1
    // but only to cos ≈ 0.95−ε against every cluster-0 member
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f, 0f)),
      (10L, Array(2f, 0f, 0f, 0f)),
      (11L, Array(0.1f, 0.99f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, k = 2, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out(0L) == ((0L, false))) // keeper: lowest id in its cluster
    assert(out(10L)._2, "clone of seed 0 must be marked dup")
    assert(!out(11L)._2, "cos < threshold must survive")
    assert(out(10L)._1 == 0L && out(11L)._1 == 1L) // cluster sanity
  }

  test("semantic dedup: over-cap cluster is dropped whole, not enumerated") {
    import spark.implicits._
    // 10 identical vectors: with clusterCap=4 the cluster is dropped
    // before pair enumeration, so nothing is marked (the documented
    // cap-and-drop contract — same as the LSH bucket cap)
    val emb = (0L until 10L).map(i => (i, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, k = 1, threshold = 0.9,
      clusterCap = 4)
    assert(out.filter(col("is_dup")).count() == 0)
    assert(out.count() == 10)
  }

  test("semantic dedup: a Lloyd round recovers dups clumped seeds miss") {
    import spark.implicits._
    // all four seeds sit in one corner of the space (angles ≤ 0.03
    // rad) while the corpus has four true groups of duplicates; with
    // untrained seeds most groups funnel into one over-cap cluster
    // (dropped whole — dups missed), while one training round spreads
    // the centroids and recovers strictly more duplicate marks
    def vec(angle: Double) =
      Array(math.cos(angle).toFloat, math.sin(angle).toFloat)
    val seeds = (0 until 4).map(i => (i.toLong, vec(i * 0.01)))
    val groups = Seq(0.0, math.Pi / 6, math.Pi / 3, math.Pi / 2)
      .zipWithIndex.flatMap { case (a, g) =>
        (0 until 10).map(j => (4L + g * 10 + j, vec(a)))
      }
    val emb = (seeds ++ groups).toDF("vec_id", "embedding")
    def marks(iters: Int): Long =
      graft.llm.Similarity.semanticDedup(emb, k = 4, threshold = 0.95,
        clusterCap = 12, trainIters = iters)
        .filter(col("is_dup")).count()
    val untrained = marks(0)
    val trained = marks(1)
    info(s"dup marks: untrained=$untrained trained=$trained")
    assert(trained > untrained,
      s"training must recover dups: $trained <= $untrained")
  }

  test("pmi collocations: a planted bigram outranks independent pairs") {
    import spark.implicits._
    // "fizz buzz" always adjacent (40 occurrences); every other word
    // sits next to a per-doc unique pad, so no other bigram reaches
    // the count floor — the planted pair is the only candidate and
    // must take rank 1
    val docs = (1L to 20L).map { i =>
      (i, s"fizz buzz a$i alpha b$i beta c$i gamma d$i fizz buzz")
    }.toDF("doc_id", "text")
    val top = graft.llm.TextAnalysis
      .pmiCollocations(docs, minCount = 5, k = 5).collect()
    assert(top.length == 1, s"${top.length} bigrams crossed the floor")
    assert(top(0).getString(0) == "fizz" && top(0).getString(1) == "buzz",
      s"rank 1 was ${top(0).getString(0)} ${top(0).getString(1)}")
    assert(top(0).getLong(2) == 40L) // 2 per doc × 20 docs
  }

  test("vocab coverage: rare-token documents score high OOV") {
    import spark.implicits._
    // vocabulary of size 2 covers the two frequent words; doc 3 is
    // all rare tokens -> oov 1.0, doc 1 all frequent -> oov 0.0
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha"),
      (2L, "alpha beta rare1 rare2"),
      (3L, "zzz1 zzz2 zzz3"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextAnalysis.vocabCoverage(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 0.0)
    assert(out(2L) == 0.5)
    assert(out(3L) == 1.0)
  }

  test("bm25: idf ranks rare over common, length norm ranks short " +
      "over long, ties break on doc_id, query doc excluded") {
    import spark.implicits._
    // query = doc 0's tokens ("rare common"); df(rare)=3 < df(common)=6
    val docs = Seq(
      (0L, "rare common"),
      (1L, "rare u1 u2 u3"),           // rare, len 4  -> rank 1
      (3L, "rare u7 u8 u9 u10 u11 u12 u13"), // rare, len 8 -> rank 2
      (2L, "common u4 u5 u6"),         // common, len 4 -> tie group
      (4L, "nomatch x1 x2"),           // no query term -> absent
      (5L, "common f1 f2 f3"), (6L, "common f4 f5 f6"),
      (7L, "common f7 f8 f9"), (8L, "common g1 g2 g3"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextAnalysis
      .bm25TopK(docs, nQueries = 1, qTerms = 2, k = 5).collect()
    assert(out.map(_.getAs[Long]("qid")).forall(_ == 0L))
    val ids = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("doc_id"))
    // rare/len4 > rare/len8 > the common tie group in doc_id order
    assert(ids.toSeq == Seq(1L, 3L, 2L, 5L, 6L), ids.mkString(","))
    val scores = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("bm25"))
    assert(scores(0) > scores(1) && scores(1) > scores(2))
    assert(scores(2) == scores(3) && scores(3) == scores(4)) // exact tie
    assert(!ids.contains(0L)) // the query doc never retrieves itself
  }

  test("substring scrub: one canonical copy survives, within-doc " +
      "repeats keep the first occurrence, unique docs untouched") {
    import spark.implicits._
    val ten = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, ten),                       // canonical holder — untouched
      (2L, ten),                       // full-doc dup — scrubbed empty
      (3L, "p1 p2 p3 p4 z1 z2 z3 z4 z5 p1 p2 p3 p4"), // self-repeat
      (4L, "u1 u2 u3 u4 u5"))          // unique — untouched
      .toDF("doc_id", "text")
    val out = Dedup.substringScrub(docs, k = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed_spans"), r.getAs[Long]("n_tokens_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(out.size == 4) // every doc appears, scrubbed or not
    assert(out(1L) == ((0L, 10L, ten)))
    assert(out(2L) == ((1L, 0L, "")))
    assert(out(3L) == ((1L, 9L, "p1 p2 p3 p4 z1 z2 z3 z4 z5")))
    assert(out(4L) == ((0L, 5L, "u1 u2 u3 u4 u5")))
  }

  test("substring dup spans: shared run becomes one maximal span per doc") {
    import spark.implicits._
    // A 10-token run shared verbatim by two docs, embedded at
    // different offsets between globally-unique tokens. With k=4 the
    // duplicated gram starts are exactly those fully inside the run,
    // and island coalescing must recover the FULL 10-token range.
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $shared v1 v2 v3"),
      (2L, s"w1 w2 $shared x1"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(docs, k = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("span_start"), r.getAs[Int]("span_end"),
          r.getAs[Int]("span_tokens"), r.getAs[String]("dup_text"))))
      .toMap
    assert(spans.size == 2)
    assert(spans(1L) == ((3, 12, 10, shared)))
    assert(spans(2L) == ((2, 11, 10, shared)))
  }

  test("substring dup spans: gap > k splits islands; within-doc repeats count") {
    import spark.implicits._
    val r1 = (1 to 5).map(i => s"r$i").mkString(" ")
    val q1 = (1 to 5).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"$r1 g1 g2 g3 g4 g5 $q1"), // two dup regions, 5-token gap
      (2L, r1), (3L, q1),              // the cross-doc partners
      // within-doc repetition, contiguous: back-to-back duplicated
      // 4-gram starts at 0 and 4 (gap == k) must MERGE into one span
      (4L, "m1 m2 m3 m4 m1 m2 m3 m4 y1 y2"))
      .toDF("doc_id", "text")
    val byDoc = Dedup.substringDupSpans(docs, k = 4).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val d1 = byDoc(1L).map(r => (r.getAs[Int]("span_start"),
      r.getAs[Int]("span_end"))).sorted
    assert(d1.toSeq == Seq((0, 4), (10, 14))) // split: gap 9 > k 4
    val d4 = byDoc(4L).map(r => (r.getAs[Int]("span_start"),
      r.getAs[Int]("span_end"), r.getAs[Long]("n_dup_grams")))
    assert(d4.toSeq == Seq((0, 7, 2L))) // merged across the k-gap
  }

  test("fuzzy scrub: cluster collapses to its rep, singletons survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "s0"),
      (2L, "alpha beta gamma delta epsilon zeta", "s0"),
      (3L, "alpha beta gamma delta epsilon zeta", "s1"),
      (9L, "utterly different content entirely here now", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.fuzzyScrub(docs, maxDist = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_size"), r.getAs[Long]("n_dups_removed"),
          r.getAs[String]("source"))))
      .toMap
    assert(out.keySet == Set(1L, 9L)) // docs 2, 3 scrubbed
    assert(out(1L) == ((3L, 2L, "s0")))
    assert(out(9L) == ((1L, 0L, "s2")))
  }

  test("leakage-safe splits: cluster members are atomic across splits") {
    import spark.implicits._
    // identical trio = one cluster; 60 distinct singletons give the
    // hash bands enough mass to populate more than one split
    val trio = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"))
    val singles = (10 until 70).map(i =>
      (i.toLong, (0 until 8).map(j => s"tok${i}_$j").mkString(" ")))
    val docs = (trio ++ singles).toDF("doc_id", "text")
    val out = Dedup.leakageSafeSplits(docs, maxDist = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[String]("split")))).toMap
    // the trio shares one component and therefore ONE split
    assert(out(1L)._1 == out(2L)._1 && out(2L)._1 == out(3L)._1)
    assert(out(1L)._2 == out(2L)._2 && out(2L)._2 == out(3L)._2)
    // bands actually split the corpus, with train the majority
    val bySplit = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet.size >= 2)
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("test", 0))
  }

  test("cluster sample: quotas sum to budget, tau<1 over-samples the " +
    "small cluster") {
    import spark.implicits._
    // 90 vectors near +x, 10 near +y: two clean clusters. tau=0.5
    // quotas ~ sqrt(90):sqrt(10) = 15:5 on budget 20 — the small
    // cluster gets 25%, far above its 10% proportional share
    val vecs = (0 until 100).map { i =>
      val big = i < 90
      (i.toLong, Array(
        (if (big) 4.0 else 0.0) + (i % 5) * 0.02,
        (if (big) 0.0 else 4.0) + (i % 7) * 0.02).map(_.toFloat), 0)
    }
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val out = graft.llm.Similarity.clusterSample(emb, k = 2,
      budget = 20, tau = 0.5, trainIters = 1, trainTarget = 0).collect()
    assert(out.length == 20) // quotas sum exactly to the budget
    val byCid = out.groupBy(_.getAs[Long]("cid")).view
      .mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    assert(byCid.size == 2)
    val (smallCid, smallIds) = byCid.minBy(_._2.size)
    assert(smallIds.size == 5, s"small cluster got ${smallIds.size}")
    // and the small-cluster picks really are the +y vectors
    assert(smallIds.forall(_ >= 90L), s"$smallCid -> $smallIds")
  }

  test("leakage audit: cluster policy crosses zero, doc-hash leaks") {
    import spark.implicits._
    // many identical trios -> many near-dup pairs; with 100 hash
    // bands some pair is near-certain to straddle under per-doc
    // hashing, while the cluster policy cannot by construction
    val docs = (0 until 30).flatMap { c =>
      val text = (0 until 8).map(j => s"c${c}tok$j").mkString(" ")
      Seq((c * 10L, text), (c * 10L + 1, text), (c * 10L + 2, text))
    }.toDF("doc_id", "text")
    val rows = Dedup.leakageAudit(docs, maxDist = 3).collect()
      .map(r => r.getAs[String]("policy") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_cross")))).toMap
    assert(rows("cluster")._2 == 0L)
    assert(rows("cluster")._1 == rows("doc_hash")._1)
    assert(rows("cluster")._1 >= 90L) // 3 pairs per trio, 30 trios
    assert(rows("doc_hash")._2 > 0L, "naive hashing should leak here")
  }

  test("gopher rules: each rule trips on its own pathology") {
    import spark.implicits._
    // 60 distinct-ish tokens with stopwords, mean wlen in range
    val good = (1 to 58).map(i => s"word$i").mkString(" ") + " the a"
    val short = "the a tiny doc here now"                 // r_count fails
    val numeric = (1 to 60).map(i => s"$i").mkString(" ") // r_alpha+r_stop fail
    val repeated = (Seq.fill(55)("dup") ++
      Seq("the", "a", "word1", "word2", "word3")).mkString(" ") // r_rep fails
    val docs = Seq((0L, good), (1L, short), (2L, numeric), (3L, repeated))
      .toDF("doc_id", "text")
    val rows = graft.llm.TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(0L).getAs[Boolean]("keep"))
    assert(!rows(1L).getAs[Boolean]("r_count") &&
      rows(1L).getAs[Boolean]("r_stop"))
    assert(!rows(2L).getAs[Boolean]("r_alpha") &&
      !rows(2L).getAs[Boolean]("r_stop") &&
      !rows(2L).getAs[Boolean]("keep"))
    assert(!rows(3L).getAs[Boolean]("r_rep") &&
      rows(3L).getAs[Double]("top_frac") > 0.9)
    assert(Seq(1L, 2L, 3L).forall(i => !rows(i).getAs[Boolean]("keep")))
  }

  test("semantic decontamination: clone of a benchmark vector flags, " +
      "orthogonal does not, zero-norms are excluded on both sides") {
    import spark.implicits._
    // bench slice (vec_id < 3): e0=[1,0,0], e1=[0,1,0], e2=zero-norm
    // (must drop from the bench array, not crash). Corpus: vec 10 is
    // a CLONE of e0 (max cos 1.0 -> c4 10000, flagged at 9000);
    // vec 11 is orthogonal to both (c4 0); vec 12 is zero-norm
    // (excluded -> label 3 has no row); vec 13 has max cos 0.8 vs e1
    // (c4 8000 -> NOT flagged at 9000: the threshold is strict).
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f), 0),
      (2L, Array(0f, 0f, 0f), 0),
      (10L, Array(1f, 0f, 0f), 1),
      (11L, Array(0f, 0f, 1f), 1),
      (12L, Array(0f, 0f, 0f), 3),
      (13L, Array(0.6f, 0.8f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity
      .semanticDecontaminate(emb, benchIds = 3, thetaC4 = 9000L)
      .collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_flagged"),
          r.getAs[Long]("max_c4"), r.getAs[Long]("sum_c4")))).toMap
    assert(rows.keySet == Set(1, 2), s"labels: ${rows.keySet}")
    assert(rows(1) == ((2L, 1L, 10000L, 10000L)))
    assert(rows(2) == ((1L, 0L, 8000L, 8000L)))
  }

  test("cross-modal near-dups: verdicts split both / embed_only / " +
      "text_only on a constructed consensus corpus") {
    import spark.implicits._
    // (1,2): identical text AND identical embedding -> both
    // (4,5): identical embedding, disjoint shingles    -> embed_only
    // (6,7): identical text, cos(v6,v7) = 0 < 0.9      -> text_only
    // (1,3)/(2,3): one shared shingle of three (0.33 < 0.5) -> absent
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "alpha beta gamma zeta eta"),
      (4L, "one two three four five"),
      (5L, "six seven eight nine ten"),
      (6L, "red green blue cyan magenta"),
      (7L, "red green blue cyan magenta"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f)), (5L, Array(0f, 0f, 1f, 0f)),
      (6L, Array(0f, 0f, 0f, 1f)), (7L, Array(0f, 1f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val rows = Dedup.crossModalNearDup(docs, emb, dfCap = 10,
        thetaText = 0.5, bands = 2, planesPerBand = 2, dim = 4,
        thetaEmbed = 0.9)
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
        r.getAs[String]("verdict")).toMap
    assert(rows == Map((1L, 2L) -> "both", (4L, 5L) -> "embed_only",
      (6L, 7L) -> "text_only"), s"got: $rows")
  }

  test("ann recall report: a neighbor assigned to an unprobed list " +
      "is counted as a miss, exact integer basis points") {
    import spark.implicits._
    // seeds: s0 at 0 deg, s1 at 45 deg; query q = v0 = s0 probes only
    // list0 (nProbe = 1). v2 (20 deg) assigns to list0; v3 (23 deg)
    // sits marginally closer to s1 (22 vs 23 deg) -> list1, yet is
    // q's #2 EXACT neighbor. IVF returns only {v2}: hits 1 of k=2,
    // recall 5000 bp.
    val emb = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.7f, 0.7f)),
      (2L, Array(0.93969f, 0.34202f)),
      (3L, Array(0.92050f, 0.39073f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.annRecallReport(emb, nLists = 2, nProbe = 1,
        nQueries = 1, k = 2)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("hits"),
        r.getAs[Long]("recall_bp"))).toSeq
    assert(rows == Seq((0L, 1L, 5000L)), s"got: $rows")
  }

  test("lang-id confusion: correct, mislabeled, and und cells land " +
      "in the right (actual, predicted) rows with exact class rates") {
    import spark.implicits._
    // "the thing" scores en-grams > 0, es-grams 0 -> pred 'en';
    // doc 2 carries ground truth 'es', so it must land in the
    // (es, en) miss cell; gram-free text predicts 'und'.
    val docs = Seq(
      (1L, "the thing", "en"),
      (2L, "the thing", "es"),
      (3L, "xyz zz", "de"))
      .toDF("doc_id", "text", "lang")
    val rows = graft.llm.TextAnalysis.langIdConfusion(docs).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_lang"),
          r.getAs[Double]("rate")))).toMap
    assert(rows == Map(
      ("en", "en") -> ((1L, 1L, 1.0)),
      ("es", "en") -> ((1L, 1L, 1.0)),
      ("de", "und") -> ((1L, 1L, 1.0))), s"got: $rows")
  }

  test("ivf list occupancy: exact per-list counts, shares, and " +
      "balance factors on a constructed 2-list corpus") {
    import spark.implicits._
    // seeds s0=(1,0), s1=(0,1) assign to themselves; v2, v4 argmax to
    // list 0, v3 to list 1 -> occupancy 3/2.5 = 1.2 and 2/2.5 = 0.8
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.1f, 0.9f)),
      (4L, Array(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.ivfListOccupancy(emb, nLists = 2).collect()
      .map(r => r.getAs[Long]("list_id") ->
        ((r.getAs[Long]("n_vectors"), r.getAs[Double]("share"),
          r.getAs[Double]("occupancy")))).toMap
    assert(rows == Map(0L -> ((3L, 0.6, 1.2)), 1L -> ((2L, 0.4, 0.8))),
      s"got: $rows")
  }

  test("ranker agreement: overlap and footrule equal the set algebra " +
      "of the two underlying rankings on an overlapping corpus") {
    import spark.implicits._
    // doc/vec 1 and 2 are both lexically AND semantically close to
    // query 0; the dense ranking inverts the lexical order (vec 2 is
    // the exact embedding match), so the footrule must be non-zero.
    val docs = Seq(
      (0L, "apple banana cherry"),
      (1L, "apple banana cherry"),
      (2L, "apple banana"),
      (3L, "unrelated words entirely"),
      (4L, "other stuff altogether"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f)),
      (1L, Array(0.9f, 0.43589f)),
      (2L, Array(1f, 0f)),
      (3L, Array(0f, 1f)),
      (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val k = 2
    val lex = graft.llm.TextAnalysis
      .bm25TopKUnsorted(docs, nQueries = 1, qTerms = 8, k = k)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank"))
      .toMap
    val den = Similarity.cosineTopKUnsorted(emb, nQueries = 1, k = k)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("rank"))
      .toMap
    val commonIds = lex.keySet.intersect(den.keySet)
    assert(commonIds.nonEmpty, "weak fixture: rankings share no ids")
    val expFr = commonIds.toSeq.map(i => math.abs(lex(i) - den(i)).toLong).sum
    assert(expFr > 0, "weak fixture: rankings agree on every rank")
    val rows = graft.llm.Retrieval
      .rankerAgreement(docs, emb, nQueries = 1, qTerms = 8, k = k)
      .collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("n_common") == commonIds.size.toLong)
    assert(rows(0).getAs[Long]("overlap_bp") ==
      commonIds.size.toLong * (10000 / k))
    assert(rows(0).getAs[Long]("footrule") == expFr)
  }

  test("decon agreement: one doc per verdict cell on a constructed " +
      "benchmark corpus, fixed 4-row report") {
    import spark.implicits._
    // bench = id 0 (text "a b c d e f", vec (1,0)). doc 1 shares a
    // 4-gram AND the embedding -> both; doc 2 shares only the
    // 4-gram -> ngram_only; doc 3 only the embedding ->
    // semantic_only; doc 4 neither.
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, "a b c d x y"),
      (2L, "b c d e q r"),
      (3L, "p q r s t u"),
      (4L, "v w x7 y7 z7 k"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0),
      (3L, Array(1f, 0f), 0),
      (4L, Array(0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val rows = Dedup.deconAgreement(docs, emb, benchIds = 1, n = 4,
        thetaC4 = 9000L)
      .collect()
      .map(r => r.getAs[String]("verdict") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(rows == Map("both" -> 1L, "ngram_only" -> 1L,
      "semantic_only" -> 1L, "neither" -> 1L), s"got: $rows")
  }

  test("filter funnel: fail / unique-fail / stage attribution match " +
      "a constructed corpus with one doc per failure mode") {
    import spark.implicits._
    // relaxed thresholds so 3-5-token docs are in range:
    //   d0 passes all; d1 fails ONLY r_count (2 tokens); d2 fails
    //   ONLY r_stop (no stopword); d3 fails r_alpha AND r_rep
    //   jointly (3x "11" + "the") -> unique=0 for both, funnel
    //   charges it to r_alpha (first failure in stage order).
    val docs = Seq(
      (0L, "the fast cat runs far"),
      (1L, "xx the"),
      (2L, "cat dog bird"),
      (3L, "11 11 11 the"))
      .toDF("doc_id", "text")
    val rows = graft.llm.TextAnalysis.filterFunnel(docs,
        minTokens = 3, maxTokens = 10, minWlen = 1.0, maxWlen = 10.0,
        minStop = 1, minAlpha = 0.5, repCap = 0.5)
      .collect()
      .map(r => (r.getAs[Int]("stage"), r.getAs[String]("rule"),
        r.getAs[Long]("n_fail"), r.getAs[Long]("n_fail_unique"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_remaining")))
    assert(rows.toSeq == Seq(
      (1, "r_count", 1L, 1L, 1L, 3L),
      (2, "r_wlen", 0L, 0L, 0L, 3L),
      (3, "r_stop", 1L, 1L, 1L, 2L),
      (4, "r_alpha", 1L, 0L, 1L, 1L),
      (5, "r_rep", 1L, 0L, 0L, 1L)), s"got: ${rows.toSeq}")
    // the funnel's survivor count is x77's keep count by construction
    val keep = graft.llm.TextAnalysis.gopherRules(docs,
        minTokens = 3, maxTokens = 10, minWlen = 1.0, maxWlen = 10.0,
        minStop = 1, minAlpha = 0.5, repCap = 0.5)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    assert(rows.last._6 == keep)
  }

  test("embed diversity: closed-form mean pairwise sqdist equals the " +
      "hand-computed brute force on a constructed corpus") {
    import spark.implicits._
    // label 0: (0,0), (1,0), (0,1) -> pair dists 1, 1, 2 -> mean 4/3;
    // centroid (1/3, 1/3) norm sqrt(2)/3; rms sqrt(2/3).
    // label 1: singleton -> mpd 0 by contract, norms = |v|.
    val emb = Seq(
      (0L, Array(0f, 0f), 0),
      (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0),
      (3L, Array(2f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.llm.Similarity.embedDiversity(emb).collect()
      .map(r => r.getAs[Int]("label") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("centroid_norm"),
          r.getAs[Double]("rms_norm"),
          r.getAs[Double]("mean_pairwise_sqdist"))))
      .toMap
    val (n0, c0, r0, m0) = rows(0)
    assert(n0 == 3L)
    assert(math.abs(c0 - math.sqrt(2.0) / 3) < 1e-6)
    assert(math.abs(r0 - math.sqrt(2.0 / 3)) < 1e-6)
    assert(math.abs(m0 - 4.0 / 3) < 1e-6)
    assert(rows(1) == ((1L, 2.0, 2.0, 0.0)))
  }

  test("bpe fertility: per-lang token/word/char ratios match hand " +
      "computation under a 1-round merge table") {
    import spark.implicits._
    // round 1 fuses (a,b) (freq 3): "ab" -> 1 token, "cd" -> 2.
    // en: 3 words, 4 tokens, 6 chars -> fert 13333 bp, cpt 15000 bp.
    // fr: 1 word, 1 token, 2 chars -> fert 10000 bp, cpt 20000 bp.
    val docs = Seq(
      (0L, "ab ab cd", "en"),
      (1L, "ab", "fr"))
      .toDF("doc_id", "text", "lang")
    val path = java.nio.file.Files
      .createTempDirectory("fert").toString + "/bpe"
    val rows = graft.llm.Bpe.fertility(docs, path, rounds = 1)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_words"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("total_chars"),
          r.getAs[Long]("fertility_bp"),
          r.getAs[Long]("chars_per_token_bp"))))
      .toMap
    assert(rows("en") == ((1L, 3L, 4L, 6L, 13333L, 15000L)),
      s"got: ${rows("en")}")
    assert(rows("fr") == ((1L, 1L, 1L, 2L, 10000L, 20000L)),
      s"got: ${rows("fr")}")
  }

  test("lsh planner: per-config expected counts equal the hand-" +
      "evaluated S-curve over a constructed pair set") {
    import spark.implicits._
    // d0 = d1 (jaccard 1.0, a true dup); d2 shares 1 of 5 union
    // shingles with each (jaccard 0.2, a borderline candidate).
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e"),
      (2L, "a b c x y"))
      .toDF("doc_id", "text")
    def sq(x: Double, k: Int): Double =
      (1 to k).foldLeft(x)((a, _) => a * a)
    // (bands, rows, log2 r, log2 b) — must mirror Dedup.lshGrid
    val grid = Seq((64, 2, 1, 6), (32, 4, 2, 5), (16, 8, 3, 4),
      (8, 16, 4, 3), (4, 32, 5, 2))
    val rows = graft.llm.Dedup.lshPlanner(docs, dfCap = 10,
        threshold = 0.2, dupTheta = 0.8)
      .collect()
      .map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_dups"),
          r.getAs[Long]("caught_nano"), r.getAs[Long]("missed_dup_nano"),
          r.getAs[Long]("spurious_nano"))))
      .toMap
    assert(rows.size == 5)
    grid.foreach { case (b, r, kr, kb) =>
      val p02 = 1.0 - sq(1.0 - sq(0.2, kr), kb)
      val nano = math.round(p02 * 1e9)
      assert(rows((b, r)) ==
        ((3L, 1L, 1000000000L + 2 * nano, 0L, 2 * nano)),
        s"config ($b, $r): got ${rows((b, r))}, p(0.2) = $p02")
    }
  }

  test("planned minhash: executes the planner's argmin config and " +
      "surfaces the exact-dup pair in every band") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d e"),
      (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    // independent argmin over the planner table
    val planned = graft.llm.Dedup.lshPlanner(docs, dfCap = 10,
        threshold = 0.2, dupTheta = 0.8).collect()
      .map(r => ((r.getAs[Long]("missed_dup_nano") +
        r.getAs[Long]("spurious_nano"), r.getAs[Int]("rows_per_band")),
        (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))))
      .minBy(_._1)._2
    val out = graft.llm.Dedup.plannedMinhash(docs, dfCap = 10,
      threshold = 0.2, dupTheta = 0.8).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert((r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band"))
        == planned, "executed config != planner argmin")
    }
    // identical docs agree on EVERY permutation minimum, so they
    // share a bucket in every one of the chosen `bands` bands; doc 2
    // shares no shingle, so no bucket holds 3
    val dupBuckets = out.filter(r => r.getAs[Long]("d_min") == 0L &&
      r.getAs[Long]("d_max") == 1L)
    assert(dupBuckets.length == planned._1,
      s"expected ${planned._1} dup buckets, got ${dupBuckets.length}")
    assert(out.forall(_.getAs[Long]("n_docs") == 2L))
  }

  test("planned minhash: a corpus with no calibration pairs yields " +
      "an empty (not crashing) bucket table") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "x y z")).toDF("doc_id", "text")
    assert(graft.llm.Dedup.plannedMinhash(docs, dfCap = 10,
      threshold = 0.2, dupTheta = 0.8).count() == 0L)
  }

  test("signal correlation: per-source Pearson matches an exact " +
      "BigInt recomputation from the underlying x08/x41 signals") {
    import spark.implicits._
    val docs = Seq(
      (0L, "aa bb cc dd ee ff", "en", "s1"),
      (1L, "aa aa aa aa bb cc", "en", "s1"),
      (2L, "zz yy xx ww vv uu tt ss", "en", "s1"),
      (3L, "aa bb aa bb aa bb cc dd", "en", "s1"),
      (4L, "qq rr", "en", "s2"),
      (5L, "qq qq qq rr", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val q = graft.llm.TextAnalysis.quality(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens").toLong,
          math.round(r.getAs[Double]("uniq_ratio") * 1e6))))
      .toMap
    val p = graft.llm.LanguageModel.trigramPerplexity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        math.round(r.getAs[Double]("avg_nll") * 1e6))
      .toMap
    val bySource = Map(
      "s1" -> Seq(0L, 1L, 2L, 3L), "s2" -> Seq(4L, 5L))
    def pearson(xs: Seq[BigInt], ys: Seq[BigInt]): Double = {
      val n = BigInt(xs.size)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val den = (n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble
      if (den > 0)
        math.floor((n * sxy - sx * sy).toDouble / math.sqrt(den) * 1e6
          + 0.5) / 1e6
      else 0.0
    }
    val rows = graft.llm.LanguageModel.signalCorrelation(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("r_uniq_nll"),
          r.getAs[Double]("r_len_nll"))))
      .toMap
    bySource.foreach { case (src, ids) =>
      val us = ids.map(i => BigInt(q(i)._2))
      val ts = ids.map(i => BigInt(q(i)._1))
      val ys = ids.map(i => BigInt(p(i)))
      val (n, ru, rl) = rows(src)
      assert(n == ids.size.toLong)
      assert(math.abs(ru - pearson(us, ys)) < 1e-9,
        s"$src r_uniq_nll: got $ru want ${pearson(us, ys)}")
      assert(math.abs(rl - pearson(ts, ys)) < 1e-9,
        s"$src r_len_nll: got $rl want ${pearson(ts, ys)}")
    }
    // the corpus is constructed so at least one correlation is
    // genuinely informative (not 0, not saturated at +/-1)
    val r1 = rows("s1")._2
    assert(r1 != 0.0 && math.abs(r1) < 1.0, s"degenerate r: $r1")
  }

  test("cluster size histogram: multiplicity rows match a planted " +
      "3-cluster plus singleton") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (9L, "utterly different content entirely here now"))
      .toDF("doc_id", "text")
    val rows = graft.llm.Dedup.clusterSizeHistogram(docs, maxDist = 3)
      .collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_removable")))
    assert(rows.toSeq == Seq((1L, 1L, 1L, 0L), (3L, 1L, 3L, 2L)),
      s"got: ${rows.toSeq}")
  }

  test("char entropy: hand-computed bigram entropies roll up per " +
      "source (degenerate 0-bit doc and uniform log2(3)-bit docs)") {
    import spark.implicits._
    // "aaaa": 3x the same bigram -> H = 0 exactly.
    // "abcd" / "aabb": 3 distinct bigrams -> H = log2(3) = 1.584963.
    val docs = Seq(
      (0L, "aaaa", "s1"),
      (1L, "abcd", "s1"),
      (2L, "aabb", "s2"))
      .toDF("doc_id", "text", "source")
    val rows = graft.llm.TextAnalysis.charEntropy(docs, lowTheta = 5.9)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("mean_entropy"),
          r.getAs[Double]("min_entropy"), r.getAs[Double]("max_entropy"),
          r.getAs[Long]("n_low"))))
      .toMap
    val l3 = BigDecimal(math.log(3.0) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mean1 = BigDecimal(math.round(l3 * 1e6).toDouble / 2 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows("s1") == ((2L, mean1, 0.0, l3, 2L)), s"got: ${rows("s1")}")
    assert(rows("s2") == ((1L, l3, l3, l3, 1L)), s"got: ${rows("s2")}")
  }

  test("unimax mix: waterfill threshold, remainder placement, and " +
      "all-saturated underfill match hand computation") {
    import spark.implicits._
    // tokens {s1: 10, s2: 100, s3: 1000}, maxEpochs 2 ->
    // caps {20, 200, 2000}
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, words(10), "s1"),
      (1L, words(100), "s2"),
      (2L, words(1000), "s3"))
      .toDF("doc_id", "text", "source")
    def run(b: Long): Map[String, (Long, Long, Boolean)] =
      graft.llm.Sampling.unimaxMix(docs, budget = b, maxEpochs = 2)
        .collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("alloc"), r.getAs[Long]("epochs_bp"),
            r.getAs[Boolean]("saturated"))))
        .toMap
    // B=300: s1 saturates at 20; s2/s3 split 280 equally
    assert(run(300L) == Map(
      "s1" -> ((20L, 20000L, true)),
      "s2" -> ((140L, 14000L, false)),
      "s3" -> ((140L, 1400L, false))))
    // B=301: the 1-token remainder goes to the lowest-ranked
    // unsaturated source (s2)
    assert(run(301L) == Map(
      "s1" -> ((20L, 20000L, true)),
      "s2" -> ((141L, 14100L, false)),
      "s3" -> ((140L, 1400L, false))))
    // B=5000 > sum(cap)=2220: everything saturates, visible underfill
    val full = run(5000L)
    assert(full == Map(
      "s1" -> ((20L, 20000L, true)),
      "s2" -> ((200L, 20000L, true)),
      "s3" -> ((2000L, 20000L, true))))
  }

  test("pack efficiency: closed-form bins/fill/crossings match hand " +
      "computation for a 3-doc stream at two capacities") {
    import spark.implicits._
    // token counts 3, 4, 5 -> offsets [0,2], [3,6], [7,11], total 12
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, words(3)), (1L, words(4)), (2L, words(5)))
      .toDF("doc_id", "text")
    val rows = graft.llm.Packing.packEfficiency(docs, caps = Seq(4, 8))
      .collect()
      .map(r => r.getAs[Int]("capacity") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_bins"), r.getAs[Long]("fill_bp"),
          r.getAs[Long]("n_crossing"), r.getAs[Long]("crossing_bp"))))
      .toMap
    // cap 4: 3 bins exactly full; docs 1 and 2 straddle multiples
    assert(rows(4) == ((3L, 12L, 3L, 10000L, 2L, 6666L)),
      s"got: ${rows(4)}")
    // cap 8: 2 bins, 12/16 fill; only doc 2 straddles offset 8
    assert(rows(8) == ((3L, 12L, 2L, 7500L, 1L, 3333L)),
      s"got: ${rows(8)}")
  }

  test("dup source matrix: identical docs roll up by unordered " +
      "source pair with exact micro-jaccard") {
    import spark.implicits._
    // docs 1/2 identical across (srcB, srcA) -> one inter-source
    // pair at jaccard 1.0; docs 3/4 identical inside srcA -> one
    // intra-source pair; doc 5 shares nothing
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "one two three four five six seven"
    val docs = Seq(
      (1L, a, "srcB"), (2L, a, "srcA"),
      (3L, b, "srcA"), (4L, b, "srcA"),
      (5L, "totally unrelated content goes right here", "srcC"))
      .toDF("doc_id", "text", "source")
    val rows = Dedup.dupSourceMatrix(docs, dfCap = 10, threshold = 0.2)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("mean_jac_micro"),
          r.getAs[Long]("max_jac_micro"))))
      .toMap
    assert(rows == Map(
      ("srcA", "srcB") -> ((1L, 1000000L, 1000000L)),
      ("srcA", "srcA") -> ((1L, 1000000L, 1000000L))))
  }

  test("vocab sizing: smallest covering cut per target matches hand " +
      "computation with monotone covered mass") {
    import spark.implicits._
    // counts a:6 b:2 c:1 d:1 -> total 10; cum by rank: 6, 8, 9, 10
    val docs = Seq((1L, "a a a a a a b b c d"))
      .toDF("doc_id", "text")
    val rows = graft.llm.TextAnalysis
      .vocabSizing(docs, targets = Seq(50, 90, 95, 99))
      .collect()
      .map(r => r.getAs[Int]("pct") ->
        ((r.getAs[Long]("vocab_size"), r.getAs[Long]("covered_tokens"),
          r.getAs[Long]("n_total"), r.getAs[Long]("n_vocab"),
          r.getAs[Long]("covered_micro"))))
      .toMap
    assert(rows(50) == ((1L, 6L, 10L, 4L, 600000L)))
    assert(rows(90) == ((3L, 9L, 10L, 4L, 900000L)))
    assert(rows(95) == ((4L, 10L, 10L, 4L, 1000000L)))
    assert(rows(99) == ((4L, 10L, 10L, 4L, 1000000L)))
  }

  test("length histogram: bit-length buckets carry exact doc/token " +
      "counts and closed-form bounds") {
    import spark.implicits._
    def words(n: Int): String = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, words(1), "srcA"), (2L, words(3), "srcA"),
      (3L, words(3), "srcA"), (4L, words(8), "srcB"))
      .toDF("doc_id", "text", "source")
    val rows = graft.llm.TextAnalysis.lengthHistogram(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("bucket")) ->
        ((r.getAs[Long]("lo_tokens"), r.getAs[Long]("hi_tokens"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))))
      .toMap
    assert(rows == Map(
      ("srcA", 1) -> ((1L, 1L, 1L, 1L)),
      ("srcA", 2) -> ((2L, 3L, 2L, 6L)),
      ("srcB", 4) -> ((8L, 15L, 1L, 8L))))
  }

  test("hapax report: frequency-of-frequency counts and Good-Turing " +
      "share match hand computation") {
    import spark.implicits._
    // srcA freqs: a:2 b:2 c:1 d:1 -> tokens 6, vocab 4, hapax 2, dis 2
    val docs = Seq(
      (1L, "a a b c", "srcA"), (2L, "b d", "srcA"))
      .toDF("doc_id", "text", "source")
    val r = graft.llm.TextAnalysis.hapaxReport(docs).collect()
    assert(r.length == 1)
    val row = r.head
    assert((row.getAs[Long]("n_tokens"), row.getAs[Long]("n_vocab"),
      row.getAs[Long]("n_hapax"), row.getAs[Long]("n_dis"),
      row.getAs[Long]("hapax_vocab_bp"), row.getAs[Long]("p_new_micro"))
      == ((6L, 4L, 2L, 2L, 5000L, 333333L)))
  }

  test("quality budget selection: keep frontier walks the score " +
      "ranking and the straddling doc is kept") {
    import spark.implicits._
    // scores (uniq millionths): d1 1000000, d3 500000, d2 250000;
    // 4 tokens each. cum_before in rank order: d1 0, d3 4, d2 8.
    // budget 5 keeps d1 (0<5) and the straddling d3 (4<5), drops d2.
    val docs = Seq(
      (1L, "a b c d", "srcA"), (2L, "a a a a", "srcA"),
      (3L, "a b a b", "srcB"))
      .toDF("doc_id", "text", "source")
    val rows = graft.llm.Sampling
      .qualityBudgetSelect(docs, budget = 5L)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("kept_docs"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("kept_tokens"),
          r.getAs[Long]("kept_docs_bp"), r.getAs[Long]("kept_tokens_bp"))))
      .toMap
    assert(rows == Map(
      "srcA" -> ((2L, 1L, 8L, 4L, 5000L, 5000L)),
      "srcB" -> ((1L, 1L, 4L, 4L, 10000L, 10000L))))
  }

  test("boilerplate grams: per-source top-k by doc frequency with " +
      "lexicographic tie-break and per-doc distinctness") {
    import spark.implicits._
    // srcA: "x y" in docs 1,2,3 (df 3 — doc 3 repeats it, counted
    // once); "y z" in docs 1,2 (df 2); "z w" in doc 1 only (df 1,
    // cut by minDf). srcB: "p q" and "q r" both df 2 — tie broken
    // lexicographically, "p q" first.
    val docs = Seq(
      (1L, "x y z w", "srcA"), (2L, "x y z", "srcA"),
      (3L, "x y x y", "srcA"),
      (4L, "p q r", "srcB"), (5L, "p q r", "srcB"))
      .toDF("doc_id", "text", "source")
    val rows = graft.llm.TextAnalysis
      .boilerplateGrams(docs, n = 2, minDf = 2, k = 3)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rank")) ->
        ((r.getAs[String]("gram"), r.getAs[Long]("df"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("df_bp"))))
      .toMap
    assert(rows == Map(
      ("srcA", 1) -> (("x y", 3L, 3L, 10000L)),
      ("srcA", 2) -> (("y z", 2L, 3L, 6666L)),
      ("srcB", 1) -> (("p q", 2L, 2L, 10000L)),
      ("srcB", 2) -> (("q r", 2L, 2L, 10000L))),
      s"got: $rows")
  }

  test("source divergence: identical distributions score BC ~ 1e9 " +
      "and skewed ones match the hand-computed Bhattacharyya sum") {
    import spark.implicits._
    // srcA {a:2, b:1}/3, srcB {a:1, b:3}/4, srcC == srcA.
    // (A,B): sqrt(2/12)=0.408248290..., sqrt(3/12)=0.5 -> bc 908248290
    // (A,C): sqrt(4/9)+sqrt(1/9) = 2/3 + 1/3 -> 666666667+333333333 = 1e9
    val docs = Seq(
      (1L, "a a b", "srcA"), (2L, "a b b b", "srcB"),
      (3L, "a a b", "srcC"))
      .toDF("doc_id", "text", "source")
    val rows = graft.llm.TextAnalysis.sourceDivergence(docs)
      .collect()
      .map(r => (r.getAs[String]("s1"), r.getAs[String]("s2")) ->
        ((r.getAs[Long]("n_common"), r.getAs[Long]("bc_nano"),
          r.getAs[Long]("h2_nano"))))
      .toMap
    assert(rows(("srcA", "srcC")) == ((2L, 1000000000L, 0L)))
    assert(rows(("srcA", "srcB")) == ((2L, 908248290L, 91751710L)))
    assert(rows(("srcB", "srcC")) == ((2L, 908248290L, 91751710L)))
  }

  test("dedup threshold sweep: pair counts, removable docs and token " +
      "mass step down as the threshold rises") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta"          // 6 tokens
    val b = "one two three four five six seven"            // 7 tokens
    val a2 = a + " eta theta"                              // 8 tokens
    // pairs: (1,2) jm 1000000; (3,4) jm 1000000;
    // (1,6)/(2,6) share 4 of 6 union grams -> jm 666667; doc 5 none
    val docs = Seq(
      (1L, a, "s"), (2L, a, "s"), (3L, b, "s"), (4L, b, "s"),
      (5L, "totally unrelated content goes right here", "s"),
      (6L, a2, "s"))
      .toDF("doc_id", "text", "source")
    val rows = graft.llm.Dedup
      .dedupThresholdSweep(docs, dfCap = 10,
        thrMicro = Seq(200000L, 800000L))
      .collect()
      .map(r => r.getAs[Long]("thr_micro") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_removable_docs"),
          r.getAs[Long]("tokens_removable"))))
      .toMap
    assert(rows == Map(
      200000L -> ((4L, 3L, 21L)),
      800000L -> ((2L, 2L, 13L))),
      s"got: $rows")
  }

  test("embedding coverage: covered / missing / orphan statuses roll " +
      "up per source off the full outer join") {
    import spark.implicits._
    // mods above the 16-bit hash range disable the harness slicing
    // (hash16 < 65536, so % 100000 == 0 only for hash 0 — none here)
    val docs = Seq(
      (1L, "t", "srcA"), (2L, "t", "srcA"),
      (3L, "t", "srcB"), (4L, "t", "srcB"))
      .toDF("doc_id", "text", "source")
    val emb = Seq(
      (1L, Array(1.0f), 0), (2L, Array(1.0f), 0), (99L, Array(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val rows = graft.llm.Diagnostics
      .embeddingCoverage(docs, emb, missMod = 100000, orphMod = 100000)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("status")) ->
        r.getAs[Long]("n"))
      .toMap
    assert(rows == Map(
      ("srcA", "covered") -> 2L,
      ("srcB", "missing_vec") -> 2L,
      ("__orphan", "orphan_vec") -> 1L),
      s"got: $rows")
  }

  test("leak attribution: worst contaminator and totals per benchmark " +
      "doc, clean items report zeros") {
    import spark.implicits._
    // bench 0 "a b c": grams {a b, b c}; bench 1 "zz yy": {zz yy}.
    // corpus 10 shares 2 grams with bench 0, corpus 11 shares 1,
    // corpus 12 none; nothing touches bench 1.
    val docs = Seq(
      (0L, "a b c"), (1L, "zz yy"),
      (10L, "a b c d"), (11L, "x a b"), (12L, "q w e"))
      .toDF("doc_id", "text")
    val rows = graft.llm.Dedup
      .leakAttribution(docs, benchIds = 2, n = 2)
      .collect()
      .map(r => r.getAs[Long]("bench_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_hits"),
          Option(r.getAs[java.lang.Long]("top_doc")),
          Option(r.getAs[java.lang.Long]("top_hits")))))
      .toMap
    assert(rows(0L) == ((2L, 3L, Some(10L), Some(2L))), s"got ${rows(0L)}")
    assert(rows(1L) == ((0L, 0L, None, None)), s"got ${rows(1L)}")
  }

  test("minhash index health: shared buckets, singletons and the " +
      "candidate-pair bill per band") {
    import spark.implicits._
    val t = "aa bb cc dd"
    val docs = Seq((1L, t), (2L, t), (3L, "ee ff gg hh"))
      .toDF("doc_id", "text")
    val rows = graft.llm.Dedup.minhashIndexHealth(docs, bands = 2)
      .collect()
      .map(r => r.getAs[Int]("b") ->
        ((r.getAs[Long]("n_sigs"), r.getAs[Long]("n_buckets"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("n_singletons"),
          r.getAs[Long]("cand_pairs"), r.getAs[Long]("mean_size_bp"))))
      .toMap
    // per band: docs 1/2 share a bucket, doc 3 is a singleton
    val want = ((3L, 2L, 2L, 1L, 1L, 15000L))
    assert(rows == Map(0 -> want, 1 -> want), s"got: $rows")
  }

  test("semantic decontamination: empty benchmark slice yields an " +
      "EMPTY report (oracle parity), not a crash") {
    import spark.implicits._
    val emb = Seq((10L, Array(1f, 0f, 0f), 1), (11L, Array(0f, 1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity
      .semanticDecontaminate(emb, benchIds = 0, thetaC4 = 1L)
      .collect()
    // no scoreable benchmark vector → nothing can be SCORED, so no
    // rows: the oracle's CROSS JOIN against an empty bench emits
    // none, and the batch path drops its NULL-c4 rows to agree
    // (ADVICE r9 — the previous per-label NULL-moment row silently
    // diverged from the oracle in exactly this config)
    assert(rows.isEmpty)
  }
}
