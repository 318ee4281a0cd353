package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of the text-curation surface
  * (graft.llm.TextAnalysis / Dedup / QualityClassifier): a document
  * feed — crawl output landing in object storage — filtered the same
  * way the batch pipeline curates, with identical formulas so batch
  * and stream decisions agree bit-for-bit.
  *
  * Everything here is STATELESS per row (projection/filter) except
  * content dedup, so the operators compose into a readStream →
  * curate → writeStream pipeline with no watermark coupling; at
  * 100 TB/day the stateless stages scale with executors and only the
  * dedup stage carries state.
  */
object DocumentsStream {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Stateless quality verdict — same formulas as
    * TextAnalysis.quality, so the stream keeps exactly the documents
    * the batch pipeline would keep.
    */
  def qualityFilter(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", split(col("text"), " "))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("uniq_ratio",
        size(array_distinct(col("t"))).cast("double") / col("n_tokens"))
      .withColumn("verdict",
        when(col("n_tokens") < 20, "too_short")
          .when(col("uniq_ratio") < 0.3, "repetitive")
          .otherwise("keep"))
      .drop("t")

  /** Apply a trained quality classifier (QualityClassifier.trainScore
    * output: standardization stats + weights) to the stream — the
    * train-in-batch / serve-in-stream shape. Pure codegen projection;
    * the model rides in as literals, nothing is joined or shuffled.
    */
  def applyClassifier(docs: DataFrame, mu: Array[Double],
      sd: Array[Double], w: Array[Double]): DataFrame = {
    val swArray = graft.llm.TextAnalysis.stopwords.map(s => s"'$s'")
      .mkString("array(", ", ", ")")
    val x = Seq(
      log(lit(1) + size(col("t"))),
      (length(col("text")) - (size(col("t")) - 1)).cast("double") /
        size(col("t")),
      size(array_distinct(col("t"))).cast("double") / size(col("t")),
      expr(s"size(filter(t, v -> array_contains($swArray, v)))")
        .cast("double") / size(col("t")))
    // standardize into the z1..z4 columns QualityClassifier.margin
    // expects, so batch and stream share one margin expression (same
    // float association order → bit-identical probabilities)
    val withZ = docs
      .withColumn("t", split(col("text"), " "))
    val zCols = x.zipWithIndex.map { case (c, j) =>
      ((c - lit(mu(j))) / lit(sd(j))).as(s"z${j + 1}")
    }
    withZ.select(col("*") +: zCols: _*)
      .withColumn("prob", round(lit(1.0) /
        (lit(1.0) + exp(-graft.llm.QualityClassifier.margin(w))), 6))
      .withColumn("pred", col("prob") > 0.5)
      .drop("t", "z1", "z2", "z3", "z4")
  }

  /** Streaming exact content dedup: first arrival of each md5(text)
    * digest wins. State is one digest per distinct document; on an
    * unbounded feed, bound it by re-keying on (digest, arrival day)
    * or an ingest-time watermark + dropDuplicatesWithinWatermark —
    * the harness table carries no event time, so the twin keeps the
    * unbounded form.
    */
  def dedupByContent(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .dropDuplicates("digest")

  /** Stateless decontamination: drop documents sharing any word
    * n-gram with the (small, driver-resident) benchmark gram set —
    * the eval set is bounded by construction, so it travels as a
    * literal array and the stream needs no join at all.
    */
  def decontaminate(docs: DataFrame, benchGrams: Seq[String],
      n: Int): DataFrame = {
    val lits = array(benchGrams.map(lit): _*)
    docs
      .withColumn("t", split(col("text"), " "))
      // a doc shorter than n tokens has no n-grams and cannot be
      // contaminated — it must pass through (batch parity), not be
      // dropped by the gram computation
      .withColumn("grams",
        when(size(col("t")) >= n, array_distinct(expr(
          s"transform(sequence(0, size(t)-$n), i -> concat_ws(' ', slice(t, i+1, $n)))")))
          .otherwise(array().cast("array<string>")))
      .filter(!arrays_overlap(col("grams"), lits))
      .drop("t", "grams")
  }

  /** Running corpus-health rollup — the streaming half of
    * TextAnalysis.corpusHealth: per-source document counts, quality
    * keep counts, quantized-uniqueness sums, and char volume as an
    * UPDATE-mode stateful aggregation (state = one row per source, a
    * dimension — bounded by the domain list, not the feed). The
    * per-document formulas are identical to the batch operator, so
    * after the stream drains, every sum equals the batch rollup
    * exactly; the distinct-content count is deliberately absent (it
    * needs dedup state — compose [[dedupByContent]] upstream or the
    * KMV sketch for an estimate).
    */
  def corpusHealthRunning(docs: DataFrame): DataFrame =
    graft.llm.TextAnalysis.healthProjection(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_keep"),
        sum(col("uq6")).as("s_uq6"), sum(col("n_chars")).as("total_chars"))

  /** Stateless ingest shard assignment — the stream half of
    * Packing.shardShuffle: the same hash16(key) % shards arithmetic,
    * so a document ingested through the stream lands in exactly the
    * shard the batch shuffle would assign (the in-shard position is a
    * batch-time total order and stays a batch concern; the stream's
    * job is routing new arrivals to the right shard file).
    */
  def shardAssign(docs: DataFrame, keyExpr: String, shards: Int): DataFrame =
    docs.withColumn("shard",
      expr(s"(${graft.llm.Dedup.hash16FastExpr(keyExpr)} % $shards)")
        .cast("int"))

  /** Running per-source count table — the streaming half of
    * temperature-mix allocation (llm.Sampling.temperatureMix):
    * UPDATE-mode stateful aggregation whose state is one row per
    * source (a dimension, bounded by the domain list). At drain or
    * checkpoint time [[temperatureQuotas]] turns the counts into the
    * exact batch allocation.
    */
  def sourceCountsRunning(docs: DataFrame): DataFrame =
    docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))

  /** Drain-time finisher: the same largest-remainder apportionment as
    * the batch operator, over the drained running counts — a
    * |sources|-row computation, so running it per micro-batch
    * checkpoint is free. Batch parity: identical counts → identical
    * quotas, bit for bit.
    */
  def temperatureQuotas(counts: DataFrame, budget: Int,
      tau: Double = 0.7): DataFrame =
    graft.llm.Sampling.allocations(counts, budget, tau)

  /** Stateless ingest half of length-sorted batching
    * (llm.Packing.sortedBatches): per-arrival token counts with the
    * batch operator's exact split arithmetic. The drained count table
    * feeds Packing.batchesFromTokenCounts for the global rank-and-cut
    * (a batch/drain-time concern by nature — the batch index of a
    * document depends on every other document's length).
    */
  def tokenCountsOnIngest(docs: DataFrame): DataFrame =
    graft.llm.Packing.tokenCounts(docs)

  /** Stateless length-bucket routing against FIXED boundaries (e.g. a
    * batch-computed quantile snapshot riding along as literals — the
    * train-in-batch / serve-in-stream shape): bucket = number of
    * boundaries strictly below the arrival's token count. Arrivals
    * with near-equal lengths land in the same bucket, so pad-to-
    * longest batches can form within buckets as they fill without any
    * global order.
    */
  def lengthBucketAssign(docs: DataFrame, bounds: Seq[Long]): DataFrame = {
    val nTok = size(split(col("text"), " ")).cast("long")
    val bucket = bounds.sorted.foldLeft(lit(0)) { (acc, b) =>
      acc + when(nTok > lit(b), 1).otherwise(0)
    }
    docs.withColumn("n_tokens", nTok).withColumn("bucket", bucket)
  }

  /** Running word-count table — the streaming half of the
    * vocabulary behind OOV scoring (llm.TextAnalysis.vocabCoverage):
    * UPDATE-mode stateful aggregation keyed by word. State is the
    * corpus vocabulary — Heaps-law-bounded for natural text; bound it
    * hard with a frequency floor or the Misra–Gries sketch upstream
    * when the token space is adversarial.
    */
  def vocabCountsRunning(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Drain-time finisher: the exact batch top-V cut over the drained
    * running counts (shared definition — TextAnalysis.topVocab).
    */
  def vocabTopV(counts: DataFrame, vocabSize: Int): DataFrame =
    graft.llm.TextAnalysis.topVocab(counts, vocabSize)

  /** Running (source, token) count table — the streaming half of the
    * x129 source-divergence matrix: UPDATE-mode stateful aggregation
    * keyed by (source, token). State is per-source vocabulary
    * (Heaps-law-bounded for natural text, same bound as
    * [[vocabCountsRunning]]).
    */
  def tfCountsRunning(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))

  /** Drain-time finisher: the exact batch Bhattacharyya/Hellinger
    * matrix over the drained counts (shared definition —
    * TextAnalysis.divergenceFromTf, the x129 pair pricing).
    */
  def divergenceAtDrain(tf: DataFrame): DataFrame =
    graft.llm.TextAnalysis.divergenceFromTf(tf)

  /** Stateless OOV serving against a FIXED vocabulary (the batch/
    * drained top-V riding along as literals — train-in-batch /
    * serve-in-stream, like [[applyClassifier]]): per arrival, the
    * same token count and in-vocabulary fraction as the batch
    * operator, no join, no shuffle.
    */
  def oovScore(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val lits = array(vocab.map(lit): _*)
    docs
      .withColumn("t",
        filter(split(col("text"), " "), w => w =!= ""))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        size(filter(col("t"), w => array_contains(lits, w)))
          .cast("long").as("n_in_vocab"))
      .withColumn("oov_ratio",
        round(lit(1.0) - col("n_in_vocab") / col("n_tokens"), 6))
  }

  /** Stateless bloom prescreen — the stream half of
    * operators.BloomPrune: a batch-built filter over already-ingested
    * content keys rides into every task as a literal map (≤ bits/64
    * entries, bytes regardless of corpus size) and drops arrivals
    * that are POSSIBLY seen. No false negatives: a kept row is
    * definitely new, so the exact dedup state behind this prescreen
    * only ever sees the bloom's false-positive rate worth of load.
    * The probe bits are materialized once per row (withProbes), so
    * the per-arrival cost is exactly k md5 hashes.
    */
  def bloomPrescreen(docs: DataFrame, bloom: Map[Int, Long],
      keyExpr: String, bits: Int, k: Int): DataFrame = {
    val (probed, pass) = graft.operators.BloomPrune.withProbes(
      docs.withColumn("bloom", typedLit(bloom)), keyExpr, bits, k)
    probed.filter(!pass)
      .drop("bloom")
      .drop(graft.operators.BloomPrune.probeCols(k): _*)
  }

  /** Running Count–Min sketch — the streaming half of
    * HeavyHitters.cmEstimates (x61): the SAME global cm_sketch
    * aggregation as the batch operator, run COMPLETE-mode over the
    * ingest token stream. State is the one depth×width long grid
    * (bytes, regardless of feed size), and because the merge is an
    * elementwise sum the drained sketch is bit-equal to the batch
    * sketch over the same corpus; [[cmEstimatesAtDrain]] then answers
    * point queries through the shared estimate machinery.
    */
  def cmSketchRunning(docs: DataFrame, depth: Int, width: Int): DataFrame =
    graft.llm.HeavyHitters.cmSketch(docs, depth, width)

  /** Running HyperLogLog registers — the streaming half of x79: the
    * SAME (source, idx) max-register aggregation as the batch
    * operator (Hll.registers), run COMPLETE-mode over the ingest
    * token stream. State is ≤ |sources|·256 register rows (bytes,
    * regardless of feed size), and because max IS the HLL merge the
    * drained register table is bit-equal to the batch one over the
    * same corpus; [[hllEstimatesAtDrain]] then produces the x79
    * estimates through the shared finisher.
    */
  def hllRegistersRunning(docs: DataFrame): DataFrame =
    graft.llm.Hll.registers(docs)

  /** Drain-time finisher: per-source + merged-'ALL' estimates from a
    * drained register table, identical to the batch x79 estimate
    * stage (exact-distinct validation columns excluded — exactness
    * over an unbounded stream is precisely what the sketch replaces).
    */
  def hllEstimatesAtDrain(drainedRegs: DataFrame): DataFrame =
    graft.llm.Hll.estimatesFromRegisters(drainedRegs)

  /** Drain-time finisher: point estimates + exact verify from a
    * drained sketch row, identical to the batch x61 output.
    */
  def cmEstimatesAtDrain(batchDocs: DataFrame, drainedSketch: DataFrame,
      depth: Int, width: Int): DataFrame =
    graft.llm.HeavyHitters.cmEstimatesFromCells(batchDocs,
      graft.llm.HeavyHitters.cmSketchCells(drainedSketch), depth, width)

  /** Running PSI drift counts — the streaming half of x82 and the
    * op's actual production shape: drift monitoring belongs on LIVE
    * ingest, against a FROZEN baseline distribution
    * (TextAnalysis.psiBaseline — the top-v corpus tokens + total).
    * Each arrival's tokens map to their baseline bucket (top-v word,
    * or OTHER via the stream-static left join) and feed a
    * COMPLETE-mode (source, bucket) count — state is ≤
    * |sources|·(v+1) rows regardless of feed size.
    */
  def psiCountsRunning(docs: DataFrame, baseline: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .join(baseline.select(col("w"), lit(true).as("topv")), Seq("w"),
        "left")
      .withColumn("bucket",
        when(col("topv"), col("w")).otherwise(lit(" OTHER")))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("cp"))

  /** Drain-time finisher: per-source PSI against the frozen baseline
    * from the drained counts — the x82 grid completion (sources ×
    * top-v, zeros filled) and the shared integer-nano term
    * arithmetic, so a stream that replays the baseline corpus drains
    * to EXACTLY the batch x82 psi values.
    */
  def psiAtDrain(drainedCounts: DataFrame, baseline: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, sum => fsum}
    val nq = baseline.select(col("nq")).distinct()
    val ns = drainedCounts.groupBy(col("source"))
      .agg(fsum(col("cp")).as("np"))
    // rename the second reference to the drained frame: both sides
    // of the join would otherwise carry the same attribute ids (the
    // memory-sink view self-join conflict)
    val counts2 = drainedCounts.select(col("source").as("src2"),
      col("bucket").as("w2"), col("cp").as("cp2"))
    val grid = ns.crossJoin(broadcast(baseline.select(col("w"), col("cq"))))
      .join(counts2,
        col("source") === col("src2") && col("w") === col("w2"), "left")
      .withColumn("cp", coalesce(col("cp2"), lit(0L)))
      .crossJoin(broadcast(nq))
    val p = col("cp").cast("double") / col("np")
    val q = col("cq").cast("double") / col("nq")
    grid
      .select(col("source"), col("np"), col("nq"), col("cp"), col("cq"),
        graft.llm.TextAnalysis.psiTermNano(p, q).as("nano"))
      .groupBy(col("source"))
      .agg(fsum(col("nano")).as("top_nano"),
        max(col("np")).as("np"), max(col("nq")).as("nq"),
        fsum(col("cp")).as("cp_top"), fsum(col("cq")).as("cq_top"))
      .withColumn("p_other",
        (col("np") - col("cp_top")).cast("double") / col("np"))
      .withColumn("q_other",
        (col("nq") - col("cq_top")).cast("double") / col("nq"))
      .withColumn("psi",
        (col("top_nano") + graft.llm.TextAnalysis.psiTermNano(
          col("p_other"), col("q_other"))).cast("double") / 1e9)
      .select(col("source"), round(col("psi"), 6).as("psi"))
      .orderBy(col("source"))
  }

  /** Stateless Gopher-rule filtering on ingest — the streaming half
    * of x77: one map-only projection per arrival (the top-unigram
    * stat folds over the row's own token array instead of the batch
    * corpus aggregate), rule verdicts shared verbatim with the batch
    * operator, so the stream keeps exactly the batch keep-set.
    */
  def gopherRulesOnIngest(docs: DataFrame): DataFrame =
    graft.llm.TextAnalysis.gopherRulesMapOnly(docs)

  /** Drain-time filter-funnel finisher — the streaming half of x113:
    * verdicts accumulate per arrival via [[gopherRulesOnIngest]]
    * (map-only, stateless), and the 16-counter funnel aggregate +
    * 5-row rule spine is the SAME `funnelFrom` the batch operator
    * runs (the psiAtDrain shared-finisher idiom), so the drained
    * funnel equals batch x113 exactly.
    */
  def funnelAtDrain(verdicts: DataFrame): DataFrame =
    graft.llm.TextAnalysis.funnelFrom(verdicts)

  /** Ingest-time fuzzy dedup — the streaming half of x76: each
    * arrival's map-only simhash (no stateful aggregation) probes the
    * frozen rep-signature buckets (Dedup.repSignatureBuckets) through
    * a stream-static banded join; a Hamming match ≤ maxDist against a
    * kept representative means the frozen corpus already keeps this
    * content. Emits one (doc_id, rep_id, dist) row per matching
    * band (dedup at drain via [[fuzzyVerdictsAtDrain]]); per-arrival
    * cost ≤ 8 · bucketCap rows regardless of corpus size.
    *
    * Scope is the same as the x75 twin's: ingest-time flags DIRECT
    * near-dups of kept representatives (a crawl re-serving known
    * content). A member that joins a cluster only through a CHAIN of
    * pairwise links needs the batch CC pass — that is what the batch
    * x33/x76 run is for.
    */
  def fuzzyMatchesOnIngest(docs: DataFrame, buckets: DataFrame,
      maxDist: Int): DataFrame =
    graft.llm.Dedup.fuzzyProbe(docs, buckets, maxDist)

  /** Drain-time finisher: one verdict row per arrival — kept iff no
    * match surfaced, else the nearest (dist, rep_id) match (the
    * shared batch-x131 finisher, Dedup.fuzzyVerdicts).
    */
  def fuzzyVerdictsAtDrain(arrivals: DataFrame,
      matches: DataFrame): DataFrame =
    graft.llm.Dedup.fuzzyVerdicts(arrivals, matches)

  /** Stateless near-dup candidate flagging on ingest — the stream
    * half of the shingle-bucket family (x04 Jaccard / x62
    * containment): each arrival's 3-gram shingles route through a
    * stream-static join against the batch-built df-capped bucket
    * table (Dedup.shingleBuckets), emitting one (a, b) row per
    * shared surviving shingle, a = the arriving doc, b = a corpus
    * doc in that shingle's bucket. No state: the bucket table is the
    * batch side (same train-in-batch / serve-in-stream shape as
    * [[bloomPrescreen]]), and the per-arrival cost is bounded by
    * |shingles(a)| · dfCap rows regardless of corpus size. A pair
    * may repeat across shared shingles — dedup at the drain-time
    * sink (or score exactly with the batch operators); every batch
    * pair whose shingle survived the cap is guaranteed to surface,
    * because the batch pair enumeration reads the SAME bucket rows
    * this join streams through.
    */
  def shingleCandidates(docs: DataFrame, buckets: DataFrame): DataFrame =
    graft.llm.Dedup.shingles(docs)
      .join(buckets, "s")
      .select(col("doc_id").as("a"), explode(col("ds")).as("b"))
      .filter(col("a") =!= col("b"))

  /** Stateless LM scoring on ingest against a FROZEN trigram model
    * (train-in-batch / serve-in-stream, like [[applyClassifier]] —
    * the streaming face of `LanguageModel.perplexityServe`): the
    * few-K-row (g, c) model rides as a broadcast map, and each
    * arrival's NLL is one pass over its trigrams in string order —
    * the same order the batch plan's partial sums accumulate, so
    * scores agree to float round-off (spec asserts 1e-9). No state,
    * no shuffle; cost per arrival is |text| lookups.
    */
  def scoreLmAgainst(docs: DataFrame, lmRows: Seq[(String, Long)],
      alpha: Double = 0.5, cap: Double = 11.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = lmRows.map(_._2).sum
    val v = lmRows.size
    val bc = spark.sparkContext.broadcast(
      scala.collection.immutable.HashMap(lmRows: _*))
    val denom = math.max(n + alpha * v, alpha)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Option[Long], String)]
      .mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (id, text) =>
          if (text == null || text.length < 3) None
          else {
            val nt = text.length - 2
            var s = 0.0
            var i = 0
            while (i < nt) {
              val c = m.getOrElse(text.substring(i, i + 3), 0L)
              s += -math.log((c + alpha) / denom)
              i += 1
            }
            Some((id, nt.toLong, s / nt))
          }
        }
      }
      .toDF("doc_id", "n_tri", "raw")
      .select(col("doc_id"), col("n_tri"),
        round(col("raw"), 6).as("avg_nll"),
        (round(col("raw"), 6) > lit(cap)).as("flagged"))
  }

  /** Stateless DSIR weighting on ingest against the FROZEN B-row λ
    * model (the streaming face of `Importance.dsirServe`): the model
    * is a map literal, the bucket hash is the shared 16-bit md5 hash
    * (Spark fast form, bit-identical to the portable nibble form),
    * and the per-doc sums are integer nano-units — EXACT, so drained
    * scores equal the batch operator bit-for-bit. Tokens hashing to
    * buckets absent from the model drop out exactly as the batch
    * inner join drops them; a doc with no surviving token drops out
    * whole.
    */
  def scoreDsirAgainst(docs: DataFrame, lam: Map[Int, Long],
      buckets: Int = 256): DataFrame = {
    val mapLit = typedLit(lam)
    def hash16(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 4), 16, 10).cast("int")
    docs
      .withColumn("t", filter(split(col("text"), " "),
        w => length(w) > 0))
      .withColumn("ns", filter(
        transform(col("t"),
          w => element_at(mapLit, pmod(hash16(w), lit(buckets)))),
        x => x.isNotNull))
      .filter(size(col("ns")) > 0)
      .withColumn("s", aggregate(col("ns"), lit(0L), (acc, x) => acc + x))
      .select(col("doc_id"), size(col("ns")).cast("long").as("n_tokens"),
        round(col("s").cast("double") / lit(1e9), 6).as("log_weight"),
        (col("s") > 0).as("keep"))
  }

  /** Drain-time finisher for [[shingleCandidates]]: the drained
    * candidate rows carry EXACTLY one row per shared surviving
    * shingle (a survived bucket holds every doc sharing its shingle,
    * so a ∈ ds(s) whenever s ∈ shingles(a) and the bucket survived
    * the cap — the per-pair row count IS the batch intersection
    * count), so grouping them to (a, b, inter) and scoring through
    * the SHARED batch finisher (Dedup.containmentScore, same sizes
    * table, same 6dp cut) yields rows EQUAL to batch x62 restricted
    * to streamed `a`s — equality, not a superset.
    */
  def containmentAtDrain(candidates: DataFrame, buckets: DataFrame,
      threshold: Double): DataFrame =
    graft.llm.Dedup.containmentScore(
      candidates.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("inter")),
      buckets, threshold)

  /** Stateless duplicated-substring flagging on ingest — the stream
    * half of x73 (Dedup.substringDupSpans): each arrival's sliding
    * k-gram hashes route through a stream-static join against the
    * FROZEN corpus gram table (Dedup.gramTable — the few-column
    * count-per-hash "model"), keeping a position iff its gram occurs
    * in the corpus somewhere OTHER than the arriving doc itself
    * (count ≥ 2, or count 1 held by a different doc — which makes a
    * streamed slice of the corpus reproduce the batch duplicated
    * positions EXACTLY, self-matches excluded the same way the batch
    * global count ≥ 2 excludes them). No state; per-arrival cost is
    * |text| hash lookups through one co-keyed join.
    */
  def substringDupPositions(docs: DataFrame, grams: DataFrame,
      k: Int): DataFrame =
    graft.llm.Dedup.slidingGrams(graft.llm.Dedup.tokenArrays(docs), k)
      .join(grams, "h")
      .filter(col("c") >= 2 || col("only_doc") =!= col("doc_id"))
      .select(col("doc_id"), col("pos"))

  /** Drain-time finisher for [[substringDupPositions]]: coalesce the
    * drained duplicated positions into maximal spans through the
    * SHARED batch tail (Dedup.coalesceDupSpans — same island window,
    * same slice expressions), so drained spans EQUAL batch x73
    * restricted to the streamed doc_ids.
    */
  def substringSpansAtDrain(drained: DataFrame, docs: DataFrame,
      k: Int): DataFrame =
    graft.llm.Dedup.coalesceDupSpans(drained,
      graft.llm.Dedup.tokenArrays(docs), k)

  /** Drain-time SCRUB finisher for [[substringDupPositions]] — the
    * ingest face of x75: on ingest the frozen corpus always holds the
    * canonical copy, so EVERY coalesced duplicated span of an
    * arriving document is removed (a crawl re-serving known content
    * contributes only its novel text). Coalescing and re-assembly are
    * the shared batch stages (Dedup.dupRanges / Dedup.scrubRanges);
    * a streamed doc identical to a corpus doc scrubs to empty, a
    * doc with no corpus overlap passes through untouched.
    */
  def scrubAtDrain(drained: DataFrame, docs: DataFrame, k: Int): DataFrame =
    graft.llm.Dedup.scrubRanges(docs, graft.llm.Dedup.tokenArrays(docs),
      graft.llm.Dedup.dupRanges(drained, k))

  /** Stateless novelty grams on ingest — the stream half of x96
    * (Dedup.ngramNovelty): each arrival's DISTINCT k-gram hashes as
    * (doc_id, h) candidate rows, deduplicated INSIDE the projection
    * (Dedup.distinctGrams — array_distinct over the gram list), so
    * the stage is map-only with zero state; per-arrival cost is
    * |text| md5s.
    */
  def noveltyGramsOnIngest(docs: DataFrame, k: Int): DataFrame =
    graft.llm.Dedup.distinctGrams(docs, k)

  /** Drain-time finisher for [[noveltyGramsOnIngest]]: union the
    * drained arrival grams with the FROZEN corpus grams and run the
    * SHARED batch tail (Dedup.noveltyFromGrams — same first-holder
    * min, same count arithmetic), so when frozen ∪ streamed is the
    * corpus the drained table EQUALS batch x96 row-for-row.
    */
  def noveltyAtDrain(drained: DataFrame,
      frozenGrams: DataFrame): DataFrame =
    graft.llm.Dedup.noveltyFromGrams(drained.unionByName(frozenGrams))

  /** Stateless BM25 retrieval-on-ingest — the stream half of x74:
    * each arrival is a QUERY against the frozen corpus index
    * (TextAnalysis.bm25Index — the postings relation + 1-row stats).
    * The arrival's distinct first-`qTerms` tokens route through a
    * stream-static join against the postings; per-term contributions
    * are the SAME integer nano-units as batch (shared bm25Score), so
    * the drained rows sum exactly. No state; per-arrival cost is the
    * postings of its query terms.
    */
  def bm25Candidates(docs: DataFrame, postings: DataFrame,
      stats: DataFrame, qTerms: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    graft.llm.TextAnalysis.bm25Score(
      graft.llm.TextAnalysis.bm25QueryTerms(docs, qTerms),
      postings, stats, k1, b)

  /** Drain-time finisher for [[bm25Candidates]]: sum the exact nano
    * contributions and rank through the SHARED batch tail
    * (TextAnalysis.bm25Finish — same bounded top-k, same tie-break),
    * so drained rankings EQUAL batch x74 restricted to streamed qids.
    */
  def bm25AtDrain(drained: DataFrame, k: Int): DataFrame =
    graft.llm.TextAnalysis.bm25Finish(drained, k)

  /** Stateless SCD2 ingest half — the stream side of x144: each
    * arriving document emits its (doc_id, version, content-hash)
    * presence rows through the SHARED map-only projection
    * (Dedup.scd2VersionRows — explode/filter/md5, no state, no
    * watermark), landing in the presence table the drain finisher
    * coalesces.
    */
  def versionRowsOnIngest(docs: DataFrame, versions: Int = 4,
      delMod: Int = 17, chgMod: Int = 13): DataFrame =
    graft.llm.Dedup.scd2VersionRows(docs, versions, delMod, chgMod)

  /** Drain-time finisher for [[versionRowsOnIngest]]: the SHARED
    * island-coalescing interval build (Dedup.scd2FromVersionRows), so
    * the drained table EQUALS batch x144 row-for-row.
    */
  def scd2AtDrain(drained: DataFrame, versions: Int = 4): DataFrame =
    graft.llm.Dedup.scd2FromVersionRows(drained, versions - 1)
}
