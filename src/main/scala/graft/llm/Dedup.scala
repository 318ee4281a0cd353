package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table (SURVEY.md §2.9
  * X1/X2) — the training-data-pipeline surface. All shapes are
  * shuffle-on-key aggregations/joins that scale linearly: no
  * pairwise O(n²) anywhere except *within* candidate buckets, which
  * frequency caps keep bounded at 100 TB.
  *
  * Hashing is md5 (codegen'd built-in, identical in DuckDB) so every
  * operator is oracle-checkable; the min-over-md5(salt:shingle) trick
  * gives one MinHash permutation per band without needing a portable
  * integer-hash family.
  */
object Dedup {

  /** Word 3-gram shingle set per document (distinct). Documents with
    * fewer than 3 tokens have no shingles and drop out — a
    * deliberate, documented choice applied in both dialects.
    */
  def shingles(docs: DataFrame): DataFrame =
    graft.tools.Spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', slice(t, i+1, 3)))")))
        .as("s"))

  val shinglesSql: String =
    """SELECT DISTINCT doc_id, array_to_string(t[i+1:i+3], ' ') AS s
      |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) q,
      |     UNNEST(range(len(t)-2)) AS r(i)
      |WHERE len(t) >= 3""".stripMargin

  /** Word n-gram set per document (distinct), parameterized width.
    * Distinctness is per document, so it happens INSIDE the row
    * (array_distinct before the explode — pure codegen) instead of a
    * global distinct, which would shuffle every gram string.
    */
  def nGrams(docs: DataFrame, n: Int): DataFrame =
    graft.tools.Spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(0, size(t)-$n), i -> concat_ws(' ', slice(t, i+1, $n)))")))
        .as("g"))

  def nGramsSql(n: Int): String =
    s"""SELECT DISTINCT doc_id, array_to_string(t[i+1:i+$n], ' ') AS g
       |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) q,
       |     UNNEST(range(len(t)-${n - 1})) AS r(i)
       |WHERE len(t) >= $n""".stripMargin

  /** Benchmark decontamination: flag corpus documents sharing any
    * word n-gram with a benchmark/eval set — the leakage check every
    * training-data pipeline runs before a model sees the corpus. The
    * benchmark's n-gram set is tiny relative to the corpus, so it
    * broadcasts; the corpus side is one n-gram explosion + broadcast
    * semi-join + per-doc count — linear, no shuffle of the corpus
    * n-grams beyond the count aggregation.
    */
  def decontaminate(docs: DataFrame, benchIds: Int, n: Int): DataFrame = {
    // The gram table feeds BOTH branches, but each branch's doc_id
    // filter pushes below the explode, so the benchmark side explodes
    // only the few benchmark docs and the corpus side the rest — the
    // explosion is NOT duplicated. (A localCheckpoint barrier was
    // measured and rejected: materializing the gram rows costs more
    // than the explosion itself, locally and at scale.)
    val grams = nGrams(docs, n)
    val bench = grams.filter(col("doc_id") < benchIds)
      .select(col("g")).distinct()
    grams.filter(col("doc_id") >= benchIds)
      .join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  def decontaminateSql(benchIds: Int, n: Int): String =
    s"""WITH grams AS (${nGramsSql(n)}),
       |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < $benchIds)
       |SELECT doc_id, count(*) AS n_hits
       |FROM grams JOIN bench USING (g)
       |WHERE doc_id >= $benchIds
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** X1p: leak ATTRIBUTION — the eval-side complement of x28: per
    * BENCHMARK document, how many corpus documents share at least one
    * word n-gram with it, the total shared-gram hits, and the single
    * worst contaminator (most shared grams, doc_id tie-break). x28
    * flags corpus docs to scrub; this tells the EVAL owner which test
    * items are compromised and how badly — the table that decides
    * whether an eval split must be regenerated rather than the corpus
    * scrubbed. Benchmark items with zero leakage stay in the report
    * (left join off the benchmark spine), because "clean" is the
    * answer the eval owner is usually hoping to read.
    *
    * Scale shape: one gram explosion with the doc_id filters pushed
    * below it (the x28 plan), the bounded benchmark gram side
    * broadcast, one (bench, corpus-doc) hash agg, one argmax-by-
    * struct rollup to ≤ benchIds rows.
    */
  def leakAttribution(docs: DataFrame, benchIds: Int, n: Int): DataFrame = {
    val grams = nGrams(docs, n)
    val bench = grams.filter(col("doc_id") < benchIds)
      .select(col("doc_id").as("bench_id"), col("g"))
    val hits = grams.filter(col("doc_id") >= benchIds)
      .join(broadcast(bench), "g")
      .groupBy(col("bench_id"), col("doc_id"))
      .agg(count(lit(1)).as("h"))
      .groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("h")).as("n_hits"),
        min(struct((-col("h")).as("nh"), col("doc_id").as("d"))).as("b"))
    docs.filter(col("doc_id") < benchIds)
      .select(col("doc_id").as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("b.d").as("top_doc"), (-col("b.nh")).as("top_hits"))
      .orderBy(col("bench_id"))
  }

  /** Oracle: same gram chain, argmax via a per-bench rank. */
  def leakAttributionSql(benchIds: Int, n: Int): String =
    s"""WITH grams AS (${nGramsSql(n)}),
       |bench AS (
       |  SELECT doc_id AS bench_id, g FROM grams WHERE doc_id < $benchIds
       |), per AS (
       |  SELECT b.bench_id, g.doc_id, CAST(count(*) AS BIGINT) AS h
       |  FROM grams g JOIN bench b USING (g)
       |  WHERE g.doc_id >= $benchIds
       |  GROUP BY 1, 2
       |), rk AS (
       |  SELECT bench_id, doc_id, h,
       |    row_number() OVER (PARTITION BY bench_id
       |      ORDER BY h DESC, doc_id) AS rn,
       |    CAST(count(*) OVER (PARTITION BY bench_id) AS BIGINT)
       |      AS n_docs,
       |    CAST(sum(h) OVER (PARTITION BY bench_id) AS BIGINT)
       |      AS n_hits
       |  FROM per
       |)
       |SELECT s.doc_id AS bench_id,
       |  COALESCE(r.n_docs, 0) AS n_docs,
       |  COALESCE(r.n_hits, 0) AS n_hits,
       |  r.doc_id AS top_doc, r.h AS top_hits
       |FROM (SELECT doc_id FROM documents WHERE doc_id < $benchIds) s
       |LEFT JOIN (SELECT * FROM rk WHERE rn = 1) r
       |  ON r.bench_id = s.doc_id
       |ORDER BY bench_id""".stripMargin

  /** X1: exact duplicate groups — hash-groupBy on content digest. */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("h"))

  /** X2a: MinHash+LSH candidate buckets. One permutation per band via
    * min(md5(band:shingle)); docs sharing a (band, minhash) bucket are
    * near-dup candidates. Scale path: each stage is a key-grouped
    * aggregate — no global structure, no pairwise work.
    */
  /** The banded minhash signature table (doc_id, b, mh) — all band
    * minima in ONE groupBy (map-side partial min, one shuffle of
    * \|docs\| rows), then unpivot — instead of exploding the shingle
    * table ×bands before the shuffle. Shared by x02 and the x136
    * index-health audit.
    */
  private def minhashSig(docs: DataFrame, bands: Int): DataFrame = {
    val sh = shingles(docs)
    val minAggs = (0 until bands).map(b =>
      min(md5(concat(lit(s"$b:"), col("s")))).as(s"mh$b"))
    sh.groupBy(col("doc_id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), expr(
        (0 until bands).map(b => s"$b, mh$b")
          .mkString(s"stack($bands, ", ", ", ") AS (b, mh)")))
  }

  /** The x02 bucket rollup over any (doc_id, b, mh) signature table —
    * shared by the fixed-band x02 path and the planner-driven x140
    * path, so "bucket" means exactly one thing.
    */
  private def bucketRollup(sig: DataFrame): DataFrame =
    sig.groupBy(col("b"), col("mh"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("d_min"),
        max(col("doc_id")).as("d_max"))
      .filter(col("n_docs") > 1)
      .orderBy(col("b"), col("mh"))

  def minhashBuckets(docs: DataFrame, bands: Int): DataFrame =
    bucketRollup(minhashSig(docs, bands))

  /** X1q: MinHash-LSH index HEALTH audit — per band: signatures,
    * distinct buckets, the largest bucket, singleton buckets, the
    * implied candidate-pair bill Σ s(s−1)/2, and mean bucket size in
    * basis points. The x110 occupancy report for the MinHash path:
    * a band whose max bucket explodes (stop-shingle, templated
    * corpus) is where an LSH dedup run's cost hides, and this table
    * shows it BEFORE the pair enumeration is paid. Same shape as
    * x02 up to the signature table (shared builder), then two
    * bounded hash aggregates to `bands` rows.
    */
  def minhashIndexHealth(docs: DataFrame, bands: Int): DataFrame =
    minhashSig(docs, bands)
      .groupBy(col("b"), col("mh")).agg(count(lit(1)).as("s"))
      .groupBy(col("b"))
      .agg(sum(col("s")).as("n_sigs"),
        count(lit(1)).as("n_buckets"),
        max(col("s")).as("max_bucket"),
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("n_singletons"),
        expr("sum(s * (s - 1) div 2)").as("cand_pairs"))
      .select(col("b"), col("n_sigs"), col("n_buckets"),
        col("max_bucket"), col("n_singletons"), col("cand_pairs"),
        expr("n_sigs * 10000 div n_buckets").as("mean_size_bp"))
      .orderBy(col("b"))

  /** Oracle: same signature chain as x02, same integer rollup. */
  def minhashIndexHealthSql(bands: Int): String =
    s"""WITH sh AS ($shinglesSql),
       |sig AS (
       |  SELECT doc_id, b, min(md5(b || ':' || s)) AS mh
       |  FROM sh CROSS JOIN (SELECT unnest(range($bands)) AS b) bands
       |  GROUP BY doc_id, b
       |), bk AS (
       |  SELECT b, mh, CAST(count(*) AS BIGINT) AS s
       |  FROM sig GROUP BY b, mh
       |)
       |SELECT b, CAST(sum(s) AS BIGINT) AS n_sigs,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(max(s) AS BIGINT) AS max_bucket,
       |  CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_singletons,
       |  CAST(sum(s * (s - 1) // 2) AS BIGINT) AS cand_pairs,
       |  CAST(sum(s) * 10000 // count(*) AS BIGINT) AS mean_size_bp
       |FROM bk GROUP BY b ORDER BY b""".stripMargin

  def minhashBucketsSql(bands: Int): String =
    s"""WITH sh AS ($shinglesSql),
       |sig AS (
       |  SELECT doc_id, b, min(md5(b || ':' || s)) AS mh
       |  FROM sh CROSS JOIN (SELECT unnest(range($bands)) AS b) bands
       |  GROUP BY doc_id, b
       |)
       |SELECT b, mh, count(*) AS n_docs, min(doc_id) AS d_min,
       |       max(doc_id) AS d_max
       |FROM sig GROUP BY b, mh HAVING count(*) > 1
       |ORDER BY b, mh""".stripMargin

  /** 16-bit SimHash: per-bit majority vote over md5-derived token
    * hashes (distinct tokens). The bit expressions are generated from
    * one loop for both dialects so the arithmetic is identical.
    */
  private def nibbleExpr(pos: Int, instrFn: String, strCol: String): String =
    s"($instrFn('0123456789abcdef', substr(md5($strCol), $pos, 1)) - 1)"

  private[graft] val MersenneP = 2147483647L

  /** Deterministic per-permutation constants in [1, p−1] — generated
    * once at query construction and embedded as LITERALS in both the
    * engine plan and the oracle SQL, so the two dialects share the
    * identical permutation family.
    */
  private[graft] def permConsts(perms: Int): (Seq[Long], Seq[Long]) = {
    def h(seed: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8"))
      val v = BigInt(1, d.take(8)).toLong & Long.MaxValue
      v % (MersenneP - 1) + 1
    }
    ((0 until perms).map(b => h(s"a$b")),
      (0 until perms).map(b => h(s"c$b")))
  }

  /** The permConsts table as a SQL VALUES list. */
  private def permConstsValuesSql(perms: Int): String = {
    val (pa, pc) = permConsts(perms)
    (0 until perms).map(b =>
      s"(CAST($b AS BIGINT), CAST(${pa(b)} AS BIGINT), " +
        s"CAST(${pc(b)} AS BIGINT))").mkString(", ")
  }

  /** Parse `n` hex chars of an ALREADY-hex string column starting at
    * 1-based `from` into a BIGINT — the portable (instr/strpos)
    * nibble form for oracles; engine hot paths use `conv` (see
    * [[hash16FastExpr]] — the two are verified bit-identical).
    */
  private[graft] def hexParseExpr(instrFn: String, hexCol: String,
      from: Int, n: Int): String =
    (0 until n).map { i =>
      s"(CAST($instrFn('0123456789abcdef', substr($hexCol, " +
        s"${from + i}, 1)) - 1 AS BIGINT) * ${1L << (4 * (n - 1 - i))})"
    }.mkString("(", " + ", ")")

  private[graft] def hash16Expr(instrFn: String, strCol: String): String =
    s"(${nibbleExpr(1, instrFn, strCol)} * 4096 + " +
      s"${nibbleExpr(2, instrFn, strCol)} * 256 + " +
      s"${nibbleExpr(3, instrFn, strCol)} * 16 + " +
      s"${nibbleExpr(4, instrFn, strCol)})"

  /** Spark-only fast form of [[hash16Expr]]: ONE md5 + a hex parse
    * via `conv` — bit-identical values (verified exhaustively against
    * the nibble form), measured 2.3× faster on md5-bound probe
    * stages. Use on engine-side hot paths; oracles keep the portable
    * strpos nibble form (DuckDB has no conv).
    */
  private[graft] def hash16FastExpr(strCol: String): String =
    s"cast(conv(substr(md5($strCol), 1, 4), 16, 10) as int)"

  /** SimHash signatures without the presentation sort (for reuse as
    * a join input).
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("v", expr(hash16FastExpr("w")))
    val bitAggs = (0 until 16).map { j =>
      sum(when(expr(s"(v div ${1 << j}) % 2") === 1, 1).otherwise(-1))
        .as(s"s$j")
    }
    val bitSums = tok.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
    bitSums.select(col("doc_id"),
      (0 until 16).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** X2b: SimHash signatures (doc_id, simhash). */
  def simhash(docs: DataFrame): DataFrame =
    simhashSignatures(docs).orderBy(col("doc_id"))

  /** 32-bit SimHash signatures (8 md5 nibbles per token hash) — the
    * near-dup join needs a signature space that stays sparse as the
    * corpus grows; 16 bits saturates by ~10³ docs (measured: 3.85M
    * "near-dup" pairs at 5k docs), 32 bits keeps random collisions
    * negligible to ~10⁵ and the banding narrow at 100 TB-scale doc
    * counts you would widen to 64.
    */
  private def hash32Expr(instrFn: String, strCol: String): String =
    (1 to 8).map { p =>
      s"(CAST($instrFn('0123456789abcdef', substr(md5($strCol), $p, 1)) - 1" +
        s" AS BIGINT) * ${1L << (4 * (8 - p))})"
    }.mkString("(", " + ", ")")

  /** Spark-only fast form of [[hash32Expr]]: ONE md5 + a hex parse
    * via `conv` — bit-identical by construction (the nibble sum IS
    * the base-16 parse of the first 8 hex chars; cf. the verified
    * [[hash16FastExpr]] twin). Engine hot paths only; oracles keep
    * the portable strpos nibble form.
    */
  private[graft] def hash32FastExpr(strCol: String): String =
    s"cast(conv(substr(md5($strCol), 1, 8), 16, 10) as bigint)"

  def simhash32Signatures(docs: DataFrame): DataFrame = {
    val tok = graft.tools.Spread(docs)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("v", expr(hash32FastExpr("w")))
    val bitAggs = (0 until 32).map { j =>
      sum(when(expr(s"(v div ${1L << j}) % 2") === 1, 1).otherwise(-1))
        .as(s"s$j")
    }
    val bitSums = tok.groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
    bitSums.select(col("doc_id"),
      (0 until 32).map(j =>
        when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  private def simhash32SqlFrom(rel: String): String = {
    val bitSums = (0 until 32).map { j =>
      s"sum(CASE WHEN (v // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val assemble = (0 until 32).map { j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT doc_id, $assemble AS simhash FROM (
       |  SELECT doc_id, $bitSums FROM (
       |    SELECT doc_id, ${hash32Expr("strpos", "w")} AS v FROM (
       |      SELECT doc_id,
       |             unnest(list_distinct(string_split(text, ' '))) AS w
       |      FROM $rel))
       |  GROUP BY doc_id)""".stripMargin
  }

  /** X2b': SimHash near-dup pairs — band each 32-bit signature into
    * eight 4-bit nibbles (LSH for Hamming space: ≤ maxDist flipped
    * bits can touch at most maxDist bands, so any pair within
    * maxDist < 8 shares an intact band and banding loses nothing),
    * join on (band, nibble), then filter by exact Hamming distance
    * via the codegen'd `bit_count(s1 ^ s2)`. Candidate volume is
    * bounded by bucket sizes, never all-pairs — the same LSH shape
    * that holds at 100 TB.
    */
  /** (doc_id, simhash32) packed into one signed long for BoundedMinK:
    * doc_id·2³² + simhash — exact, and ordered like the tuple, only
    * for doc_id < 2³¹. The guard raises instead of silently
    * corrupting buckets when an id crosses the bound (one codegen'd
    * comparison per row — noise next to the md5 signature work).
    */
  private def packedDocSim: Column =
    when(col("doc_id") < lit(2147483648L),
      col("doc_id") * lit(4294967296L) + col("simhash"))
      .otherwise(raise_error(concat(
        lit("doc_id >= 2^31 overflows the (doc_id, simhash) packing: "),
        col("doc_id").cast("string"))))

  def simhashNearDup(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame =
    simhashNearDupFromSigs(simhash32Signatures(docs), maxDist, bucketCap)

  /** [[simhashNearDup]] over a caller-supplied signature table — the
    * x131/x138 chain pins ONE signature pass and shares it between
    * the cluster resolution and the rep-bucket build.
    */
  private[graft] def simhashNearDupFromSigs(sig: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame = {
    // Bucket-list form (same shape as jaccardPairs): one groupBy per
    // (band, nibble) via the cap-and-drop BoundedMinK aggregate
    // (bounded buffers, no over-full bucket ever materializes its
    // member list), pairs enumerated inside each surviving bucket,
    // then distinct across bands. An over-full bucket is a
    // non-discriminative band — standard LSH practice, and the bound
    // that keeps pair generation linear on a templated/skewed corpus.
    // (doc_id, simhash) packs into one long — doc_id·2³² + simhash,
    // exact for doc_id < 2³¹ — so packed order equals tuple order.
    val buckets = sig
      .select(col("doc_id"), col("simhash"),
        explode(expr("array(0, 1, 2, 3, 4, 5, 6, 7)")).as("band"))
      .withColumn("nib",
        expr("(simhash div shiftleft(1L, 4 * band)) % 16"))
      .groupBy(col("band"), col("nib"))
      .agg(graft.functions.MinK.bounded_min_k(bucketCap)(
        packedDocSim).as("ps"))
      .filter(size(col("ps")) > 0)
      .withColumn("ds", expr(
        """transform(ps, p -> struct(p div 4294967296 AS doc_id,
          |                          p % 4294967296 AS simhash))""".stripMargin))
    buckets
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y ->
          |    struct(x.doc_id AS d1, y.doc_id AS d2,
          |           x.simhash AS s1, y.simhash AS s2))))""".stripMargin))
        .as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"),
        col("p.s1").as("s1"), col("p.s2").as("s2"))
      .distinct()
      .withColumn("dist", expr("bit_count(s1 ^ s2)"))
      .filter(col("dist") <= maxDist)
      .select(col("d1"), col("d2"), col("dist"))
      .orderBy(col("d1"), col("d2"))
  }

  /** The sig→banded→kept→pairs CTE chain shared by the near-dup pair
    * query and the cluster-resolution oracle.
    */
  private def simhashPairCtes(bucketCap: Int,
      rel: String = "documents"): String =
    s"""sig AS (${simhash32SqlFrom(rel)}),
       |banded AS (
       |  SELECT doc_id, simhash, i AS band,
       |         (simhash // (1 << (4 * i))) % 16 AS nib
       |  FROM sig, UNNEST(range(8)) AS r(i)
       |), kept AS (
       |  SELECT band, nib FROM banded GROUP BY band, nib
       |  HAVING count(*) <= $bucketCap
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |         a.simhash AS s1, b.simhash AS s2
       |  FROM banded a
       |  JOIN kept k ON a.band = k.band AND a.nib = k.nib
       |  JOIN banded b
       |    ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
       |)""".stripMargin

  def simhashNearDupSql(maxDist: Int, bucketCap: Int = 64): String =
    s"""WITH ${simhashPairCtes(bucketCap)}
       |SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS dist
       |FROM pairs WHERE bit_count(xor(s1, s2)) <= $maxDist
       |ORDER BY d1, d2""".stripMargin

  /** Map-only 32-bit simhash — bit-identical to simhash32Signatures
    * but computed with array expressions instead of the per-doc
    * groupBy (bit j set iff strictly more distinct-token hashes have
    * it set than not, same threshold). This is the SERVING form: a
    * streaming arrival gets its signature in the projection, no
    * stateful aggregation, so ingest-time dedup stays stateless.
    */
  def simhashSignatureMapOnly(docs: DataFrame): DataFrame = {
    val bits = (0 until 32).map { j =>
      s"CASE WHEN 2 * size(filter(vs, v -> (v div ${1L << j}) % 2 = 1))" +
        s" > size(vs) THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    docs
      .withColumn("vs", expr("transform(array_distinct(split(text, ' ')), " +
        s"w -> ${hash32FastExpr("w")})"))
      .withColumn("simhash", expr(s"CAST($bits AS BIGINT)"))
      .drop("vs")
  }

  /** Frozen serving model for ingest-time fuzzy dedup: the x76
    * survivors' banded signature buckets — (band, nib, rep_id,
    * rep_sim), capped per bucket with the same BoundedMinK the batch
    * pair machinery uses, so a skewed bucket can never make a single
    * arrival's probe unbounded.
    */
  def repSignatureBuckets(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame = {
    // ONE pinned signature pass feeds both the cluster resolution
    // (via the near-dup pairs) and the rep-bucket build below — the
    // previous form recomputed simhash32Signatures for each (a full
    // corpus tokenize+hash pass at scale). Representatives come from
    // componentReps directly: its rep_id set equals the fuzzyScrub
    // survivor set (every representative is a corpus doc), minus the
    // corpus join and ORDER BY the survivor table pays.
    val sig = graft.tools.Materialize(simhash32Signatures(docs))
    val reps = componentRepsFromSigs(docs, sig, maxDist, bucketCap)
      .select(col("rep_id").as("doc_id"))
    sig.join(reps, "doc_id")
      .select(col("doc_id"), col("simhash"),
        explode(expr("array(0, 1, 2, 3, 4, 5, 6, 7)")).as("band"))
      .withColumn("nib",
        expr("(simhash div shiftleft(1L, 4 * band)) % 16"))
      .groupBy(col("band"), col("nib"))
      .agg(graft.functions.MinK.bounded_min_k(bucketCap)(
        packedDocSim).as("ps"))
      .select(col("band"), col("nib"), explode(expr(
        """transform(ps, p -> struct(p div 4294967296 AS rep_id,
          |                          p % 4294967296 AS rep_sim))"""
          .stripMargin)).as("r"))
      .select(col("band"), col("nib"), col("r.rep_id").as("rep_id"),
        col("r.rep_sim").as("rep_sim"))
  }

  /** Probe the frozen rep-signature buckets with a map-only simhash:
    * one (doc_id, rep_id, dist) row per banded Hamming match ≤
    * `maxDist`. Stateless and bounded (≤ 8·bucketCap rows per
    * arrival) — shared verbatim by the batch x131 query and the
    * streaming ingest twin.
    */
  def fuzzyProbe(arrivals: DataFrame, buckets: DataFrame,
      maxDist: Int): DataFrame =
    simhashSignatureMapOnly(arrivals)
      .select(col("doc_id"), col("simhash"),
        explode(expr("array(0, 1, 2, 3, 4, 5, 6, 7)")).as("band"))
      .withColumn("nib",
        expr("(simhash div shiftleft(1L, 4 * band)) % 16"))
      .join(buckets, Seq("band", "nib"))
      .withColumn("dist", expr("cast(bit_count(simhash ^ rep_sim) as int)"))
      .filter(col("dist") <= maxDist)
      .select(col("doc_id"), col("rep_id"), col("dist"))

  /** Finisher over [[fuzzyProbe]] matches: one verdict row per
    * arrival — kept iff no match surfaced, else the nearest
    * (dist, rep_id) match. Shared by batch x131 and the streaming
    * drain.
    */
  def fuzzyVerdicts(arrivals: DataFrame, matches: DataFrame): DataFrame = {
    val best = matches
      .groupBy(col("doc_id"))
      .agg(min(struct(col("dist"), col("rep_id"))).as("b"))
    arrivals.select(col("doc_id")).join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("b").isNull.as("kept"),
        col("b.rep_id").as("rep_id"), col("b.dist").as("dist"))
  }

  /** X1n: incremental FUZZY dedup — the near-dup face of x99's exact
    * incremental verdicts, and the batch-oracle twin of the
    * streaming ingest path: the corpus md5-slice NOT in the %newMod
    * bucket is the FROZEN corpus (its x76 survivors' banded
    * signature buckets are the serving model), the %newMod bucket is
    * the arriving batch, and every arrival gets a keep/drop verdict
    * with its nearest surviving representative and Hamming distance.
    * x99 only catches byte-identical re-serves; this catches the
    * near-copies (tracking params, boilerplate edits) a crawl
    * actually re-serves — at per-arrival cost ≤ 8·bucketCap bucket
    * rows regardless of corpus size, because the probe is the SAME
    * stateless stream-static join the ingest twin runs
    * ([[fuzzyProbe]]/[[fuzzyVerdicts]] shared verbatim).
    */
  def incrementalFuzzyDedup(docs: DataFrame, newMod: Int, maxDist: Int,
      bucketCap: Int = 64): DataFrame = {
    val h = expr(hash16FastExpr("cast(doc_id as string)"))
    val corpus = docs.filter(h % newMod =!= 0)
    val batch = docs.filter(h % newMod === 0)
    val buckets = repSignatureBuckets(corpus, maxDist, bucketCap)
    fuzzyVerdicts(batch, fuzzyProbe(batch, buckets, maxDist))
      .orderBy(col("doc_id"))
  }

  /** The x131 serve path: the frozen corpus's rep-signature buckets
    * persist via ModelStore like every trained model in the engine
    * (the x66/x104 invariant) — building them costs the full x76
    * cluster-resolution pass, and an ingest pipeline re-probes the
    * SAME frozen corpus on every batch, so the ≤8·16·bucketCap-row
    * bucket table is the textbook train-once/serve-many artifact.
    * Probe + verdict shared verbatim with x131, so the serve query
    * is hash-identical to in-query building.
    */
  def incrementalFuzzyServe(docs: DataFrame, modelPath: String,
      newMod: Int, maxDist: Int, bucketCap: Int = 64): DataFrame = {
    val h = expr(hash16FastExpr("cast(doc_id as string)"))
    val batch = docs.filter(h % newMod === 0)
    val buckets = graft.tools.ModelStore.ensure(modelPath,
      repSignatureBuckets(docs.filter(h % newMod =!= 0), maxDist,
        bucketCap), spec = "repSignatureBuckets v1")
    fuzzyVerdicts(batch, fuzzyProbe(batch, buckets, maxDist))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the x48/x76 chain over the corpus slice (repsCtesBody
    * parameterized by relation), the same cap-and-drop bucket rule,
    * the batch side's signatures through the shared simhash SQL, and
    * the (dist, rep_id) argmin as a packed-long min (exact for
    * doc_id < 2³¹, the repSignatureBuckets bound).
    */
  def incrementalFuzzyDedupSql(newMod: Int, maxDist: Int,
      bucketCap: Int = 64): String =
    s"""WITH RECURSIVE corp AS MATERIALIZED (
       |  SELECT * FROM documents
       |  WHERE ${hash16Expr("strpos", "CAST(doc_id AS VARCHAR)")}
       |    % $newMod <> 0
       |), newb AS MATERIALIZED (
       |  SELECT * FROM documents
       |  WHERE ${hash16Expr("strpos", "CAST(doc_id AS VARCHAR)")}
       |    % $newMod = 0
       |), ${repsCtesBody(maxDist, bucketCap, "corp")},
       |reps AS (SELECT doc_id FROM ranked WHERE rk = 1),
       |rsig AS (
       |  SELECT s.doc_id, s.simhash FROM sig s JOIN reps USING (doc_id)
       |), rband AS (
       |  SELECT doc_id AS rep_id, simhash AS rep_sim, i AS band,
       |         (simhash // (1 << (4 * i))) % 16 AS nib
       |  FROM rsig, UNNEST(range(8)) AS r(i)
       |), bcap AS (
       |  SELECT band, nib FROM rband GROUP BY band, nib
       |  HAVING count(*) <= $bucketCap
       |), bkt AS (
       |  SELECT rb.* FROM rband rb JOIN bcap USING (band, nib)
       |), nsig AS (${simhash32SqlFrom("newb")}),
       |nband AS (
       |  SELECT doc_id, simhash, i AS band,
       |         (simhash // (1 << (4 * i))) % 16 AS nib
       |  FROM nsig, UNNEST(range(8)) AS r(i)
       |), m AS (
       |  SELECT n.doc_id,
       |    CAST(bit_count(xor(n.simhash, b.rep_sim)) AS BIGINT)
       |      * 4294967296 + b.rep_id AS p
       |  FROM nband n JOIN bkt b ON n.band = b.band AND n.nib = b.nib
       |  WHERE bit_count(xor(n.simhash, b.rep_sim)) <= $maxDist
       |), best AS (
       |  SELECT doc_id, min(p) AS p FROM m GROUP BY doc_id
       |)
       |SELECT nb.doc_id, best.p IS NULL AS kept,
       |  CAST(best.p % 4294967296 AS BIGINT) AS rep_id,
       |  CAST(best.p // 4294967296 AS INT) AS dist
       |FROM newb nb LEFT JOIN best USING (doc_id)
       |ORDER BY nb.doc_id""".stripMargin

  /** X1 cluster resolution: connected components over a near-dup pair
    * graph — the final stage of a dedup pipeline (pairs say "these
    * two are dups"; the cluster's minimum doc_id becomes the
    * canonical keeper for the whole group, including transitively
    * linked docs no single pair connects).
    *
    * Algorithm: min-label propagation with pointer doubling — each
    * round every node takes the minimum label among itself and its
    * neighbors, then short-circuits to its label's label. Rounds
    * needed are O(log diameter), each round a pair of hash joins on
    * label tables of |V| rows plus one join against the edge list —
    * the shape that holds when V and E are 100 TB-scale (GraphX
    * does the same thing; no driver-side graph, no global sort).
    * Labels/edges are materialized per round (graft.tools.Materialize) so the
    * lineage doesn't grow with the iteration count.
    *
    * Pair endpoints absent from `vertices` are discovered through the
    * edge join, labeled, and included in the output.
    */
  /** Edge-count gate for the broadcast-scale fast path below: when
    * the symmetrized near-dup edge list has at most this many rows,
    * components are resolved in one bounded driver pass (union-find)
    * instead of the iterative join loop — the SAME size-adaptive
    * trade a broadcast hash join makes (collect the provably-small
    * side, skip the shuffles). 1M edges ≈ 16 MB of (long, long) —
    * broadcast-tier, and the default keeps the transfer under the
    * usual 10 MB/row-count broadcast comfort zone with the loop as
    * the general path for anything bigger.
    */
  val CcBroadcastMaxEdgesKey = "spark.graft.cc.broadcastMaxEdges"

  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val bidir = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .unionByName(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .transform(graft.tools.Materialize(_))
    // Size-adaptive fast path (optimization guide §2.4 "remove
    // shuffles outright" + §3.1's broadcast rationale): the iterative
    // loop below costs O(log diameter) rounds of joins + checkpoint
    // pins + convergence counts — measured ~3.5 s of pure fixed cost
    // at sf0.1 local[32] for a 289-node/484-edge graph. When the
    // pinned edge table is small enough to broadcast (count on the
    // ALREADY-materialized frame — one cheap job), resolve components
    // with union-find in a single bounded driver pass and hand the
    // ≤|endpoints|-row label table straight back to Catalyst. This is
    // a BOUNDED transfer with a hard conf gate, not a driver loop
    // over corpus data: above the gate (any 100 TB-scale graph) the
    // distributed loop runs exactly as before. Labels are identical
    // by construction — min node id per component in both paths.
    val maxLocal = pairs.sparkSession.conf
      .getOption(CcBroadcastMaxEdgesKey).map(_.toLong)
      .getOrElse(1000000L)
    val nEdges = bidir.count()
    if (nEdges <= maxLocal) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      // bidir holds each edge twice (symmetrized); either copy unions
      // the same pair, so no dedup needed before union-find
      bidir.select(col("a"), col("b")).collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = parent.keys.toArray
      val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
      nodes.foreach { n =>
        val r = find(n)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, n), n)
      }
      val comp = nodes.sorted.toSeq
        .map(n => (n, minOfRoot(find(n)))).toDF("doc_id", "label")
      return joinBack(vertices, comp)
    }
    // Iterate only over nodes that touch at least one edge — every
    // other vertex is trivially its own component and joins back after
    // the loop. Per-round tables are |endpoints| rows, not |V|: on a
    // mostly-unique corpus the near-dup endpoints are a small fraction
    // of the documents, so the O(log diameter) rounds run on the small
    // graph while the full corpus is touched exactly twice (the edge
    // build and the final label join).
    // Round 0 is folded into initialization: label₀(v) = min(v, min
    // neighbor) comes out of the same groupBy that enumerates the
    // endpoint set, so the loop starts one propagation ahead.
    var lbl = bidir.groupBy(col("a"))
      .agg(min(col("b")).as("mb"))
      .select(col("a").as("node"), least(col("a"), col("mb")).as("label"))
      .transform(graft.tools.Materialize(_))
    var changed = 1L
    var iter = 0
    // One propagate+double step on a (node, label, old) frame; `old`
    // rides along untouched (max(old): only the node's own row has
    // it) so convergence after a batch of steps is a local filter on
    // the checkpointed result, not another join.
    def step(l: DataFrame): DataFrame = {
      val viaEdges = bidir
        .join(l.select(col("node").as("b"), col("label")), "b")
        .select(col("a").as("node"), col("label"),
          lit(null).cast("long").as("old"))
      val prop = l.unionByName(viaEdges)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), max(col("old")).as("old"))
      // pointer doubling: jump to the label's own label (labels are
      // node ids, and label(v) ≤ v, so chains collapse exponentially)
      val hop = prop.select(col("node").as("ln"), col("label").as("ll"))
      prop.join(hop, col("label") === col("ln"), "left")
        .select(col("node"),
          coalesce(col("ll"), col("label")).as("label"), col("old"))
    }
    while (changed > 0 && iter < maxIter) {
      // TWO steps per materialized round: min-label propagation is
      // monotone and idempotent at the fixpoint, so an extra step
      // never changes the converged labels — it only halves the
      // fixed per-round costs (checkpoint, convergence count, job
      // scheduling), which profiling showed dominate the loop
      // (~60 sub-second jobs per x33 run at sf0.1). At 100 TB the
      // same batching halves the number of lineage barriers.
      // When only ONE step of the maxIter budget remains (odd
      // maxIter, graph not yet converged), run a single step so the
      // cap is exact — the double-step otherwise overshoots the
      // documented iteration limit by one.
      val nSteps = if (iter + 2 <= maxIter) 2 else 1
      val seeded = lbl.withColumn("old", col("label"))
      val next = (if (nSteps == 2) step(step(seeded)) else step(seeded))
        .transform(graft.tools.Materialize(_))
      // null-safe: a pair endpoint absent from `vertices` enters via
      // the edge join with old=null — plain =!= returns null there,
      // the filter drops the row, and the loop would stop early with
      // the graph only partially labeled
      changed = next.filter(!(col("label") <=> col("old"))).count()
      lbl = next.drop("old")
      iter += nSteps
    }
    joinBack(vertices, lbl.select(col("node").as("doc_id"), col("label")))
  }

  /** Attach endpoint labels back to the full vertex set: vertices
    * outside the edge graph keep their own id; pair endpoints absent
    * from `vertices` (discovered via the edge list) are still labeled
    * and included. Shared by both CC paths.
    */
  private def joinBack(vertices: DataFrame, comp: DataFrame): DataFrame = {
    val fromVertices = vertices.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("component"))
    val extra = comp.join(vertices.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("label").as("component"))
    fromVertices.unionByName(extra)
  }

  /** Oracle: transitive min-label closure as a recursive CTE. The
    * edge CTEs are MATERIALIZED — DuckDB otherwise re-evaluates the
    * whole simhash chain on every fixpoint iteration.
    */
  /** The x33 connected-components chain as a CTE body (final
    * relation: `comp` (doc_id, component)) — shared by the cluster
    * oracle and the x119 histogram oracle. Callers must prefix
    * `WITH RECURSIVE`.
    */
  private[graft] def ccCtesSql(maxDist: Int, bucketCap: Int): String =
    s"""${simhashPairCtes(bucketCap)},
       |edges AS MATERIALIZED (
       |  SELECT d1, d2 FROM pairs
       |  WHERE bit_count(xor(s1, s2)) <= $maxDist
       |),
       |bidir AS MATERIALIZED (
       |  SELECT d1 AS a, d2 AS b FROM edges
       |  UNION ALL SELECT d2, d1 FROM edges
       |),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS label FROM documents
       |  UNION
       |  SELECT e.b, r.label FROM bidir e JOIN reach r ON r.node = e.a
       |),
       |comp AS (
       |  SELECT node AS doc_id, min(label) AS component
       |  FROM reach GROUP BY node
       |)""".stripMargin

  def dedupClustersSql(maxDist: Int, bucketCap: Int = 64): String =
    s"""WITH RECURSIVE ${ccCtesSql(maxDist, bucketCap)}
       |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin

  /** X1/X6: SOFT-dedup sampling weights — the delete-nothing
    * alternative to hard dedup (the Gopher/Chinchilla-era practice
    * for templated near-dups): every document keeps its place in the
    * corpus but carries weight_bp = 10000 div cluster_size, so a
    * weight-proportional sampler draws each near-dup CLUSTER with
    * the mass of one document — duplicates stop multiplying their
    * content's gradient without the recall risk of choosing a single
    * "representative". Output per doc: cluster id, cluster size, and
    * the integer basis-point weight (exact in both dialects — no
    * float division anywhere).
    *
    * Scale shape: the x33 CC machinery (endpoint-bounded
    * pointer-doubling rounds), one |V|-row size aggregate co-keyed
    * back on its own grouping key (copartitioned-agg-join — the
    * exchange is reused, no broadcast of an O(corpus) side).
    */
  def softDedupWeights(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame = {
    val comp = connectedComponents(docs.select(col("doc_id")),
      simhashNearDup(docs, maxDist, bucketCap)
        .select(col("d1"), col("d2")))
    val sizes = comp.groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("doc_id"), col("component"), col("cluster_size"),
        expr("10000 div cluster_size").as("weight_bp"))
      .orderBy(col("doc_id"))
  }

  def softDedupWeightsSql(maxDist: Int, bucketCap: Int = 64): String =
    s"""WITH RECURSIVE ${ccCtesSql(maxDist, bucketCap)},
       |sizes AS (
       |  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
       |  FROM comp GROUP BY component
       |)
       |SELECT c.doc_id, c.component, s.cluster_size,
       |       CAST(10000 // s.cluster_size AS BIGINT) AS weight_bp
       |FROM comp c JOIN sizes s ON s.component = c.component
       |ORDER BY c.doc_id""".stripMargin

  /** X1: duplicate-cluster SIZE HISTOGRAM — the dedup-ROI table: per
    * cluster multiplicity s, how many near-dup clusters have exactly
    * s members, how many documents they hold, and how many of those
    * a keep-one-per-cluster policy deletes (s−1 each). The first
    * question a curation owner asks before paying for a dedup pass —
    * "is my corpus 2% doubled or 40% boilerplate-mirrored?" — and
    * the monitor that catches a crawler regression (a new hot spike
    * at s ≥ 100 is one template exploding). Singleton "clusters"
    * (s = 1) are included: their row is the untouched corpus mass.
    *
    * Scale shape: the x33 CC machinery (endpoint-bounded pointer-
    * doubling rounds), then two hash aggregates — |V| rows →
    * |clusters| rows → |distinct sizes| rows. Nothing new touches
    * the corpus.
    */
  def clusterSizeHistogram(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame = {
    val pairs = simhashNearDup(docs, maxDist, bucketCap)
      .select(col("d1"), col("d2"))
    connectedComponents(docs.select(col("doc_id")), pairs)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs"),
        ((col("cluster_size") - 1) * col("n_clusters"))
          .as("n_removable"))
      .orderBy(col("cluster_size"))
  }

  def clusterSizeHistogramSql(maxDist: Int,
      bucketCap: Int = 64): String =
    s"""WITH RECURSIVE ${ccCtesSql(maxDist, bucketCap)},
       |sizes AS (
       |  SELECT component, CAST(count(*) AS BIGINT) AS sz
       |  FROM comp GROUP BY component
       |)
       |SELECT sz AS cluster_size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sz * count(*) AS BIGINT) AS n_docs,
       |  CAST((sz - 1) * count(*) AS BIGINT) AS n_removable
       |FROM sizes GROUP BY sz ORDER BY sz""".stripMargin

  /** X1 cluster-representative selection — the step after cluster
    * resolution: a dedup pipeline keeps ONE document per near-dup
    * cluster, and "lowest doc_id" is the wrong policy when cluster
    * members differ in quality (a clean original vs its boilerplate-
    * wrapped scrape). Per component: the member with the highest
    * quality score (uniq_ratio from TextAnalysis.quality), ties to
    * the lowest doc_id.
    *
    * The argmax is `max(struct(score, -doc_id))` — a hash aggregate
    * with map-side partials, one key-grouped shuffle of |V| rows; no
    * per-component window, no sort. Composes the CC labels (already
    * O(endpoint)-bounded rounds) with one join against the quality
    * projection.
    */
  def clusterRepresentatives(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame =
    componentReps(docs, maxDist, bucketCap).orderBy(col("component"))

  /** Shared reps frame for x48/x76: one row per component —
    * (component, rep_id, n_docs, score), argmax by quality then
    * lowest doc_id. Singletons are their own rep.
    */
  private def componentReps(docs: DataFrame, maxDist: Int,
      bucketCap: Int): DataFrame =
    componentRepsFromSigs(docs, simhash32Signatures(docs), maxDist,
      bucketCap)

  private def componentRepsFromSigs(docs: DataFrame, sig: DataFrame,
      maxDist: Int, bucketCap: Int): DataFrame = {
    val pairs = simhashNearDupFromSigs(sig, maxDist, bucketCap)
      .select(col("d1"), col("d2"))
    val comp = connectedComponents(docs.select(col("doc_id")), pairs)
    val score = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("uniq_ratio").as("score"))
    comp.join(score, Seq("doc_id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_docs"),
        max(struct(col("score").as("s"), (-col("doc_id")).as("nid")))
          .as("best"))
      .select(col("component"), (-col("best.nid")).as("rep_id"),
        col("n_docs"), col("best.s").as("score"))
  }

  /** X1 fuzzy-dedup APPLY step (the x75 symmetry for the simhash
    * family): x33 resolves near-dup clusters and x48 elects each
    * cluster's best member — x76 emits the SURVIVING corpus a
    * training pipeline actually keeps: one row per retained document
    * (the elected representative of its cluster; unique docs are
    * their own singleton cluster and survive unchanged) with its
    * component, cluster size, and how many near-duplicates were
    * dropped in its favor.
    *
    * Scale shape: everything up to the reps table is the x48 plan
    * (endpoint-bounded CC rounds + one |V|-row argmax aggregate);
    * the apply itself is ONE additional hash join of that ≤|V|-row
    * reps frame against the corpus on doc_id — co-keyed, no window,
    * no second pass over text.
    */
  def fuzzyScrub(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64): DataFrame =
    docs.join(
        componentReps(docs, maxDist, bucketCap)
          .select(col("rep_id").as("doc_id"), col("component"),
            col("n_docs").as("cluster_size")),
        Seq("doc_id"))
      .select(col("doc_id"), col("component"), col("cluster_size"),
        (col("cluster_size") - 1).as("n_dups_removed"), col("source"))
      .orderBy(col("doc_id"))

  /** Oracle: the x33 fixpoint CTE chain + the quality projection,
    * argmax via a per-component rank (fine in DuckDB; the engine side
    * deliberately avoids the window form).
    */
  def clusterRepresentativesSql(maxDist: Int, bucketCap: Int = 64): String =
    s"""${repsCtes(maxDist, bucketCap)}
       |SELECT component, doc_id AS rep_id, n_docs, score
       |FROM ranked WHERE rk = 1 ORDER BY component""".stripMargin

  /** Shared x48/x76 oracle chain: simhash pairs → CC fixpoint →
    * quality-ranked members (`ranked`; rk = 1 is the representative).
    */
  private def repsCtes(maxDist: Int, bucketCap: Int): String =
    s"WITH RECURSIVE ${repsCtesBody(maxDist, bucketCap, "documents")}"

  /** The x48/x76 chain parameterized by its source relation so a
    * corpus SLICE (the x131 frozen corpus) can run the same CTEs
    * verbatim; `rel = "documents"` reproduces the historic strings
    * byte-for-byte.
    */
  private def repsCtesBody(maxDist: Int, bucketCap: Int,
      rel: String): String =
    s"""${simhashPairCtes(bucketCap, rel)},
       |edges AS MATERIALIZED (
       |  SELECT d1, d2 FROM pairs
       |  WHERE bit_count(xor(s1, s2)) <= $maxDist
       |),
       |bidir AS MATERIALIZED (
       |  SELECT d1 AS a, d2 AS b FROM edges
       |  UNION ALL SELECT d2, d1 FROM edges
       |),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS label FROM $rel
       |  UNION
       |  SELECT e.b, r.label FROM bidir e JOIN reach r ON r.node = e.a
       |),
       |comp AS (
       |  SELECT node AS doc_id, min(label) AS component
       |  FROM reach GROUP BY node
       |),
       |sc AS (
       |  SELECT doc_id,
       |         round(CAST(len(list_distinct(string_split(text, ' ')))
       |                 AS DOUBLE) / len(string_split(text, ' ')), 6)
       |           AS score
       |  FROM $rel
       |),
       |ranked AS (
       |  SELECT c.component, c.doc_id, sc.score,
       |         row_number() OVER (PARTITION BY c.component
       |           ORDER BY sc.score DESC, c.doc_id) AS rk,
       |         count(*) OVER (PARTITION BY c.component) AS n_docs
       |  FROM comp c JOIN sc USING (doc_id)
       |)""".stripMargin

  /** Oracle for x76: the x48 chain, representatives joined back to
    * the corpus row they keep.
    */
  def fuzzyScrubSql(maxDist: Int, bucketCap: Int = 64): String =
    s"""${repsCtes(maxDist, bucketCap)}
       |SELECT r.doc_id, r.component, r.n_docs AS cluster_size,
       |       r.n_docs - 1 AS n_dups_removed, d.source
       |FROM ranked r JOIN documents d USING (doc_id)
       |WHERE r.rk = 1 ORDER BY r.doc_id""".stripMargin

  /** X1: split-leakage audit — the check a training pipeline runs
    * before trusting its splits: for every near-dup pair, do the two
    * copies land in the same split? Audited under BOTH policies side
    * by side: `cluster` (x83's cluster-atomic assignment — crossings
    * are zero BY CONSTRUCTION, and this query proves it on the
    * actual corpus) and `doc_hash` (the naive per-document hash
    * everyone reaches for first — its crossing count is exactly the
    * number of eval-set documents whose near-copy was trained on).
    *
    * Scale shape: the near-dup pairs and CC labels are the x33
    * machinery; the audit itself is two co-keyed joins of the pair
    * list against the split projections and one 2-row aggregate.
    */
  def leakageAudit(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64, testPct: Int = 10, valPct: Int = 10)
      : DataFrame = {
    // pinned: the SAME near-dup pair list feeds the cluster
    // resolution and the audit itself — calling leakageSafeSplits
    // here would run the simhash machinery twice
    val pairs = graft.tools.Materialize(
      simhashNearDup(docs, maxDist, bucketCap).select(col("d1"), col("d2")))
    def splitOf(bucket: Column): Column =
      when(bucket < testPct, "test")
        .when(bucket < testPct + valPct, "val")
        .otherwise("train")
    val clusterSplits =
      connectedComponents(docs.select(col("doc_id")), pairs)
        .select(col("doc_id"),
          splitOf(expr(hash32FastExpr("cast(component AS string)"))
            % 100).as("cluster_split"))
    val naiveSplits = docs.select(col("doc_id"),
      splitOf(expr(hash32FastExpr("cast(doc_id AS string)")) % 100)
        .as("naive_split"))
    // pinned: both audit arms read the same sided pair table — the
    // simhash + CC machinery must not execute twice
    val sided = graft.tools.Materialize(pairs
      .join(clusterSplits.select(col("doc_id").as("d1"),
        col("cluster_split").as("c1")), "d1")
      .join(clusterSplits.select(col("doc_id").as("d2"),
        col("cluster_split").as("c2")), "d2")
      .join(naiveSplits.select(col("doc_id").as("d1"),
        col("naive_split").as("n1")), "d1")
      .join(naiveSplits.select(col("doc_id").as("d2"),
        col("naive_split").as("n2")), "d2"))
    sided.agg(count(lit(1)).as("n_pairs"),
        sum((col("c1") =!= col("c2")).cast("long")).as("n_cross"))
      .withColumn("policy", lit("cluster"))
      .unionByName(sided.agg(count(lit(1)).as("n_pairs"),
          sum((col("n1") =!= col("n2")).cast("long")).as("n_cross"))
        .withColumn("policy", lit("doc_hash")))
      .select(col("policy"), col("n_pairs"), col("n_cross"))
      .orderBy(col("policy"))
  }

  /** Oracle: the x83 chain + the naive per-doc hash, audited over the
    * same pair list.
    */
  def leakageAuditSql(maxDist: Int, bucketCap: Int = 64,
      testPct: Int = 10, valPct: Int = 10): String = {
    def splitCase(b: String): String =
      s"CASE WHEN $b < $testPct THEN 'test' " +
        s"WHEN $b < ${testPct + valPct} THEN 'val' ELSE 'train' END"
    val naiveB = s"(${hash32Expr("strpos", "CAST(doc_id AS VARCHAR)")}" +
      s" % 100)"
    val clusterB = s"(${hash32Expr("strpos", "CAST(component AS VARCHAR)")}" +
      s" % 100)"
    s"""${repsCtes(maxDist, bucketCap)},
       |cs AS (
       |  SELECT doc_id, ${splitCase(clusterB)} AS cluster_split
       |  FROM comp
       |),
       |nv AS (
       |  SELECT doc_id, ${splitCase(naiveB)} AS naive_split
       |  FROM documents
       |),
       |sided AS (
       |  SELECT p.d1, p.d2, c1.cluster_split AS c1, c2.cluster_split
       |    AS c2, n1.naive_split AS n1, n2.naive_split AS n2
       |  FROM edges p
       |  JOIN cs c1 ON c1.doc_id = p.d1
       |  JOIN cs c2 ON c2.doc_id = p.d2
       |  JOIN nv n1 ON n1.doc_id = p.d1
       |  JOIN nv n2 ON n2.doc_id = p.d2
       |)
       |SELECT policy, n_pairs, n_cross FROM (
       |  SELECT 'cluster' AS policy, CAST(count(*) AS BIGINT)
       |      AS n_pairs,
       |    CAST(sum(CASE WHEN c1 <> c2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_cross
       |  FROM sided
       |  UNION ALL
       |  SELECT 'doc_hash', CAST(count(*) AS BIGINT),
       |    CAST(sum(CASE WHEN n1 <> n2 THEN 1 ELSE 0 END) AS BIGINT)
       |  FROM sided
       |) ORDER BY policy""".stripMargin
  }

  /** X2a': MinHash Jaccard ESTIMATION vs exact — the sketch-accuracy
    * face of the minhash family (the x61/x79 est-vs-exact
    * convention): at 100 TB nobody computes exact shingle-set
    * Jaccard for every candidate pair; they compare `perms`
    * permutation minima and take the match fraction. This operator
    * emits both numbers side by side (plus the absolute error) for
    * every x04 candidate pair, which is how a pipeline calibrates
    * its permutation count before trusting the estimate.
    *
    * Exact Jaccard here is over the FULL (uncapped) shingle sets —
    * intersection counted only for the bounded candidate pairs via
    * two co-keyed joins; the estimate's signature table is ONE
    * groupBy carrying all `perms` minima as map-side partial min
    * aggregates (no ×perms row explosion on the engine side — the
    * x02 trick).
    */
  def minhashEstimate(docs: DataFrame, perms: Int, dfCap: Int,
      threshold: Double): DataFrame = {
    // pinned: the candidate frame feeds BOTH the endpoint set build
    // and the final pair report — without the pin the whole shingle
    // bucket machinery executes twice (measured 5.6 s vs 3.1 s)
    val pairs = graft.tools.Materialize(
      jaccardPairs(docs, dfCap, threshold).select(col("d1"), col("d2")))
    val endpoints = pairs
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
    // Carter–Wegman permutation family over Z_p (p = 2³¹−1): ONE md5
    // per shingle parsed to a 28-bit x, permutation b's value is
    // (a_b·x + c_b) mod p with per-permutation constants baked into
    // both dialects as literals. Products stay < 2⁵⁹ — no overflow
    // in ANSI mode, nothing engine-specific. The naive per-band-md5
    // form costs perms× the digest work per shingle row (measured
    // 20.6 s at sf0.1 vs ~2 s here); pairwise independence is what
    // the MinHash estimator needs. (h1 + b·h2 WITHOUT the modulus
    // was tried and rejected: for b ≥ 16 the argmin collapses to
    // argmin h2 across all bands — est errors up to 0.93.)
    val (pa, pc) = permConsts(perms)
    // Everything this report needs per ENDPOINT doc — the full
    // (uncapped) distinct shingle set, its size, and the perms
    // permutation minima (graft.functions.MinhashSig, the array-state
    // aggregate) — falls out of ONE endpoint-bounded aggregate over
    // the shingle explosion. The previous form paid two corpus-wide
    // co-keyed joins for the intersection counts, a full corpus size
    // aggregate, and a separate endpoint signature aggregate — four
    // corpus-scale operators for a report whose rows are
    // candidate-pair-bounded. Intersection = |sa ∩ sb| over the
    // distinct sets (identical count to the co-keyed join), the
    // minima are the same (x·a+c) mod p integers.
    val sets = graft.tools.Materialize(
      shingles(docs).join(endpoints, "doc_id")
        .withColumn("x",
          expr("cast(conv(substr(md5(s), 1, 7), 16, 10) as bigint)"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("s"))).as("ss"),
          graft.functions.MinhashSig.minhash_sig(pa, pc, MersenneP)(
            col("x")).as("sig"))
        .withColumn("sz", size(col("ss")).cast("long"))
        .select(col("doc_id"), col("ss"), col("sz"), col("sig")))
    val sideA = sets.select(col("doc_id").as("d1"), col("ss").as("sa"),
      col("sz").as("sz1"), col("sig").as("siga"))
    val sideB = sets.select(col("doc_id").as("d2"), col("ss").as("sb"),
      col("sz").as("sz2"), col("sig").as("sigb"))
    val matchExpr = expr(
      """aggregate(zip_with(siga, sigb,
        |  (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
        |  0, (acc, v) -> acc + v)""".stripMargin)
    val exactJac = round(col("inter") /
      (col("sz1") + col("sz2") - col("inter")), 6)
    pairs
      .join(sideA, "d1").join(sideB, "d2")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb")))
        .cast("long"))
      .withColumn("exact_jac", exactJac)
      .withColumn("matches", matchExpr)
      .withColumn("est_jac",
        round(col("matches").cast("double") / perms, 6))
      .withColumn("abs_err",
        round(abs(col("est_jac") - col("exact_jac")), 6))
      .select(col("d1"), col("d2"), col("inter"), col("sz1"), col("sz2"),
        col("exact_jac"), col("matches"), col("est_jac"), col("abs_err"))
      .orderBy(col("d1"), col("d2"))
  }

  def minhashEstimateSql(perms: Int, dfCap: Int,
      threshold: Double): String =
    s"""WITH sh AS ($shinglesSql),
       |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $dfCap),
       |capped AS (
       |  SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s
       |), csz AS (
       |  SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id
       |), cinter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), pairs AS (
       |  SELECT d1, d2 FROM cinter
       |  JOIN csz s1 ON s1.doc_id = d1 JOIN csz s2 ON s2.doc_id = d2
       |  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter)
       |    >= $threshold
       |), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |iall AS (
       |  SELECT p.d1, p.d2, CAST(count(*) AS BIGINT) AS inter
       |  FROM pairs p
       |  JOIN sh x ON x.doc_id = p.d1
       |  JOIN sh y ON y.doc_id = p.d2 AND y.s = x.s
       |  GROUP BY 1, 2
       |), eps AS (
       |  SELECT d1 AS doc_id FROM pairs
       |  UNION SELECT d2 FROM pairs
       |), hs AS (
       |  SELECT sh.doc_id,
       |    ${hexParseExpr("instr", "hh", 1, 7)} AS x
       |  FROM (SELECT doc_id, md5(s) AS hh
       |        FROM sh JOIN eps USING (doc_id)) sh
       |), consts(b, a, c) AS (
       |  VALUES ${permConstsValuesSql(perms)}
       |), mins AS (
       |  SELECT doc_id, b, min((x * a + c) % $MersenneP) AS mh
       |  FROM hs CROSS JOIN consts
       |  GROUP BY 1, 2
       |), m AS (
       |  SELECT p.d1, p.d2,
       |    CAST(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS INT)
       |      AS matches
       |  FROM pairs p
       |  JOIN mins ma ON ma.doc_id = p.d1
       |  JOIN mins mb ON mb.doc_id = p.d2 AND mb.b = ma.b
       |  GROUP BY 1, 2
       |)
       |SELECT i.d1, i.d2, i.inter,
       |  CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2,
       |  round(CAST(i.inter AS DOUBLE) / (s1.sz + s2.sz - i.inter), 6)
       |    AS exact_jac,
       |  m.matches,
       |  round(CAST(m.matches AS DOUBLE) / $perms, 6) AS est_jac,
       |  round(abs(round(CAST(m.matches AS DOUBLE) / $perms, 6)
       |    - round(CAST(i.inter AS DOUBLE)
       |        / (s1.sz + s2.sz - i.inter), 6)), 6) AS abs_err
       |FROM iall i
       |JOIN m ON m.d1 = i.d1 AND m.d2 = i.d2
       |JOIN sz s1 ON s1.doc_id = i.d1
       |JOIN sz s2 ON s2.doc_id = i.d2
       |ORDER BY i.d1, i.d2""".stripMargin

  /** The (bands, rows-per-band) grid the x116 planner scores: every
    * factorization of `perms`=128 into powers of two with r ≥ 2
    * (r = 1 degenerates to exact-signature matching). Stored as
    * (bands, rowsPerBand, log2 r, log2 bands) so BOTH dialects build
    * the S-curve by repeated squaring — exact IEEE multiplications,
    * no libm pow anywhere.
    */
  private val lshGrid: Seq[(Int, Int, Int, Int)] =
    Seq((64, 2, 1, 6), (32, 4, 2, 5), (16, 8, 3, 4),
      (8, 16, 4, 3), (4, 32, 5, 2))

  /** X1: LSH parameter planner — the banding policy table computed
    * BEFORE committing to a (bands × rows-per-band) MinHash config.
    * For every x04 calibration pair with capped-set Jaccard s, the
    * probability a b-band/r-row signature scheme surfaces the pair
    * is the standard S-curve 1 − (1 − sʳ)ᵇ; summed over pairs it
    * prices each config in one table: expected caught candidates,
    * expected MISSED true duplicates (s ≥ dupTheta — the silent
    * recall hole), and expected spurious candidates (s < dupTheta —
    * the wasted verification work). The knee the curve is chosen on,
    * from the corpus's own pair-similarity distribution rather than
    * a textbook default.
    *
    * Determinism: sʳ and (1−sʳ)ᵇ are built by REPEATED SQUARING
    * (r and b are powers of two) — plain IEEE multiplies that agree
    * bit-for-bit across engines, where pow()'s libm rounding does
    * not — and each pair's probability quantizes to integer
    * nano-units before the sum (the PSI/DSIR idiom), so report
    * values are exact integers in any aggregation order.
    *
    * Scale shape: the x04 bounded candidate machinery (df-capped
    * buckets), then a |grid|-way map-side explode and ONE hash agg
    * to |grid| rows. Nothing new touches the corpus.
    */
  def lshPlanner(docs: DataFrame, dfCap: Int, threshold: Double,
      dupTheta: Double): DataFrame =
    lshPlannerFrom(jaccardPairs(docs, dfCap, threshold), dupTheta)

  /** [[lshPlanner]] over a caller-supplied x04 pair table (x141
    * shares one pinned shingle explosion between the planner and its
    * signature pass).
    */
  private[graft] def lshPlannerFrom(jp: DataFrame,
      dupTheta: Double): DataFrame = {
    def sq(c: Column, k: Int): Column =
      (1 to k).foldLeft(c)((a, _) => a * a)
    val pairs = jp.select(col("jaccard"))
    val configs = lshGrid.map { case (b, r, kr, kb) =>
      val p = lit(1.0) - sq(lit(1.0) - sq(col("jaccard"), kr), kb)
      struct(lit(b).as("bands"), lit(r).as("rows_per_band"),
        round(p * lit(1e9), 0).cast("long").as("p_nano"))
    }
    pairs
      .select(col("jaccard"),
        explode(array(configs: _*)).as("c"))
      .select(col("c.bands").as("bands"),
        col("c.rows_per_band").as("rows_per_band"),
        col("c.p_nano").as("p_nano"),
        (col("jaccard") >= dupTheta).as("is_dup"))
      .groupBy(col("bands"), col("rows_per_band"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("is_dup").cast("long")).as("n_dups"),
        sum(col("p_nano")).as("caught_nano"),
        sum(when(col("is_dup"), lit(1000000000L) - col("p_nano"))
          .otherwise(lit(0L))).as("missed_dup_nano"),
        sum(when(!col("is_dup"), col("p_nano")).otherwise(lit(0L)))
          .as("spurious_nano"))
      .orderBy(col("rows_per_band"))
  }

  def lshPlannerSql(dfCap: Int, threshold: Double,
      dupTheta: Double): String = {
    def sq(e: String, k: Int): String =
      (1 to k).foldLeft(e)((a, _) => s"($a * $a)")
    val arms = lshGrid.map { case (b, r, kr, kb) =>
      val p = s"(1.0 - ${sq(s"(1.0 - ${sq("jaccard", kr)})", kb)})"
      s"""SELECT $b AS bands, $r AS rows_per_band,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(CASE WHEN jaccard >= $dupTheta THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dups,
         |  CAST(sum(CAST(round($p * 1e9, 0) AS BIGINT)) AS BIGINT)
         |    AS caught_nano,
         |  CAST(sum(CASE WHEN jaccard >= $dupTheta
         |    THEN 1000000000 - CAST(round($p * 1e9, 0) AS BIGINT)
         |    ELSE 0 END) AS BIGINT) AS missed_dup_nano,
         |  CAST(sum(CASE WHEN jaccard < $dupTheta
         |    THEN CAST(round($p * 1e9, 0) AS BIGINT)
         |    ELSE 0 END) AS BIGINT) AS spurious_nano
         |FROM pairs""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH pairs AS (
       |${jaccardPairsSql(dfCap, threshold)}
       |)
       |$arms
       |ORDER BY rows_per_band""".stripMargin
  }

  /** X1r: planner-DRIVEN MinHash bucketing — closes the x116
    * planner→executor loop (VERDICT r9 #4): the argmin-total-error
    * config (expected missed true duplicates + expected spurious
    * candidates, ties toward fewer rows per band) is SELECTED FROM
    * THE PLANNER TABLE at runtime and the banded bucketing runs
    * under it — the self-tuning form of x02, choosing its knee from
    * the corpus's own pair-similarity distribution instead of a
    * textbook default.
    *
    * The runtime-config trick: ALL `perms`=128 Carter–Wegman
    * permutation minima are computed per document in ONE groupBy
    * (the x87 signature builder over the whole corpus — fixed work
    * independent of the chosen config), then band b under config
    * (bands, r) is md5 of the comma-joined minima [b·r, (b+1)·r) —
    * a pure projection in which (bands, r) are COLUMNS from the
    * 1-row argmin frame, so no plan reshaping depends on the choice.
    * Bucket rollup shared verbatim with x02 ([[bucketRollup]]).
    *
    * Scale shape: the planner is the x04 bounded candidate machinery
    * + a |grid|-row aggregate, collapsed to ONE 2-int config row on
    * the driver (the localized-model-frame idiom — a hard broadcast
    * of the non-provable pinned frame flags PlanAudit, and a 1-row
    * transfer of the argmin of a 5-row table is the audited serve
    * pattern); the signature pass is one hash aggregate with 128 min
    * states (the x02/x87 no-explosion trick); banding is a map-only
    * projection under the chosen literals; the rollup is the x02
    * exchange. The oracle keeps the scalar-subquery form end to end.
    */
  def plannedMinhash(docs: DataFrame, dfCap: Int, threshold: Double,
      dupTheta: Double, perms: Int = 128): DataFrame = {
    // ONE pinned shingle explosion feeds both the planner's candidate
    // chain and the full-corpus signature pass below — previously the
    // corpus was re-tokenized and re-exploded for each (a full text
    // pass at scale, and the single most expensive map stage here)
    val sh = graft.tools.Materialize(shingles(docs))
    val bestRows = lshPlannerFrom(
        jaccardPairsFrom(sh, dfCap, threshold), dupTheta)
      .orderBy((col("missed_dup_nano") + col("spurious_nano")).asc,
        col("rows_per_band").asc)
      .limit(1)
      .select(col("bands"), col("rows_per_band"))
      .collect()
    val spark = docs.sparkSession
    import spark.implicits._
    if (bestRows.isEmpty)
      // no calibration pairs → no evidence to plan on: empty table
      // (same schema), the caller falls back to the x02 defaults
      return Seq.empty[(Int, Int, Int, String, Long, Long, Long)]
        .toDF("bands", "rows_per_band", "b", "mh",
          "n_docs", "d_min", "d_max")
    val bands = bestRows(0).getInt(0)
    val rpb = bestRows(0).getInt(1)
    // all `perms` minima in ONE array-state aggregate
    // (graft.functions.MinhashSig): the previous 128 separate min
    // columns blew the 100-field codegen limit and dropped the whole
    // signature plan to interpreted evaluation (18.5 s of task time
    // at sf0.1 for ~35M multiply-mods)
    val (pa, pc) = permConsts(perms)
    val sig = sh
      .withColumn("hh", md5(col("s")))
      .withColumn("x",
        expr("cast(conv(substr(hh, 1, 7), 16, 10) as bigint)"))
      .groupBy(col("doc_id"))
      .agg(graft.functions.MinhashSig.minhash_sig(pa, pc, MersenneP)(
        col("x")).as("pm"))
    val banded = sig
      .select(col("doc_id"), col("pm"),
        explode(expr(s"sequence(0, ${bands - 1})")).as("b"))
      .withColumn("mh", md5(array_join(
        transform(
          slice(col("pm"), col("b") * lit(rpb) + lit(1), lit(rpb)),
          v => v.cast("string")), ",")))
    bucketRollup(banded.select(col("doc_id"), col("b"), col("mh")))
      .select(lit(bands).as("bands"), lit(rpb).as("rows_per_band"),
        col("b"), col("mh"), col("n_docs"), col("d_min"), col("d_max"))
      .orderBy(col("b"), col("mh"))
  }

  /** Oracle: the x116 planner SQL as a CTE, scalar-subquery argmin,
    * the x87 permutation chain over all docs, ordered string_agg
    * banding — same comma-joined digest text as the engine.
    */
  def plannedMinhashSql(dfCap: Int, threshold: Double,
      dupTheta: Double, perms: Int = 128): String =
    s"""WITH planner AS (
       |${lshPlannerSql(dfCap, threshold, dupTheta)}
       |), best AS (
       |  SELECT bands, rows_per_band FROM planner
       |  ORDER BY missed_dup_nano + spurious_nano, rows_per_band
       |  LIMIT 1
       |), sh2 AS ($shinglesSql),
       |hs2 AS (
       |  SELECT doc_id, ${hexParseExpr("instr", "hh", 1, 7)} AS x
       |  FROM (SELECT doc_id, md5(s) AS hh FROM sh2) q
       |), consts2(perm, a, c) AS (
       |  VALUES ${permConstsValuesSql(perms)}
       |), mins2 AS (
       |  SELECT doc_id, perm, min((x * a + c) % $MersenneP) AS mh
       |  FROM hs2 CROSS JOIN consts2
       |  GROUP BY 1, 2
       |), banded AS (
       |  SELECT doc_id,
       |    CAST(perm // (SELECT rows_per_band FROM best) AS INT) AS b,
       |    md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS mh
       |  FROM mins2
       |  GROUP BY doc_id, perm // (SELECT rows_per_band FROM best)
       |), bk2 AS (
       |  SELECT b, mh, CAST(count(*) AS BIGINT) AS n_docs,
       |         min(doc_id) AS d_min, max(doc_id) AS d_max
       |  FROM banded GROUP BY b, mh HAVING count(*) > 1
       |)
       |SELECT best.bands, best.rows_per_band, bk2.b, bk2.mh,
       |       bk2.n_docs, bk2.d_min, bk2.d_max
       |FROM bk2 CROSS JOIN best
       |ORDER BY bk2.b, bk2.mh""".stripMargin

  /** X1: leakage-safe train/val/test splits — the split assignment a
    * training pipeline must use instead of hashing doc ids: hashing
    * per-document lets two near-duplicates straddle train and test,
    * which silently inflates eval scores (the test set "leaks" into
    * training). Here every document inherits the split of its
    * near-dup CLUSTER (md5 of the x33 component id, mod 100 →
    * test / val / train bands), so a cluster is atomic across
    * splits: either all its copies train or none do.
    *
    * Scale shape: the x33 CC machinery (endpoint-bounded rounds) plus
    * one map-only hash projection — no new exchanges beyond the
    * cluster resolution itself.
    */
  def leakageSafeSplits(docs: DataFrame, maxDist: Int,
      bucketCap: Int = 64, testPct: Int = 10, valPct: Int = 10)
      : DataFrame = {
    val pairs = simhashNearDup(docs, maxDist, bucketCap)
      .select(col("d1"), col("d2"))
    connectedComponents(docs.select(col("doc_id")), pairs)
      .withColumn("bucket",
        expr(hash32FastExpr("cast(component AS string)")) % 100)
      .withColumn("split",
        when(col("bucket") < testPct, "test")
          .when(col("bucket") < testPct + valPct, "val")
          .otherwise("train"))
      .select(col("doc_id"), col("component"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: the x33 CC fixpoint + the identical md5-band hash. */
  def leakageSafeSplitsSql(maxDist: Int, bucketCap: Int = 64,
      testPct: Int = 10, valPct: Int = 10): String =
    s"""${repsCtes(maxDist, bucketCap)}
       |SELECT doc_id, component,
       |  ${hash32Expr("strpos", "CAST(component AS VARCHAR)")} % 100
       |    AS bucket,
       |  CASE WHEN ${hash32Expr("strpos", "CAST(component AS VARCHAR)")}
       |         % 100 < $testPct THEN 'test'
       |       WHEN ${hash32Expr("strpos", "CAST(component AS VARCHAR)")}
       |         % 100 < ${testPct + valPct} THEN 'val'
       |       ELSE 'train' END AS split
       |FROM comp ORDER BY doc_id""".stripMargin

  /** X1 span-level exact dedup (Lee et al.-style "deduplicating
    * training data" at sub-document granularity): chunk every
    * document into fixed `span`-token windows, keep each distinct
    * span's first occurrence (min (doc_id, span_idx) — the canonical
    * keeper), drop every other copy, and reassemble the surviving
    * spans per document. Exact duplicate documents lose everything
    * but their first copy; partially-overlapping docs lose exactly
    * the repeated spans.
    *
    * Three key-grouped shuffles, all linear in corpus size: the
    * keeper election groups on md5(span) (fixed-width keys instead of
    * full span text through the exchange), the verdict join is
    * hash-keyed on the same digest, and reassembly groups on doc_id.
    * Nothing enumerates pairs; per-span state is one (doc_id,
    * span_idx) struct.
    */
  def spanDedup(docs: DataFrame, span: Int): DataFrame = {
    require(span >= 1)
    val spans = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(t) / ${span}.0) as int) - 1)," +
          s" i -> concat_ws(' ', slice(t, i * $span + 1, $span)))"))
        .as(Seq("span_idx", "span")))
      .withColumn("h", md5(col("span")))
    val keepers = spans.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("k"))
      .select(col("h"), col("k.doc_id").as("kd"), col("k.span_idx").as("ks"))
    spans.join(keepers, "h")
      .withColumn("kept",
        col("doc_id") === col("kd") && col("span_idx") === col("ks"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("kept").cast("long")).as("n_kept"),
        concat_ws(" ", expr(
          """transform(array_sort(collect_list(
            |  CASE WHEN kept THEN struct(span_idx, span) END)),
            | s -> s.span)""".stripMargin)).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  def spanDedupSql(span: Int): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), spans AS (
       |  SELECT doc_id, CAST(i AS INT) AS span_idx,
       |         array_to_string(t[i*$span+1 : (i+1)*$span], ' ') AS span
       |  FROM t, UNNEST(range(CAST(ceil(len(t) / $span.0) AS BIGINT))) AS r(i)
       |), keep AS (
       |  SELECT h, doc_id AS kd, span_idx AS ks FROM (
       |    SELECT md5(span) AS h, doc_id, span_idx,
       |           row_number() OVER (PARTITION BY md5(span)
       |             ORDER BY doc_id, span_idx) AS rn
       |    FROM spans) WHERE rn = 1
       |), j AS (
       |  SELECT s.doc_id, s.span_idx, s.span,
       |         (s.doc_id = k.kd AND s.span_idx = k.ks) AS kept
       |  FROM spans s JOIN keep k ON md5(s.span) = k.h
       |)
       |SELECT doc_id, count(*) AS n_spans,
       |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  COALESCE(string_agg(CASE WHEN kept THEN span END, ' '
       |    ORDER BY span_idx), '') AS clean_text
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def simhashSql: String = {
    val bitSums = (0 until 16).map { j =>
      s"sum(CASE WHEN (v // ${1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val assemble = (0 until 16).map { j =>
      s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
       |  FROM documents
       |), hv AS (
       |  SELECT doc_id, ${hash16Expr("strpos", "w")} AS v FROM tok
       |), bs AS (
       |  SELECT doc_id, $bitSums FROM hv GROUP BY doc_id
       |)
       |SELECT doc_id, $assemble AS simhash FROM bs ORDER BY doc_id""".stripMargin
  }

  /** X2c: n-gram Jaccard similarity over candidate pairs from a
    * shared-shingle join. Shingles seen in more than `dfCap` docs are
    * dropped first (non-discriminative, and the cap is what bounds
    * the pair blow-up at scale); Jaccard is over the capped sets in
    * both dialects.
    */
  /** Df-capped per-shingle doc-list table (s, ds) — the shared
    * candidate-generation backbone of [[jaccardPairs]],
    * [[containmentPairs]], and the streaming ingest prescreen
    * (DocumentsStream.shingleCandidates). ONE groupBy(s) over the
    * shingle explosion builds the capped lists via the cap-and-drop
    * BoundedMinK aggregate — its buffer never exceeds dfCap+1
    * entries, so a stop-word shingle appearing in most of a 100 TB
    * corpus cannot materialize its doc list (the single-buffer OOM a
    * post-hoc size filter would allow), and there is no second
    * aggregation pass over the exploded rows.
    * Materialized: every caller has at least two consumers (sizes +
    * pair explosion, or a long-lived stream-static join) and Catalyst
    * does not reuse the exchange across them (verified in the plan);
    * the capped bucket table is tiny relative to the shingle
    * explosion, so pinning it once is strictly cheaper than
    * recomputing the explosion + aggregate per consumer.
    */
  def shingleBuckets(docs: DataFrame, dfCap: Int): DataFrame =
    shingleBucketsFrom(shingles(docs), dfCap)

  /** The df-capped bucket table from an ALREADY-built (doc_id, s)
    * shingle frame — lets a caller that also consumes raw shingles
    * (x141's signature pass) pin the explosion once and share it.
    */
  def shingleBucketsFrom(sh: DataFrame, dfCap: Int): DataFrame =
    sh.groupBy(col("s"))
      .agg(graft.functions.MinK.bounded_min_k(dfCap)(col("doc_id"))
        .as("ds"))
      .filter(size(col("ds")) > 0)
      .transform(graft.tools.Materialize(_))

  def jaccardPairs(docs: DataFrame, dfCap: Int, threshold: Double): DataFrame =
    jaccardPairsFrom(shingles(docs), dfCap, threshold)

  /** [[jaccardPairs]] over a caller-supplied shingle frame. */
  private[graft] def jaccardPairsFrom(sh: DataFrame, dfCap: Int,
      threshold: Double): DataFrame = {
    // Candidate pairs are enumerated inside each surviving bucket —
    // at most dfCap²/2 per shingle, the bound that keeps the pair
    // blow-up linear — and per-doc set sizes fall out of the same
    // bucketed table, so the two consumers share one exchange instead
    // of recomputing the explosion four times.
    val buckets = shingleBucketsFrom(sh, dfCap)
    val sizes = buckets
      .select(explode(col("ds")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = buckets
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .agg(count(lit(1)).as("inter"))
    // sizes is one row per document in any capped bucket — O(corpus),
    // so no broadcast hint: AQE picks broadcast when the side is
    // actually small and a shuffled hash join once it isn't
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("sz", "sz2"), "d2")
      .withColumn("jaccard", col("inter") /
        (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("inter"), col("sz1"), col("sz2"),
        round(col("jaccard"), 6).as("jaccard"))
    // NO presentation sort here: of the nine consumers (x04, graph
    // family, planners, calibration reports, attribution matrix) only
    // the x04 query itself needs (d1, d2) order, and it adds its own
    // orderBy — every other consumer aggregates or collects, and the
    // global sort was a pure extra exchange in all of them (guide
    // §2.4: an orderBy used only for output determinism)
  }

  /** Shared CTE chain ending in `jp` = the x04 scored pair table
    * (d1, d2, inter, sz1, sz2, jaccard) — reused verbatim by the
    * source-attribution matrix oracle so both dialects price the
    * same candidate set.
    */
  private[graft] def jaccardPairsCtesSql(dfCap: Int,
      threshold: Double): String =
    s"""sh AS ($shinglesSql),
       |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $dfCap),
       |capped AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |jp AS (
       |  SELECT d1, d2, inter, s1.sz AS sz1, s2.sz AS sz2,
       |         round(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 6)
       |           AS jaccard
       |  FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter)
       |    >= $threshold
       |)""".stripMargin

  def jaccardPairsSql(dfCap: Int, threshold: Double): String =
    s"""WITH ${jaccardPairsCtesSql(dfCap, threshold)}
       |SELECT d1, d2, inter, sz1, sz2, jaccard FROM jp
       |ORDER BY d1, d2""".stripMargin

  /** X1m: near-dup SOURCE-ATTRIBUTION matrix — every x04 candidate
    * pair rolled up by its endpoints' (source_a, source_b) label
    * pair (unordered, least/greatest): pair count, mean and max
    * Jaccard in exact integer millionths. The table that says WHICH
    * sources mirror each other (crawl overlap, mirror sites,
    * cross-posting) and how much of the dedup bill is intra- vs
    * inter-source — the input to a "drop the copying source"
    * curation decision, which per-pair lists are far too big to eye.
    *
    * Scale shape: the bounded x04 candidate machinery (df-capped
    * buckets, ≤ dfCap²/2 pairs each), two co-keyed joins to the
    * narrow (doc_id, source) projection, one hash aggregate to
    * ≤ |sources|² rows. Jaccard is quantized to integer millionths
    * BEFORE the sum, so mean = sum div n is exact in any engine.
    */
  def dupSourceMatrix(docs: DataFrame, dfCap: Int,
      threshold: Double): DataFrame = {
    val jm = jaccardPairs(docs, dfCap, threshold)
      .select(col("d1"), col("d2"),
        round(col("inter") * lit(1000000.0) /
          (col("sz1") + col("sz2") - col("inter"))).cast("long").as("jm"))
    val src = docs.select(col("doc_id"), col("source"))
    jm
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")),
        "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")),
        "d2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"), col("jm"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(jm) div count(1)").as("mean_jac_micro"),
        max(col("jm")).as("max_jac_micro"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Oracle: the shared x04 `jp` chain + the same least/greatest
    * label fold and integer-millionth quantization.
    */
  def dupSourceMatrixSql(dfCap: Int, threshold: Double): String =
    s"""WITH ${jaccardPairsCtesSql(dfCap, threshold)},
       |lab AS (
       |  SELECT least(da.source, db.source) AS source_a,
       |         greatest(da.source, db.source) AS source_b,
       |         CAST(round(CAST(inter AS BIGINT) * 1000000.0
       |           / (sz1 + sz2 - inter)) AS BIGINT) AS jm
       |  FROM jp
       |  JOIN documents da ON da.doc_id = jp.d1
       |  JOIN documents db ON db.doc_id = jp.d2
       |)
       |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(sum(jm) // count(*) AS BIGINT) AS mean_jac_micro,
       |       CAST(max(jm) AS BIGINT) AS max_jac_micro
       |FROM lab GROUP BY 1, 2
       |ORDER BY source_a, source_b""".stripMargin

  /** X1o: dedup-threshold ROI SWEEP — price every candidate Jaccard
    * threshold on the corpus's own x04 candidate pairs before
    * committing a dedup run: per threshold (integer millionths), the
    * surviving pair count, the documents a keep-min-id policy would
    * remove (docs with at least one SMALLER-id neighbor at ≥ the
    * threshold — the greedy lower bound of what a full x33 CC pass
    * removes), and their exact token mass. x118 histograms ONE
    * configured pipeline; this is the knob-choosing table ("0.8
    * deletes 2% of tokens, 0.5 deletes 19%") off a single candidate
    * enumeration — the x121 sweep idiom pointed at the dedup knob.
    *
    * Scale shape: the bounded x04 candidate machinery once
    * (threshold 0 keeps every bucket-cohabiting pair), quantized to
    * integer millionths, a \|thresholds\|-way map-side explode, one
    * pair-count hash agg + one (threshold, victim) dedup agg joined
    * to the narrow token projection. A threshold no pair survives
    * produces no row (same in both dialects).
    */
  def dedupThresholdSweep(docs: DataFrame, dfCap: Int,
      thrMicro: Seq[Long]): DataFrame = {
    require(thrMicro.nonEmpty)
    val jm = graft.tools.Materialize(
      jaccardPairs(docs, dfCap, threshold = 0.0)
        .select(col("d2"),
          round(col("inter") * lit(1000000.0) /
            (col("sz1") + col("sz2") - col("inter")))
            .cast("long").as("jm")))
    val perT = jm
      .withColumn("thr_micro",
        explode(array(thrMicro.sorted.map(lit): _*)))
      .filter(col("jm") >= col("thr_micro"))
    val pairsAgg = perT.groupBy(col("thr_micro"))
      .agg(count(lit(1)).as("n_pairs"))
    val victims = perT.select(col("thr_micro"), col("d2")).distinct()
    val toks = docs.select(col("doc_id").as("d2"),
      size(split(col("text"), " ")).cast("long").as("nt"))
    val remAgg = victims.join(toks, "d2")
      .groupBy(col("thr_micro"))
      .agg(count(lit(1)).as("n_removable_docs"),
        sum(col("nt")).as("tokens_removable"))
    pairsAgg.join(remAgg, Seq("thr_micro"))
      .orderBy(col("thr_micro"))
  }

  /** Oracle: shared x04 `jp` chain at threshold 0, same integer
    * quantization and sweep.
    */
  def dedupThresholdSweepSql(dfCap: Int, thrMicro: Seq[Long]): String = {
    val arr = thrMicro.sorted.mkString("[", ", ", "]")
    s"""WITH ${jaccardPairsCtesSql(dfCap, 0.0)},
       |jm AS (
       |  SELECT d2, CAST(round(CAST(inter AS BIGINT) * 1000000.0
       |    / (sz1 + sz2 - inter)) AS BIGINT) AS jm
       |  FROM jp
       |), pt AS (
       |  SELECT t.thr_micro, jm.d2
       |  FROM jm, UNNEST($arr) AS t(thr_micro)
       |  WHERE jm.jm >= t.thr_micro
       |), pa AS (
       |  SELECT thr_micro, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM pt GROUP BY 1
       |), v AS (
       |  SELECT DISTINCT thr_micro, d2 FROM pt
       |), tk AS (
       |  SELECT doc_id AS d2,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
       |  FROM documents
       |), ra AS (
       |  SELECT thr_micro, CAST(count(*) AS BIGINT) AS n_removable_docs,
       |         CAST(sum(nt) AS BIGINT) AS tokens_removable
       |  FROM v JOIN tk USING (d2) GROUP BY 1
       |)
       |SELECT pa.thr_micro, n_pairs, n_removable_docs, tokens_removable
       |FROM pa JOIN ra USING (thr_micro)
       |ORDER BY pa.thr_micro""".stripMargin
  }

  /** X2d: n-gram CONTAINMENT pairs — |grams(a) ∩ grams(b)| / |grams(a)|,
    * the asymmetric cousin of Jaccard that catches sub-document
    * duplication (doc a embedded in a longer doc b scores ~1.0 in the
    * a→b direction while Jaccard stays low). Same capped-bucket
    * machinery as [[jaccardPairs]]: one bounded MinK aggregate builds
    * df-capped per-shingle doc lists, pairs are enumerated inside
    * surviving buckets (≤ dfCap²/2 each), and both directions of each
    * unordered pair are scored from the same intersection count —
    * containment is over the capped sets in both dialects.
    */
  def containmentPairs(docs: DataFrame, dfCap: Int, threshold: Double)
      : DataFrame = {
    val buckets = shingleBuckets(docs, dfCap)
    // BOTH directions of every in-bucket pair from ONE explode and
    // ONE hash aggregate: the previous form aggregated the undirected
    // pair table and unioned two projections of it, which Catalyst
    // plans as TWO full explode+aggregate subtrees (verified in the
    // x62/x106 dumps: two Generate, two exchanges, no ReusedExchange).
    // Emitting the (a,b) and (b,a) structs in-row keeps the same
    // directed counts — each bucket co-occurrence contributes one row
    // to each direction — with half the enumeration work and one
    // exchange instead of two.
    val both = buckets
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  flatten(transform(slice(ds, i + 2, size(ds)), y ->
          |    array(struct(x AS a, y AS b), struct(y AS a, x AS b))))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
    containmentScore(both, buckets, threshold)
  }

  /** The containment-score finisher — directed (a, b, inter) rows
    * against the capped per-doc set sizes from the SAME bucket table,
    * threshold cut at 6dp. Shared by [[containmentPairs]] and the
    * streaming drain-time finisher
    * (DocumentsStream.containmentAtDrain), so the two paths score
    * with identical expressions.
    */
  private[graft] def containmentScore(pairs: DataFrame, buckets: DataFrame,
      threshold: Double): DataFrame = {
    val sizes = buckets
      .select(explode(col("ds")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("sz_a"))
    pairs.join(sizes, "a")
      .withColumn("containment", col("inter") / col("sz_a"))
      .filter(col("containment") >= threshold)
      .select(col("a"), col("b"), col("inter"), col("sz_a"),
        round(col("containment"), 6).as("containment"))
      .orderBy(col("a"), col("b"))
  }

  /** Exact duplicated-substring spans: the sliding-window form of
    * exact substring dedup (the pass suffix-array pipelines run over
    * training corpora — find every maximal token range whose content
    * also occurs elsewhere). x39's spanDedup only sees duplication
    * aligned to fixed non-overlapping windows; this operator slides a
    * k-token window over EVERY position, marks positions whose k-gram
    * occurs ≥2 times corpus-wide (cross-doc or within-doc), and
    * coalesces overlapping/adjacent duplicated windows into maximal
    * spans per document (gaps-and-islands over the gram start
    * positions: a new island starts when the gap to the previous
    * duplicated start exceeds k).
    *
    * Scale shape: one narrow (doc_id, pos, md5) gram exchange for the
    * global frequency count, a co-keyed join back on the hash, a
    * PER-DOCUMENT window (partition key = doc_id, bounded by doc
    * length), and a doc_id-keyed join to slice the span text. Nothing
    * is pairwise; cost is linear in corpus token count, exactly the
    * posture the 50-token-window pass needs at 100 TB.
    */
  def substringDupSpans(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val toks = tokenArrays(docs)
    val grams = slidingGrams(toks, k)
    val dupH = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("h"))
    val dupPos = grams.join(dupH, "h").select(col("doc_id"), col("pos"))
    coalesceDupSpans(dupPos, toks, k)
  }

  private[graft] def tokenArrays(docs: DataFrame): DataFrame =
    graft.tools.Spread(docs)
      .select(col("doc_id"), split(col("text"), " ").as("t"))

  /** (doc_id, pos, h = md5 of the k-gram starting at pos) for every
    * sliding-window position — positions are NOT deduplicated, they
    * are the coordinate system the span coalescing runs over.
    */
  private[graft] def slidingGrams(toks: DataFrame, k: Int): DataFrame =
    toks.filter(size(col("t")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(t)-$k)," +
          s" i -> md5(concat_ws(' ', slice(t, i+1, $k))))"))
        .as(Seq("pos", "h")))

  /** X1': per-document n-gram novelty — the fraction of a document's
    * DISTINCT k-gram hashes first introduced by THIS document in
    * doc_id order (min doc_id over the corpus holds the claim). The
    * crawl-snapshot ordering signal: a re-crawl of known content
    * scores near 0, genuinely new material near 10000, and the score
    * is what a pipeline sorts on when it can only afford to keep the
    * most additive slice of a snapshot.
    *
    * Scale shape: the x73 gram machinery (one narrow (doc_id, h)
    * exchange), a min-per-hash aggregate, a join back CO-KEYED on the
    * hash (the aggregate's own grouping key), and a per-doc count —
    * linear in corpus tokens, nothing pairwise. novelty_bp is exact
    * integer basis points (n_grams ≥ 1 whenever the row exists, so
    * no zero guard is needed; docs shorter than k grams are absent,
    * same rule as x73).
    */
  def ngramNovelty(docs: DataFrame, k: Int): DataFrame =
    noveltyFromGrams(distinctGrams(docs, k))

  /** Per-document DISTINCT k-gram hashes as (doc_id, h) rows — the
    * per-doc dedup happens INSIDE the projection (array_distinct over
    * the gram list), so the relation is map-only: no distinct
    * exchange in the batch plan, and the identical expression runs
    * statelessly per arrival in the streaming twin.
    */
  private[graft] def distinctGrams(docs: DataFrame, k: Int): DataFrame =
    tokenArrays(docs).filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, size(t)-$k)," +
          s" i -> md5(concat_ws(' ', slice(t, i+1, $k)))))")).as("h"))

  /** The x96 tail over a (doc_id, h) distinct-gram relation — shared
    * by the batch operator and the streaming drain finisher (which
    * feeds it the drained arrival grams unioned with the frozen
    * corpus grams).
    */
  private[graft] def noveltyFromGrams(grams: DataFrame): DataFrame = {
    // first-holder as a window min over the gram hash: one exchange
    // keyed on h (partitions bounded by per-gram df), no self-join —
    // which also keeps the relation join-free when the streaming
    // drain finisher feeds it a union (self-joining a union of the
    // same memory-sink relation trips Spark's reference dedup)
    grams
      .withColumn("first_doc",
        min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("novel"))
      .select(col("doc_id"), col("n_grams"), col("novel"),
        expr("10000 * novel div n_grams").as("novelty_bp"))
      .orderBy(col("doc_id"))
  }

  def ngramNoveltySql(k: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id,
       |         md5(array_to_string(t[i+1:i+$k], ' ')) AS h
       |  FROM t, UNNEST(range(len(t)-${k - 1})) AS r(i)
       |  WHERE len(t) >= $k
       |), f AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY 1)
       |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS novel,
       |  CAST(10000 * sum(CASE WHEN f.first_doc = g.doc_id
       |      THEN 1 ELSE 0 END) // count(*) AS BIGINT) AS novelty_bp
       |FROM g JOIN f USING (h)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** X1': incremental exact dedup — the batch form of dedup-on-
    * ingest: a "new batch" (the md5(doc_id)-sliced ~1/newMod of the
    * corpus, a stand-in crawl delta) deduplicates against the FROZEN
    * remainder and against itself, first-occurrence-wins. Verdicts:
    * `dup_of_corpus` (text hash exists in the frozen corpus — its
    * min-id holder is the keeper), `dup_in_batch` (an earlier new doc
    * holds the hash), `novel` (keep_id NULL). This is the relation an
    * ingestion job MERGEs every cycle; the streaming exact-dedup twin
    * consumes the same frozen-hash model.
    *
    * Scale shape: one md5 projection, two hash-keyed min aggregates
    * (old/new), two joins CO-KEYED on the same hash — linear,
    * all-exchange-reusing, no pairwise anything.
    */
  def incrementalDedup(docs: DataFrame, newMod: Int = 5): DataFrame = {
    val tagged = docs.select(col("doc_id"), md5(col("text")).as("h"),
      (expr(hash16FastExpr("cast(doc_id as string)")) % newMod === 0)
        .as("is_new"))
    val oldMin = tagged.filter(!col("is_new"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("old_keep"))
    val newMin = tagged.filter(col("is_new"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("new_keep"))
    tagged.filter(col("is_new"))
      .join(oldMin, Seq("h"), "left")
      .join(newMin, Seq("h"))
      .select(col("doc_id"),
        when(col("old_keep").isNotNull, lit("dup_of_corpus"))
          .when(col("new_keep") < col("doc_id"), lit("dup_in_batch"))
          .otherwise(lit("novel")).as("verdict"),
        coalesce(col("old_keep"),
          when(col("new_keep") < col("doc_id"), col("new_keep")))
          .as("keep_id"))
      .orderBy(col("doc_id"))
  }

  def incrementalDedupSql(newMod: Int = 5): String =
    s"""WITH tagged AS (
       |  SELECT doc_id, md5(text) AS h,
       |    ${hash16Expr("strpos", "CAST(doc_id AS VARCHAR)")} % $newMod = 0
       |      AS is_new
       |  FROM documents
       |), oldm AS (
       |  SELECT h, min(doc_id) AS old_keep FROM tagged
       |  WHERE NOT is_new GROUP BY 1
       |), newm AS (
       |  SELECT h, min(doc_id) AS new_keep FROM tagged
       |  WHERE is_new GROUP BY 1
       |)
       |SELECT t.doc_id,
       |  CASE WHEN o.old_keep IS NOT NULL THEN 'dup_of_corpus'
       |       WHEN n.new_keep < t.doc_id THEN 'dup_in_batch'
       |       ELSE 'novel' END AS verdict,
       |  COALESCE(o.old_keep,
       |    CASE WHEN n.new_keep < t.doc_id THEN n.new_keep END) AS keep_id
       |FROM tagged t
       |LEFT JOIN oldm o USING (h)
       |JOIN newm n USING (h)
       |WHERE t.is_new
       |ORDER BY t.doc_id""".stripMargin

  /** X1'/X7: corpus snapshot diff — the dataset-versioning report a
    * pipeline emits between crawl snapshots: per source, how many
    * documents were added, removed, changed, or kept byte-identical.
    * The two snapshots are deterministic md5-sliced views of the
    * harness corpus (old = base minus the %$addMod bucket, new = base
    * minus the %$delMod bucket with the %$chgMod bucket's text
    * upper-cased — a stand-in recrawl edit both engines reproduce
    * exactly), so the operator itself is the general shape: two
    * projections, ONE doc_id-keyed full outer join, text-hash
    * comparison, per-source status counts. Linear, co-keyed,
    * no pairwise anything.
    */
  def snapshotDiff(docs: DataFrame, delMod: Int = 17, addMod: Int = 19,
      chgMod: Int = 13): DataFrame = {
    val h = expr(hash16FastExpr("cast(doc_id as string)"))
    val base = docs.select(col("doc_id"), col("source"), col("text"),
      h.as("hb"))
    val old = base.filter(col("hb") % addMod =!= 0)
      .select(col("doc_id"), col("source").as("src_o"),
        md5(col("text")).as("h_o"))
    val neu = base.filter(col("hb") % delMod =!= 0)
      .select(col("doc_id"), col("source").as("src_n"),
        md5(when(col("hb") % chgMod === 0, upper(col("text")))
          .otherwise(col("text"))).as("h_n"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(coalesce(col("src_n"), col("src_o")).as("source"),
        when(col("h_o").isNull, lit("added"))
          .when(col("h_n").isNull, lit("removed"))
          .when(col("h_o") =!= col("h_n"), lit("changed"))
          .otherwise(lit("same")).as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("status"))
  }

  def snapshotDiffSql(delMod: Int = 17, addMod: Int = 19,
      chgMod: Int = 13): String = {
    val h = hash16Expr("strpos", "CAST(doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT doc_id, source, text, $h AS hb FROM documents
       |), old AS (
       |  SELECT doc_id, source AS src_o, md5(text) AS h_o
       |  FROM base WHERE hb % $addMod <> 0
       |), neu AS (
       |  SELECT doc_id, source AS src_n,
       |    md5(CASE WHEN hb % $chgMod = 0 THEN upper(text)
       |             ELSE text END) AS h_n
       |  FROM base WHERE hb % $delMod <> 0
       |)
       |SELECT COALESCE(src_n, src_o) AS source,
       |  CASE WHEN h_o IS NULL THEN 'added'
       |       WHEN h_n IS NULL THEN 'removed'
       |       WHEN h_o <> h_n THEN 'changed'
       |       ELSE 'same' END AS status,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM old FULL OUTER JOIN neu USING (doc_id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** X1'/X7: SCD2 document-version history — the dataset-versioning
    * table x101's per-snapshot diff report cannot answer: for every
    * document, the maximal runs of byte-identical content across a
    * SEQUENCE of snapshots, as validity intervals
    * [valid_from, valid_to]. A doc that is absent in a middle
    * snapshot re-enters as a NEW interval (gap = removed + re-added),
    * and a content edit closes the old interval and opens a new one —
    * the slowly-changing-dimension type-2 build, which is how a
    * 100 TB pipeline versions its corpus without storing one full
    * copy per crawl.
    *
    * Snapshots are deterministic md5-sliced views of the harness
    * corpus (version v drops the (hb+v) % delMod bucket and
    * upper-cases the (hb+3v) % chgMod bucket — a stand-in recrawl
    * both engines reproduce exactly), so the operator itself is the
    * general shape: per-doc presence/content rows per version, ONE
    * per-document window pass (≤ versions rows per key — bounded, the
    * partition key is the document) detecting change-or-gap island
    * starts, one hash aggregate collapsing islands to intervals.
    * Linear in docs·versions, no global sort, no pairwise anything.
    */
  def scd2Intervals(docs: DataFrame, versions: Int = 4, delMod: Int = 17,
      chgMod: Int = 13): DataFrame =
    scd2FromVersionRows(
      scd2VersionRows(docs, versions, delMod, chgMod), versions - 1)
      .orderBy(col("doc_id"), col("valid_from"))

  /** The map-only (doc_id, version, content-hash) presence projection
    * — STATELESS, so the streaming ingest half
    * (DocumentsStream.versionRowsOnIngest) runs it verbatim per
    * micro-batch.
    */
  private[graft] def scd2VersionRows(docs: DataFrame, versions: Int,
      delMod: Int, chgMod: Int): DataFrame = {
    val h = expr(hash16FastExpr("cast(doc_id as string)"))
    docs
      .select(col("doc_id"), col("text"), h.as("hb"),
        explode(expr(s"sequence(0, ${versions - 1})")).as("v"))
      .filter((col("hb") + col("v")) % delMod =!= 0)
      .select(col("doc_id"), col("v"),
        md5(when((col("hb") + lit(3) * col("v")) % chgMod === 0,
          upper(col("text"))).otherwise(col("text"))).as("h"))
  }

  /** The island-coalescing interval build over a (doc_id, v, h)
    * presence table — shared verbatim by the batch operator and the
    * streaming drain-time finisher (no presentation sort here: the
    * finisher's consumer orders, the batch wrapper appends its own).
    */
  private[graft] def scd2FromVersionRows(verRows: DataFrame,
      currentV: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("v"))
    verRows
      .withColumn("__pv", lag(col("v"), 1).over(byDoc))
      .withColumn("__ph", lag(col("h"), 1).over(byDoc))
      .withColumn("__isl", sum(
        when(col("__pv").isNull || col("v") - col("__pv") > 1 ||
          col("h") =!= col("__ph"), 1).otherwise(0)).over(byDoc))
      .groupBy(col("doc_id"), col("__isl"))
      .agg(min(col("v")).as("valid_from"), max(col("v")).as("valid_to"),
        min(col("h")).as("content_h"))
      .select(col("doc_id"), col("valid_from"), col("valid_to"),
        col("content_h"),
        (col("valid_to") === currentV).as("is_current"))
  }

  /** X1'/X7: incremental SCD2 MERGE — apply ONE new snapshot to an
    * existing interval table without rebuilding history: current
    * intervals extend when content is unchanged, close on change or
    * disappearance (a changed doc also opens a new single-version
    * interval), and docs absent from the current frontier open fresh
    * intervals. This is the production dataset-versioning step (what
    * a MERGE INTO does to an SCD2 dimension): history rows pass
    * through untouched, and the delta work is ONE doc_id-keyed full
    * outer join of the ≤1-per-doc current frontier against the new
    * snapshot — linear, co-keyed, nothing rescans closed history.
    *
    * Correctness contract (and the oracle): merging version
    * `versions` into the `versions`-deep build must equal the
    * from-scratch (`versions`+1)-deep [[scd2Intervals]] build —
    * the oracle runs the monolithic rebuild while the engine runs
    * the incremental path, so any drift in the merge case analysis
    * (extend / close / close+open / open) fails the hash gate.
    */
  def scd2Merge(docs: DataFrame, versions: Int = 4, delMod: Int = 17,
      chgMod: Int = 13): DataFrame = {
    val v = versions // the arriving snapshot's version id
    val cur = scd2Intervals(docs, versions, delMod, chgMod)
    val h = expr(hash16FastExpr("cast(doc_id as string)"))
    val snap = docs.select(col("doc_id"), col("text"), h.as("hb"))
      .filter((col("hb") + lit(v)) % delMod =!= 0)
      .select(col("doc_id"),
        md5(when((col("hb") + lit(3 * v)) % chgMod === 0,
          upper(col("text"))).otherwise(col("text"))).as("nh"))
    val frontier = cur.filter(col("valid_to") === v - 1)
      .select(col("doc_id"), col("valid_from"), col("valid_to"),
        col("content_h"))
    val history = cur.filter(col("valid_to") =!= v - 1)
      .select(col("doc_id"), col("valid_from"), col("valid_to"),
        col("content_h"))
    val merged = frontier.join(snap, Seq("doc_id"), "full_outer")
    val extended = merged
      .filter(col("valid_from").isNotNull && col("nh").isNotNull &&
        col("content_h") === col("nh"))
      .select(col("doc_id"), col("valid_from"),
        lit(v).as("valid_to"), col("content_h"))
    val closed = merged
      .filter(col("valid_from").isNotNull &&
        (col("nh").isNull || col("content_h") =!= col("nh")))
      .select(col("doc_id"), col("valid_from"), col("valid_to"),
        col("content_h"))
    val opened = merged
      .filter(col("nh").isNotNull &&
        (col("valid_from").isNull || col("content_h") =!= col("nh")))
      .select(col("doc_id"), lit(v).as("valid_from"),
        lit(v).as("valid_to"), col("nh").as("content_h"))
    history.unionByName(extended).unionByName(closed).unionByName(opened)
      .withColumn("is_current", col("valid_to") === v)
      .orderBy(col("doc_id"), col("valid_from"))
  }

  def scd2IntervalsSql(versions: Int = 4, delMod: Int = 17,
      chgMod: Int = 13): String = {
    val h = hash16Expr("strpos", "CAST(doc_id AS VARCHAR)")
    s"""WITH vr AS (
       |  SELECT doc_id, CAST(t.v AS INT) AS v,
       |    md5(CASE WHEN ($h + 3*t.v) % $chgMod = 0 THEN upper(text)
       |             ELSE text END) AS h
       |  FROM documents CROSS JOIN range(0, $versions) t(v)
       |  WHERE ($h + t.v) % $delMod <> 0
       |), lagged AS (
       |  SELECT doc_id, v, h,
       |    lag(v) OVER w AS pv, lag(h) OVER w AS ph
       |  FROM vr WINDOW w AS (PARTITION BY doc_id ORDER BY v)
       |), isl AS (
       |  SELECT doc_id, v, h,
       |    sum(CASE WHEN pv IS NULL OR v - pv > 1 OR h <> ph
       |             THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY v) AS island
       |  FROM lagged
       |)
       |SELECT doc_id, min(v) AS valid_from, max(v) AS valid_to,
       |       min(h) AS content_h,
       |       max(v) = ${versions - 1} AS is_current
       |FROM isl GROUP BY doc_id, island
       |ORDER BY doc_id, valid_from""".stripMargin
  }

  /** The corpus-side "model" for dedup-on-ingest: one row per
    * distinct k-gram hash with its corpus occurrence count and — when
    * the count is exactly 1 — the single holder's doc_id, so a
    * streaming arrival can test "occurs anywhere OTHER than me"
    * without a per-document postings list. Few columns, one hash agg.
    */
  def gramTable(docs: DataFrame, k: Int): DataFrame =
    slidingGrams(tokenArrays(docs), k)
      .groupBy(col("h"))
      .agg(count(lit(1)).as("c"),
        when(count(lit(1)) === 1, min(col("doc_id"))).as("only_doc"))

  /** Island-coalescing tail shared by the batch operator and the
    * streaming drain-time finisher: duplicated gram start positions →
    * maximal spans (a new island starts when the gap to the previous
    * duplicated start exceeds k), then the span text sliced from the
    * token arrays. The window is PER DOCUMENT (partition key doc_id).
    */
  private[graft] def coalesceDupSpans(dupPos: DataFrame, toks: DataFrame,
      k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = dupPos
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("island", sum(
        when(col("prev").isNull || col("pos") - col("prev") > k, 1)
          .otherwise(0)).over(byDoc))
    islands.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .join(toks, "doc_id")
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_dup_grams"),
        expr("concat_ws(' ', slice(t, span_start + 1, span_end - span_start + 1))")
          .as("dup_text"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  def substringDupSpansSql(k: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |g AS (
       |  SELECT doc_id, CAST(i AS INT) AS pos,
       |         md5(array_to_string(t[i+1:i+$k], ' ')) AS h
       |  FROM t, UNNEST(range(len(t)-${k - 1})) AS r(i)
       |  WHERE len(t) >= $k
       |), duph AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
       |dp AS (SELECT g.doc_id, g.pos FROM g JOIN duph ON g.h = duph.h),
       |isl AS (
       |  SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM (SELECT doc_id, pos,
       |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM dp)
       |), sp AS (
       |  SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       |         CAST(max(pos) + $k - 1 AS INT) AS span_end,
       |         count(*) AS n_dup_grams
       |  FROM isl GROUP BY doc_id, island
       |)
       |SELECT sp.doc_id AS doc_id, span_start, span_end,
       |       CAST(span_end - span_start + 1 AS INT) AS span_tokens,
       |       n_dup_grams,
       |       array_to_string(t.t[span_start+1 : span_end+1], ' ') AS dup_text
       |FROM sp JOIN t ON sp.doc_id = t.doc_id
       |ORDER BY sp.doc_id, span_start""".stripMargin

  /** The APPLY step for [[substringDupSpans]] — scrub the corpus of
    * duplicated substrings, keeping exactly one copy: a maximal span
    * is removed from its document unless the document holds the
    * CANONICAL claim to it — the global min (doc_id, pos) occurrence
    * of the span's first k-gram (deterministic, and within-doc
    * repeats resolve the same way: the earlier occurrence stays).
    * Output is one row per document: the surviving text, with counts
    * of removed spans and kept tokens — the cleaned corpus a
    * training pipeline actually feeds to the tokenizer.
    *
    * Scale: everything from x73 plus a keeper min per gram hash (same
    * hash agg), one co-keyed (doc_id) anti-join of token positions
    * against the removed ranges (ranges per doc are bounded by doc
    * length), and a per-doc re-assembly — still linear, still
    * nothing pairwise.
    */
  def substringScrub(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val toks = tokenArrays(docs)
    val grams = slidingGrams(toks, k)
    val counts = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("c"),
        min(struct(col("doc_id"), col("pos"))).as("keep"))
      .filter(col("c") >= 2)
      .select(col("h"), col("keep.doc_id").as("kd"), col("keep.pos").as("kp"))
    val dupPos = grams.join(counts, "h")
      .select(col("doc_id"), col("pos"), col("kd"), col("kp"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islands = dupPos
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("island", sum(
        when(col("prev").isNull || col("pos") - col("prev") > k, 1)
          .otherwise(0)).over(byDoc))
    // min(struct(pos, kd, kp)) rides the FIRST gram's keeper along
    // with span_start (pos is unique per doc, so the min is exact)
    val spans = islands.groupBy(col("doc_id"), col("island"))
      .agg(min(struct(col("pos"), col("kd"), col("kp"))).as("f"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id"), col("f.pos").as("span_start"), col("span_end"),
        (col("f.kd") === col("doc_id") &&
          col("f.kp") === col("f.pos")).as("canonical"))
    val rem = spans.filter(!col("canonical"))
      .select(col("doc_id").as("rd"), col("span_start"), col("span_end"))
    scrubRanges(docs, toks, rem)
  }

  /** Remove the token ranges in `rem` (rd, span_start, span_end) from
    * every document and re-assemble: one co-keyed anti-join of token
    * positions against the ranges, then a per-doc rebuild. Shared by
    * [[substringScrub]] and the streaming ingest-scrub drain finisher.
    */
  private[graft] def scrubRanges(docs: DataFrame, toks: DataFrame,
      rem: DataFrame): DataFrame = {
    // Removal ranges per doc are bounded by doc length, so they
    // collapse to ONE small (doc, spans[]) row and the rebuild is an
    // in-row filter over the token array — the previous form
    // posexploded EVERY token of EVERY document into the cluster and
    // re-assembled with a collect_list shuffle + array_sort, i.e. two
    // corpus-wide exchanges of the full text to delete a few spans
    // (guide §2.3: aggregate before you shuffle / keep heavy payloads
    // out of the exchange). Result rows are identical: token order is
    // positional in both forms, and membership in a span does not
    // depend on execution order.
    val spans = rem.groupBy(col("rd"))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("spans"))
    toks.join(spans, col("doc_id") === col("rd"), "left")
      .select(col("doc_id"),
        coalesce(size(col("spans")), lit(0)).cast("long")
          .as("n_removed_spans"),
        expr("""filter(transform(t, (w, i) -> struct(i AS p, w AS w)),
          |  s -> spans IS NULL OR NOT exists(spans,
          |    r -> s.p BETWEEN r.span_start AND r.span_end))"""
          .stripMargin).as("kept"))
      .select(col("doc_id"), col("n_removed_spans"),
        size(col("kept")).cast("long").as("n_tokens_kept"),
        concat_ws(" ", expr("transform(kept, s -> s.w)")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Coalesce duplicated positions into spans WITHOUT canonicality
    * (every span is a removal candidate) — the island logic of
    * [[coalesceDupSpans]] reduced to its range output. Used by the
    * streaming ingest scrubber, where the frozen corpus always holds
    * the canonical copy.
    */
  private[graft] def dupRanges(dupPos: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    dupPos
      .withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("island", sum(
        when(col("prev").isNull || col("pos") - col("prev") > k, 1)
          .otherwise(0)).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
      .select(col("doc_id").as("rd"), col("span_start"), col("span_end"))
  }

  def substringScrubSql(k: Int): String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |g AS (
       |  SELECT doc_id, CAST(i AS INT) AS pos,
       |         md5(array_to_string(t[i+1:i+$k], ' ')) AS h
       |  FROM t, UNNEST(range(len(t)-${k - 1})) AS r(i)
       |  WHERE len(t) >= $k
       |), duph AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
       |dg AS (SELECT g.doc_id, g.pos, g.h FROM g JOIN duph ON g.h = duph.h),
       |keep AS (
       |  SELECT h, doc_id AS kd, pos AS kp FROM (
       |    SELECT h, doc_id, pos, row_number()
       |      OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
       |    FROM dg) WHERE rn = 1
       |), isl AS (
       |  SELECT doc_id, pos,
       |    sum(CASE WHEN prev IS NULL OR pos - prev > $k THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM (SELECT doc_id, pos,
       |          lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM dg)
       |), sp AS (
       |  SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       |         CAST(max(pos) + $k - 1 AS INT) AS span_end
       |  FROM isl GROUP BY doc_id, island
       |), rem AS (
       |  SELECT sp.doc_id, sp.span_start, sp.span_end
       |  FROM sp
       |  JOIN dg ON dg.doc_id = sp.doc_id AND dg.pos = sp.span_start
       |  JOIN keep ON keep.h = dg.h
       |  WHERE NOT (keep.kd = sp.doc_id AND keep.kp = sp.span_start)
       |), tokp AS (
       |  SELECT doc_id, CAST(i AS INT) AS p, t[i+1] AS w
       |  FROM t, UNNEST(range(len(t))) AS r(i)
       |), kept AS (
       |  SELECT tk.doc_id, tk.p, tk.w FROM tokp tk
       |  WHERE NOT EXISTS (SELECT 1 FROM rem r
       |    WHERE r.doc_id = tk.doc_id
       |      AND tk.p BETWEEN r.span_start AND r.span_end)
       |), agg AS (
       |  SELECT doc_id, count(*) AS nt,
       |         string_agg(w, ' ' ORDER BY p) AS ct
       |  FROM kept GROUP BY doc_id
       |), remc AS (SELECT doc_id, count(*) AS nr FROM rem GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(COALESCE(remc.nr, 0) AS BIGINT) AS n_removed_spans,
       |       CAST(COALESCE(agg.nt, 0) AS BIGINT) AS n_tokens_kept,
       |       COALESCE(agg.ct, '') AS clean_text
       |FROM documents d
       |LEFT JOIN agg ON agg.doc_id = d.doc_id
       |LEFT JOIN remc ON remc.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  def containmentPairsSql(dfCap: Int, threshold: Double): String =
    s"""WITH ${containmentCtesSql(dfCap, threshold)}
       |SELECT a, b, inter, sz_a, containment FROM cscore
       |ORDER BY a, b""".stripMargin

  /** The x62 shingle→bucket→score chain as a CTE body (final
    * relation: `cscore` (a, b, inter, sz_a, containment), directed,
    * threshold applied) — shared by the standalone oracle and the
    * cross-modal consensus oracle (x106).
    */
  private[graft] def containmentCtesSql(dfCap: Int,
      threshold: Double): String =
    s"""sh AS ($shinglesSql),
       |rare AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $dfCap),
       |capped AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), both_dirs AS (
       |  SELECT d1 AS a, d2 AS b, inter FROM inter
       |  UNION ALL
       |  SELECT d2 AS a, d1 AS b, inter FROM inter
       |), cscore AS (
       |  SELECT a, b, inter, s.sz AS sz_a,
       |         round(CAST(inter AS DOUBLE) / s.sz, 6) AS containment
       |  FROM both_dirs JOIN sizes s ON s.doc_id = a
       |  WHERE CAST(inter AS DOUBLE) / s.sz >= $threshold
       |)""".stripMargin

  /** X1/X2: CROSS-MODAL consensus near-duplicates — the x62 lexical
    * containment pairs and the x16 embedding-cosine pairs joined on
    * the unordered (i, j) key (doc_id ≡ vec_id in this corpus), each
    * pair tagged `both` / `text_only` / `embed_only`. The verdict is
    * the curation decision table: `both` is a confident duplicate
    * (drop without review), `embed_only` is the paraphrase band the
    * lexical pass misses (route to semantic dedup), `text_only` is
    * lexical coincidence under a weak embedding (route to encoder
    * audit — x97's outlier report is the follow-up).
    *
    * Scale shape: both candidate generators are the bucketed/capped
    * originals (nothing pairwise over the corpus); the consensus
    * join is a co-keyed full outer over two already-thresholded pair
    * sets — bounded by candidate counts, not corpus size.
    */
  def crossModalNearDup(docs: DataFrame, emb: DataFrame, dfCap: Int,
      thetaText: Double, bands: Int, planesPerBand: Int, dim: Int,
      thetaEmbed: Double): DataFrame = {
    val e = Similarity.nearDupPairs(emb, bands, planesPerBand, dim,
      thetaEmbed)
    // undirected reduction of the directed containment rows: one row
    // per unordered pair, scored by its best direction
    val t = containmentPairs(docs, dfCap, thetaText)
      .select(least(col("a"), col("b")).as("i"),
        greatest(col("a"), col("b")).as("j"), col("containment"))
      .groupBy(col("i"), col("j"))
      .agg(max(col("containment")).as("cont"))
    e.join(t, Seq("i", "j"), "full_outer")
      .withColumn("verdict",
        when(col("cos").isNotNull && col("cont").isNotNull, lit("both"))
          .when(col("cos").isNotNull, lit("embed_only"))
          .otherwise(lit("text_only")))
      .select(col("i"), col("j"), col("cos"), col("cont"), col("verdict"))
      .orderBy(col("i"), col("j"))
  }

  /** X1/X2: decontamination AGREEMENT table — the x28 n-gram scrub
    * and the x105 semantic scrub run against the SAME benchmark
    * slice (doc_id ≡ vec_id < benchIds), every corpus doc tagged
    * `both` / `ngram_only` / `semantic_only` / `neither`. The table
    * that audits a decontamination policy instead of trusting one
    * method: `semantic_only` counts the paraphrase leaks the n-gram
    * pass misses, `ngram_only` the literal-overlap leaks sitting far
    * away in embedding space (short verbatim quotes), `both` the
    * unambiguous removals. A zero-norm vector cannot be semantically
    * flagged (it has no direction); its doc still appears in the
    * spine.
    *
    * Scale shape: the two flag relations are the existing bounded
    * machines (broadcast benchmark grams; 1-row broadcast bench
    * array + map-only scoring); the agreement is two doc_id-co-keyed
    * left joins off the corpus spine, one bounded verdict aggregate,
    * and a 4-row literal verdict spine so the report shape is fixed.
    */
  def deconAgreement(docs: DataFrame, emb: DataFrame, benchIds: Int,
      n: Int, thetaC4: Long): DataFrame = {
    val ng = decontaminate(docs, benchIds, n)
      .select(col("doc_id"), lit(1).as("ngf"))
    val sem = Similarity.deconScoredBatch(emb, benchIds)
      .filter(col("c4") >= thetaC4)
      .select(col("vec_id").as("doc_id"), lit(1).as("smf"))
    val verdicts = docs.filter(col("doc_id") >= benchIds)
      .select(col("doc_id"))
      .join(ng, Seq("doc_id"), "left_outer")
      .join(sem, Seq("doc_id"), "left_outer")
      .withColumn("verdict",
        when(col("ngf").isNotNull && col("smf").isNotNull, lit("both"))
          .when(col("ngf").isNotNull, lit("ngram_only"))
          .when(col("smf").isNotNull, lit("semantic_only"))
          .otherwise(lit("neither")))
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n"))
    val session = docs.sparkSession
    import session.implicits._
    val spine = Seq("both", "ngram_only", "semantic_only", "neither")
      .toDF("verdict")
    spine.join(verdicts, Seq("verdict"), "left_outer")
      .select(col("verdict"),
        coalesce(col("n"), lit(0L)).as("n_docs"))
      .orderBy(col("verdict"))
  }

  def deconAgreementSql(benchIds: Int, n: Int, thetaC4: Long): String =
    s"""WITH grams AS (${nGramsSql(n)}),
       |ngb AS (SELECT DISTINCT g FROM grams WHERE doc_id < $benchIds),
       |nghits AS (
       |  SELECT doc_id FROM grams JOIN ngb USING (g)
       |  WHERE doc_id >= $benchIds GROUP BY doc_id
       |),
       |${Similarity.deconCtesSql(benchIds)},
       |spine AS (
       |  SELECT doc_id FROM documents WHERE doc_id >= $benchIds
       |), verdicts AS (
       |  SELECT s.doc_id,
       |    CASE WHEN ng.doc_id IS NOT NULL
       |              AND sc.c4 IS NOT NULL AND sc.c4 >= $thetaC4
       |           THEN 'both'
       |         WHEN ng.doc_id IS NOT NULL THEN 'ngram_only'
       |         WHEN sc.c4 IS NOT NULL AND sc.c4 >= $thetaC4
       |           THEN 'semantic_only'
       |         ELSE 'neither' END AS verdict
       |  FROM spine s
       |  LEFT JOIN nghits ng ON ng.doc_id = s.doc_id
       |  LEFT JOIN semscore sc ON sc.vec_id = s.doc_id
       |), vspine AS (
       |  SELECT 'both' AS verdict
       |  UNION ALL SELECT 'ngram_only'
       |  UNION ALL SELECT 'semantic_only'
       |  UNION ALL SELECT 'neither'
       |)
       |SELECT v.verdict, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_docs
       |FROM vspine v LEFT JOIN (
       |  SELECT verdict, count(*) AS cnt FROM verdicts GROUP BY 1) c
       |  ON c.verdict = v.verdict
       |ORDER BY v.verdict""".stripMargin

  def crossModalNearDupSql(dfCap: Int, thetaText: Double, bands: Int,
      planesPerBand: Int, dim: Int, thetaEmbed: Double): String =
    s"""WITH ${Similarity.nearDupCtesSql(bands, planesPerBand, dim,
         thetaEmbed)},
       |${containmentCtesSql(dfCap, thetaText)}, tund AS (
       |  SELECT least(a, b) AS i, greatest(a, b) AS j,
       |         max(containment) AS cont
       |  FROM cscore GROUP BY 1, 2
       |)
       |SELECT COALESCE(e.i, t.i) AS i, COALESCE(e.j, t.j) AS j,
       |       e.cos, t.cont,
       |       CASE WHEN e.i IS NOT NULL AND t.i IS NOT NULL THEN 'both'
       |            WHEN e.i IS NOT NULL THEN 'embed_only'
       |            ELSE 'text_only' END AS verdict
       |FROM epairs e FULL OUTER JOIN tund t ON e.i = t.i AND e.j = t.j
       |ORDER BY i, j""".stripMargin

}
