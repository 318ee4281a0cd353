package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count sketch (Flajolet et al.
  * 2007) over the `documents` token stream — the sketch face the
  * engine's family still lacked (KMV x34 estimates distincts by
  * k-minimum hashes; Count–Min x61 estimates frequencies; Misra–Gries
  * x44 finds heavy hitters; HLL is the industry-standard mergeable
  * distinct counter). m = 256 registers (p = 8).
  *
  * Everything is derived from the md5 hex digest so both dialects
  * compute bit-identical registers (the simhash/KMV portability
  * idiom): register index = first two nibbles; rho = number of
  * leading zero BITS of the remaining 120-bit suffix + 1, computed
  * from the leading-'0'-character run and the first nonzero nibble's
  * bit length. Registers cap at 40 so the harmonic mean's
  * denominator sums EXACTLY in 64-bit integers
  * (Σ 2^(40−reg) ≤ 256·2^40 ≪ 2^63) — the estimate is then one
  * deterministic double division, engine-order-independent. The
  * cap loses nothing observable: rho > 40 needs ~2^40 distincts,
  * 5 orders beyond any per-source vocabulary here.
  *
  * Emits one row per source plus the merged 'ALL' row — the merge is
  * max-per-register over the per-source registers, which is the
  * whole point of HLL at 100 TB: per-partition sketches combine by
  * elementwise max, never re-reading tokens. The exact distinct
  * count rides along as the self-validation column (the x61
  * est-vs-exact convention); rel_err is pinned by spec.
  *
  * Scale shape: one (source, idx) hash aggregate with map-side
  * partials (bounded state: |sources|·256 registers), the merged row
  * from those same registers (256·|sources| input rows), and the
  * exact-distinct validation column's own aggregate. No windows,
  * nothing pairwise.
  */
object Hll {

  private val m = 256
  private val regCap = 40
  private val pow2Cap = 1L << regCap // 2^40
  // alpha_256 * m^2 * 2^cap, folded left-to-right so the embedded SQL
  // literal reproduces the identical double
  private val alpha = 0.7213 / (1.0 + 1.079 / m)
  private val scaleNum = alpha * (m.toDouble * m.toDouble) * pow2Cap.toDouble
  private val scaleNumLit = java.lang.Double.toString(scaleNum)

  private val nibbles = "0123456789abcdef"

  /** The per-source register table — (source, idx, reg), ≤ 256 rows
    * per source. This is the sketch STATE: the batch operator and the
    * streaming twin both aggregate into exactly this shape (max is
    * the HLL merge), so a drained streaming register table is
    * bit-equal to the batch one over the same corpus.
    */
  def registers(docs: DataFrame): DataFrame =
    registersFromTok(docs.select(col("source"),
      explode(split(col("text"), " ")).as("w")))

  /** Register derivation from an already-tokenized (source, w) frame —
    * lets a caller tokenize ONCE and feed both the sketch and an
    * exact-validation aggregate (the x79 shape) from the same pinned
    * frame, mirroring the oracle's `tok AS MATERIALIZED`.
    */
  def registersFromTok(tok: DataFrame): DataFrame = {
    tok
      .withColumn("h", md5(col("w")))
      .withColumn("idx",
        (expr(s"instr('$nibbles', substring(h, 1, 1))") - 1) * 16 +
          (expr(s"instr('$nibbles', substring(h, 2, 1))") - 1))
      .withColumn("z",
        length(regexp_extract(substring(col("h"), 3, 30), "^(0*)", 1)))
      .withColumn("v",
        expr(s"instr('$nibbles', substring(h, 3 + z, 1))") - 1)
      .withColumn("reg",
        when(col("z") >= 10, lit(regCap))
          .otherwise(least(lit(regCap),
            col("z") * 4 + 5 -
              when(col("v") >= 8, 4).when(col("v") >= 4, 3)
                .when(col("v") >= 2, 2).otherwise(1))))
      .select(col("source"), col("idx"), col("reg"))
      .groupBy(col("source"), col("idx"))
      .agg(max(col("reg")).as("reg"))
  }

  /** Per-source raw estimate from a register table — (source, zeros,
    * est), plus the merged 'ALL' row (max-per-register merge of the
    * per-source registers). Shared verbatim by the batch operator
    * and the streaming twin's drain-time finisher.
    */
  /** Raw HLL estimate from a register frame, grouped on `keys` —
    * (keys..., zeros, est). The one formula every HLL consumer (x79
    * per-source + merged-ALL, x160 per-pair unions) projects through,
    * so estimates agree bit-for-bit wherever the registers do.
    */
  private[graft] def estimateKeyed(r: DataFrame,
      keys: Seq[String]): DataFrame =
    r.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"shiftleft(cast(1 as bigint), $regCap - reg)"))
          .as("pres"))
      .withColumn("zeros", lit(m.toLong) - col("n_regs"))
      .withColumn("num2", col("pres") + col("zeros") * lit(pow2Cap))
      .withColumn("raw",
        lit(scaleNum) / col("num2").cast("double"))
      .withColumn("est",
        when(col("raw") <= m * 2.5 && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("raw")))
      .select((keys.map(col) :+ col("zeros") :+ col("est")): _*)

  def estimatesFromRegisters(regs: DataFrame): DataFrame = {
    val gregs = regs.groupBy(col("idx")).agg(max(col("reg")).as("reg"))
      .withColumn("source", lit("ALL"))
    estimateKeyed(regs, Seq("source"))
      .unionByName(estimateKeyed(gregs, Seq("source")))
  }

  /** HLL SET ALGEBRA — per source pair, the sketch-estimated
    * vocabulary intersection by inclusion–exclusion
    * (est_inter = est_a + est_b − est_union, with est_union from the
    * elementwise-MAX merge of the two register grids) against the
    * exact intersection. x65 answers the overlap question exactly by
    * joining vocabularies; this answers it from 256-register sketches
    * that were built INDEPENDENTLY, one pass per source — the form
    * that works when the corpora live on different clusters or
    * different weeks, and the calibration table that says how far the
    * sketch answer is from truth on this corpus.
    *
    * Scale shape: one register pass over the corpus (the x79 state,
    * ≤256 rows per source); everything pairwise runs on
    * dimension-bounded frames — the pair spine is \|sources\|², union
    * grids ≤\|pairs\|·256 rows, built by two equi-joins on `source`
    * (never an OR-join); the exact verify pass joins per-source
    * DISTINCT vocabularies on the token, bounded per token by
    * \|sources\|.
    */
  def hllOverlap(docs: DataFrame): DataFrame = {
    val tok = graft.tools.Materialize(docs.select(col("source"),
      explode(split(col("text"), " ")).as("w")))
    val regs = graft.tools.Materialize(registersFromTok(tok))
    val srcs = regs.select(col("source")).distinct()
    // <=|sources|² pair spine: the inequality self-join runs on two
    // dimension-sized frames (broadcast nested loop by construction)
    val prs = srcs.select(col("source").as("sa"))
      .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
    val uregs = prs.join(regs.withColumnRenamed("source", "sa"), "sa")
      .unionByName(
        prs.join(regs.withColumnRenamed("source", "sb"), "sb")
          .select(col("sa"), col("sb"), col("idx"), col("reg")))
      .groupBy(col("sa"), col("sb"), col("idx"))
      .agg(max(col("reg")).as("reg"))
    val uest = estimateKeyed(uregs, Seq("sa", "sb"))
      .select(col("sa"), col("sb"), col("est").as("eu"))
    val sest = estimateKeyed(regs, Seq("source"))
    val vocab = tok.distinct()
    val xin = vocab.select(col("source").as("sa"), col("w"))
      .join(vocab.select(col("source").as("sb"), col("w")), "w")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("exact_inter"))
    uest
      .join(sest.select(col("source").as("sa"), col("est").as("ea")), "sa")
      .join(sest.select(col("source").as("sb"), col("est").as("eb")), "sb")
      .join(xin, Seq("sa", "sb"), "left")
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        round(col("ea"), 4).as("est_a"), round(col("eb"), 4).as("est_b"),
        round(col("eu"), 4).as("est_union"),
        round(col("ea") + col("eb") - col("eu"), 4).as("est_inter"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
      .orderBy(col("src_a"), col("src_b"))
  }

  def hllDistinct(docs: DataFrame): DataFrame = {
    // tokenize ONCE (the oracle pins `tok AS MATERIALIZED`): both the
    // register sketch and the exact-distinct validation aggregate read
    // the pinned frame instead of re-exploding the corpus
    val tok = graft.tools.Materialize(docs.select(col("source"),
      explode(split(col("text"), " ")).as("w")))
    val exacts = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("exact_distinct"))
      .unionByName(tok
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("w")).as("exact_distinct"))
        .withColumn("source", lit("ALL")))
    estimatesFromRegisters(registersFromTok(tok)).join(exacts, Seq("source"))
      .select(col("source"), col("n_tokens"), col("exact_distinct"),
        col("zeros"), round(col("est"), 4).as("hll_est"),
        round(abs(col("est") - col("exact_distinct")) /
          col("exact_distinct"), 4).as("rel_err"))
      .orderBy(col("source"))
  }

  private def bitlenSql(v: String): String =
    s"CASE WHEN $v >= 8 THEN 4 WHEN $v >= 4 THEN 3 " +
      s"WHEN $v >= 2 THEN 2 ELSE 1 END"

  /** The shared tok→regs register-derivation CTE chain (x79 + x160). */
  private def regChainSql: String =
    s"""tok AS MATERIALIZED (
       |  SELECT source, unnest(string_split(text, ' ')) AS w
       |  FROM documents
       |), hashed AS (
       |  SELECT source, md5(w) AS h FROM tok
       |), zed AS (
       |  SELECT source,
       |    (instr('$nibbles', substr(h, 1, 1)) - 1) * 16
       |      + instr('$nibbles', substr(h, 2, 1)) - 1 AS idx,
       |    length(regexp_extract(substr(h, 3, 30), '^(0*)', 1)) AS z,
       |    h
       |  FROM hashed
       |), pos AS (
       |  SELECT source, idx, z,
       |    instr('$nibbles', substr(h, 3 + z, 1)) - 1 AS v
       |  FROM zed
       |), rr AS (
       |  SELECT source, idx,
       |    CASE WHEN z >= 10 THEN $regCap
       |         ELSE LEAST($regCap, z * 4 + 5 - ${bitlenSql("v")}) END
       |      AS reg
       |  FROM pos
       |), regs AS MATERIALIZED (
       |  SELECT source, idx, max(reg) AS reg FROM rr GROUP BY 1, 2
       |)""".stripMargin

  /** The raw-estimate SQL expression over (n_regs, pres) columns —
    * the exact mirror of [[estimateKeyed]]'s projection.
    */
  private def eFormulaSql: String =
    s"""CASE WHEN $scaleNumLit / CAST(pres + ($m - n_regs)
       |         * $pow2Cap AS DOUBLE) <= ${m * 2.5}
       |       AND $m - n_regs > 0
       |     THEN ${m.toDouble} * ln(${m.toDouble} / ($m - n_regs))
       |     ELSE $scaleNumLit / CAST(pres + ($m - n_regs)
       |         * $pow2Cap AS DOUBLE) END""".stripMargin

  def hllDistinctSql: String = {
    def estSelect(regsRel: String, src: String): String =
      s"""  SELECT $src AS source, CAST(count(*) AS BIGINT) AS n_regs,
         |    CAST(sum(CAST(1 AS BIGINT) << ($regCap - reg)) AS BIGINT)
         |      AS pres
         |  FROM $regsRel GROUP BY 1""".stripMargin
    s"""WITH $regChainSql, gregs AS (
       |  SELECT idx, max(reg) AS reg FROM regs GROUP BY 1
       |), stat AS (
       |${estSelect("regs", "source")}
       |  UNION ALL
       |${estSelect("gregs", "'ALL'")}
       |), est AS (
       |  SELECT source, $m - n_regs AS zeros,
       |    CASE WHEN $scaleNumLit / CAST(pres + ($m - n_regs)
       |             * $pow2Cap AS DOUBLE) <= ${m * 2.5}
       |           AND $m - n_regs > 0
       |         THEN ${m.toDouble} * ln(${m.toDouble} / ($m - n_regs))
       |         ELSE $scaleNumLit / CAST(pres + ($m - n_regs)
       |             * $pow2Cap AS DOUBLE) END AS e
       |  FROM stat
       |), exacts AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct
       |  FROM tok GROUP BY 1
       |  UNION ALL
       |  SELECT 'ALL', CAST(count(*) AS BIGINT),
       |    CAST(count(DISTINCT w) AS BIGINT) FROM tok
       |)
       |SELECT source, n_tokens, exact_distinct, zeros,
       |  round(e, 4) AS hll_est,
       |  round(abs(e - exact_distinct) / exact_distinct, 4) AS rel_err
       |FROM est JOIN exacts USING (source)
       |ORDER BY source""".stripMargin
  }

  /** Oracle for x160: the shared register chain, per-pair MAX-merged
    * union grids, the same raw-estimate formula, exact intersections
    * from per-source distinct vocabularies.
    */
  def hllOverlapSql: String =
    s"""WITH $regChainSql,
       |srcs AS (SELECT DISTINCT source FROM regs),
       |prs AS (
       |  SELECT a.source AS sa, b.source AS sb
       |  FROM srcs a JOIN srcs b ON a.source < b.source
       |), uregs AS (
       |  SELECT sa, sb, idx, max(reg) AS reg FROM (
       |    SELECT p.sa, p.sb, r.idx, r.reg
       |    FROM prs p JOIN regs r ON r.source = p.sa
       |    UNION ALL
       |    SELECT p.sa, p.sb, r.idx, r.reg
       |    FROM prs p JOIN regs r ON r.source = p.sb)
       |  GROUP BY 1, 2, 3
       |), ustat AS (
       |  SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_regs,
       |    CAST(sum(CAST(1 AS BIGINT) << ($regCap - reg)) AS BIGINT)
       |      AS pres
       |  FROM uregs GROUP BY 1, 2
       |), uest AS (
       |  SELECT sa, sb, $eFormulaSql AS e FROM ustat
       |), sstat AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_regs,
       |    CAST(sum(CAST(1 AS BIGINT) << ($regCap - reg)) AS BIGINT)
       |      AS pres
       |  FROM regs GROUP BY 1
       |), sest AS (
       |  SELECT source, $eFormulaSql AS e FROM sstat
       |), vocab AS (SELECT DISTINCT source, w FROM tok),
       |xin AS (
       |  SELECT a.source AS sa, b.source AS sb,
       |    CAST(count(*) AS BIGINT) AS exact_inter
       |  FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT u.sa AS src_a, u.sb AS src_b,
       |  round(ea.e, 4) AS est_a, round(eb.e, 4) AS est_b,
       |  round(u.e, 4) AS est_union,
       |  round(ea.e + eb.e - u.e, 4) AS est_inter,
       |  coalesce(x.exact_inter, CAST(0 AS BIGINT)) AS exact_inter
       |FROM uest u
       |JOIN sest ea ON ea.source = u.sa
       |JOIN sest eb ON eb.source = u.sb
       |LEFT JOIN xin x ON x.sa = u.sa AND x.sb = u.sb
       |ORDER BY 1, 2""".stripMargin
}
