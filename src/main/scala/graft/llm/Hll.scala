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
  def estimatesFromRegisters(regs: DataFrame): DataFrame = {
    val gregs = regs.groupBy(col("idx")).agg(max(col("reg")).as("reg"))
      .withColumn("source", lit("ALL"))
    def estimate(r: DataFrame): DataFrame =
      r.groupBy(col("source"))
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
        .select(col("source"), col("zeros"), col("est"))
    estimate(regs).unionByName(estimate(gregs))
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

  def hllDistinctSql: String = {
    def bitlen(v: String): String =
      s"CASE WHEN $v >= 8 THEN 4 WHEN $v >= 4 THEN 3 " +
        s"WHEN $v >= 2 THEN 2 ELSE 1 END"
    def estSelect(regsRel: String, src: String): String =
      s"""  SELECT $src AS source, CAST(count(*) AS BIGINT) AS n_regs,
         |    CAST(sum(CAST(1 AS BIGINT) << ($regCap - reg)) AS BIGINT)
         |      AS pres
         |  FROM $regsRel GROUP BY 1""".stripMargin
    s"""WITH tok AS MATERIALIZED (
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
       |         ELSE LEAST($regCap, z * 4 + 5 - ${bitlen("v")}) END AS reg
       |  FROM pos
       |), regs AS MATERIALIZED (
       |  SELECT source, idx, max(reg) AS reg FROM rr GROUP BY 1, 2
       |), gregs AS (
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
}
