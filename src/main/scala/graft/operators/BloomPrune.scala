package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the standard 100 TB trick for a
  * selective dimension filter against a huge fact table: build a
  * fixed-size bit array over the dimension keys, broadcast it (the
  * filter is `bits/8` BYTES no matter how large either side is — a
  * provably bounded broadcast, unlike broadcasting the key set
  * itself), and drop fact rows whose keys can't possibly match
  * BEFORE they reach the shuffle of the exact semi-join. False
  * positives pass the prune and are eliminated by the exact join;
  * false negatives cannot happen.
  *
  * Everything is deterministic: the `k` probe positions of a key are
  * md5-nibble hashes of `key || '#' || i` (the same engine-portable
  * hash16 as the sampling/dedup operators), so the pruned candidate
  * set — including its false positives — is reproducible on any
  * cluster AND expressible in the DuckDB oracle.
  *
  * Plan shape: the build side collapses to ≤ bits/64 (word, mask)
  * rows via one hash aggregate, then to ONE map<word,mask> row; the
  * probe is pure column arithmetic against the cross-joined 1-row
  * filter (no explode, no per-row join) — whole-stage codegen keeps
  * the fact scan streaming.
  */
object BloomPrune {

  /** Probe bit index i of a key expression: hash16 of the salted key
    * string (the shared Dedup/Sampling nibble construction — ONE
    * definition repo-wide so engine and oracle can't drift), folded
    * onto the filter size. hash16 spans 65536 values, so any `bits`
    * that divides 65536 folds uniformly.
    */
  private def probeBit(instrFn: String, keyExpr: String, i: Int,
      bits: Int): String =
    s"(${graft.llm.Dedup.hash16Expr(instrFn,
      s"concat(cast($keyExpr as string), '#$i')")} % $bits)"

  /** Spark-side fast form of [[probeBit]] (Dedup.hash16FastExpr —
    * one md5, bit-identical to the nibble construction). The oracle
    * keeps the portable strpos form.
    */
  private def probeBitFast(keyExpr: String, i: Int, bits: Int): String =
    s"(${graft.llm.Dedup.hash16FastExpr(
      s"concat(cast($keyExpr as string), '#$i')")} % $bits)"

  /** The 1-row broadcast filter: map<word, or-mask> over the build
    * keys' probe bits. ≤ bits/64 entries regardless of build size.
    */
  def buildFilter(dim: DataFrame, dimKey: String, bits: Int,
      k: Int): DataFrame = {
    require(bits > 0 && 65536 % bits == 0 && k >= 1)
    val bitCols = (0 until k).map(i =>
      expr(probeBitFast(dimKey, i, bits)))
    dim
      .select(explode(array(bitCols: _*)).as("b"))
      .groupBy(expr("b div 64").as("w"))
      .agg(bit_or(expr("shiftleft(cast(1 as bigint), cast(b % 64 as int))"))
        .as("mask"))
      .agg(map_from_arrays(collect_list(col("w")), collect_list(col("mask")))
        .as("bloom"))
  }

  /** Materialize the k probe-bit columns (`__b0..__b{k-1}`) for
    * `keyExpr` — ONE md5 evaluation each, however often the predicate
    * reads them — and return the frame plus the membership conjunction
    * against the `bloom` map column (all k probe bits set). Shared by
    * the batch audit and the streaming prescreen so both paths pay
    * exactly k hashes per row.
    */
  def withProbes(df: DataFrame, keyExpr: String, bits: Int,
      k: Int): (DataFrame, Column) = {
    val probed = (0 until k).foldLeft(df) { (d, i) =>
      d.withColumn(s"__b$i", expr(probeBitFast(keyExpr, i, bits)))
    }
    val pass = (0 until k).map { i =>
      expr(s"(shiftright(coalesce(element_at(bloom, cast(__b$i div 64 as int))," +
        s" cast(0 as bigint)), cast(__b$i % 64 as int)) & 1) = 1")
    }.reduce(_ && _)
    (probed, pass)
  }

  /** The probe columns [[withProbes]] adds, for callers that drop
    * them after filtering.
    */
  def probeCols(k: Int): Seq[String] = (0 until k).map(i => s"__b$i")

  /** The declared-query shape: distinct fact keys that survive the
    * bloom prune, flagged with true membership (so the oracle checks
    * the exact bit arithmetic — every false positive is part of the
    * hash). In a production pipeline the `passes` filter sits
    * directly on the fact scan and only survivors enter the exact
    * semi-join shuffle.
    */
  def pruneAudit(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, bits: Int = 16384, k: Int = 3): DataFrame = {
    val filt = buildFilter(dim, dimKey, bits, k)
    val members = dim.select(col(dimKey).as("__mk")).distinct()
    val (probed, pass) = withProbes(
      fact.select(col(factKey)).distinct().crossJoin(broadcast(filt)),
      factKey, bits, k)
    probed.filter(pass)
      // no broadcast hint: `members` is O(|dim-after-predicate|) — AQE
      // broadcasts it while small and falls back to a shuffle join at
      // scale (the bounded broadcast here is the bloom filter itself)
      .join(members, col(factKey) === col("__mk"), "left")
      .select(col(factKey), col("__mk").isNotNull.as("member"))
      .orderBy(col(factKey))
  }

  /** DuckDB oracle: the bit-set as a DISTINCT bit relation; a key
    * passes iff all k of its probe rows find their bit (LEFT JOIN +
    * HAVING count = k — `bs.b` is unique, so the join can't fan out).
    */
  def pruneAuditSql(factTable: String, factKey: String, dimTable: String,
      dimKey: String, dimPred: String, bits: Int = 16384,
      k: Int = 3): String = {
    val probeUnion = (0 until k).map(i =>
      s"SELECT ${probeBit("strpos", dimKey, i, bits)} AS b FROM dim")
      .mkString("\n  UNION\n  ")
    val factProbes = (0 until k).map(i =>
      s"SELECT $factKey, ${probeBit("strpos", factKey, i, bits)} AS b FROM fk")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH dim AS (
       |  SELECT $dimKey FROM $dimTable WHERE $dimPred
       |), dimd AS (
       |  SELECT DISTINCT $dimKey FROM dim
       |), bs AS (
       |  $probeUnion
       |), fk AS (
       |  SELECT DISTINCT $factKey FROM $factTable
       |), fp AS (
       |  $factProbes
       |), pass AS (
       |  SELECT fp.$factKey FROM fp LEFT JOIN bs USING (b)
       |  GROUP BY fp.$factKey HAVING count(bs.b) = ${k}
       |)
       |SELECT p.$factKey, (d.$dimKey IS NOT NULL) AS member
       |FROM pass p LEFT JOIN dimd d ON p.$factKey = d.$dimKey
       |ORDER BY p.$factKey""".stripMargin
  }
}
