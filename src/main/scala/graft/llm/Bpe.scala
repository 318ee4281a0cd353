package graft.llm

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (SURVEY.md §2.9 X3) — the
  * tokenizer-training primitive of an LLM data pipeline: iteratively
  * find the most frequent adjacent symbol pair across the corpus
  * vocabulary and fuse it, emitting the learned merge table.
  *
  * Shape at scale: the corpus collapses to a (word, freq) vocabulary
  * table in one hash aggregation — pair statistics per round are an
  * explode + hash agg over the vocabulary, never the corpus, and the
  * only driver transfer per round is the single argmax pair row. The
  * round count is the (small, fixed) number of merges requested;
  * every per-round table is `localCheckpoint`ed so lineage stays flat.
  *
  * Symbols are wrapped in angle brackets inside the working string
  * ("he" → "<h> <e>") so the merge rewrite `replace(sym, "<l> <r>",
  * "<lr>")` can never match inside a longer symbol, and consecutive
  * occurrences never share a delimiter (replace-all is left-to-right
  * non-overlapping in both engines). Words containing the bracket
  * characters are excluded from the vocabulary (documented contract).
  * No end-of-word marker is modeled — merges never span words anyway.
  *
  * Counts are integers and the argmax tie-break is a total order
  * (count desc, left asc, right asc), so results are bit-exact and
  * oracle-checkable with no float hazard.
  */
object Bpe {

  private def strip(s: String): String = s.replace("<", "").replace(">", "")

  // Spark string literals process backslash escapes, so both the
  // quote AND the backslash must be escaped or a corpus word like
  // "a\\b" corrupts the rewrite pattern (and the learner re-emits the
  // same merge forever because the pair count never drops)
  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  /** Learn `rounds` BPE merges from the corpus word vocabulary.
    * Output: (merge_rank, lhs, rhs, merged, cnt) — one row per merge,
    * in learning order.
    */
  def merges(docs: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0 &&
        !col("w").contains("<") && !col("w").contains(">"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(expr(
        "concat_ws(' ', transform(sequence(1, length(w)), " +
          "i -> concat('<', substr(w, i, 1), '>')))").as("sym"),
        col("freq"))
      .localCheckpoint()
    val learned = ListBuffer[(Int, String, String, String, Long)]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // bounded driver transfer: exactly one argmax row per round
      val best = vocab
        .select(split(col("sym"), " ").as("a"), col("freq"))
        .filter(size(col("a")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> struct(a[i-1] AS l, a[i] AS r))")).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val l = best(0).getString(0)
        val rt = best(0).getString(1)
        val cnt = best(0).getLong(2)
        learned += ((r, strip(l), strip(rt), strip(l) + strip(rt), cnt))
        val mergedSym = "<" + strip(l) + strip(rt) + ">"
        vocab = vocab.withColumn("sym", expr(
          s"replace(sym, '${sqlLit(l + " " + rt)}', '${sqlLit(mergedSym)}')"))
          .localCheckpoint()
        r += 1
      }
    }
    learned.toSeq
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
      .orderBy(col("merge_rank"))
  }

  /** Tokenize the corpus with the learned merge table (x47) — the
    * encode half of the tokenizer loop (learn merges → encode docs →
    * pack sequences): per document, symbolize each word, join words
    * with a " / " separator no "<l> <r>" merge pattern can span
    * (patterns are bracket-wrapped symbol pairs with a single
    * interior space; the separator text between words is "> / <"),
    * fold the merges in rank order as left-to-right non-overlapping
    * replaces, and count the surviving symbols by counting their
    * opening brackets.
    *
    * Shape at scale: learning's per-round driver transfer is one
    * argmax row (see [[merges]]); the encode itself is a MAP-ONLY
    * projection — R chained `replace` column expressions against
    * merge-pattern literals, no join, no shuffle, nothing collected.
    * Output is integer-exact: (doc_id, n_chars, n_tokens), where
    * n_chars counts the characters of the words the tokenizer
    * contract admits (bracket-containing words are excluded exactly
    * as in vocabulary learning).
    */
  def encode(docs: DataFrame, rounds: Int): DataFrame = {
    val learned = merges(docs, rounds).collect() // bounded: ≤rounds rows
    val wordsExpr =
      "filter(split(text, ' '), w -> length(w) > 0 " +
        "AND NOT (w LIKE '%<%' OR w LIKE '%>%'))"
    val symbolized =
      s"""array_join(transform($wordsExpr,
         |  w -> concat_ws(' ', transform(sequence(1, length(w)),
         |    i -> concat('<', substr(w, i, 1), '>')))), ' / ')""".stripMargin
    val mergedExpr = learned.foldLeft(symbolized) { (acc, m) =>
      val pat = "<" + m.getAs[String]("lhs") + "> <" + m.getAs[String]("rhs") + ">"
      val rep = "<" + m.getAs[String]("merged") + ">"
      s"replace($acc, '${sqlLit(pat)}', '${sqlLit(rep)}')"
    }
    docs.select(col("doc_id"),
      expr(s"aggregate($wordsExpr, 0L, (acc, w) -> acc + length(w))")
        .as("n_chars"),
      expr(s"length($mergedExpr) - length(replace($mergedExpr, '<', ''))")
        .cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[encode]]: re-derives the merge table with
    * [[mergesSql]]'s unrolled stages, then applies the same nested
    * replaces per document with scalar subqueries against each
    * round's argmax row.
    */
  def encodeSql(rounds: Int): String = {
    val syms =
      """array_to_string(list_transform(words,
        |  w -> array_to_string(list_transform(range(1, len(w) + 1),
        |    i -> '<' || w[CAST(i AS INT):CAST(i AS INT)] || '>'), ' ')),
        |  ' / ')""".stripMargin
    val merged = (1 to rounds).foldLeft(syms) { (acc, r) =>
      s"""replace($acc,
         |  (SELECT l || ' ' || r2 FROM b$r),
         |  (SELECT '<' || replace(replace(l, '<', ''), '>', '') ||
         |       replace(replace(r2, '<', ''), '>', '') || '>' FROM b$r))"""
        .stripMargin
    }
    s"""WITH ${stagesSql(rounds)},
       |fw AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '),
       |      w -> len(w) > 0 AND w NOT LIKE '%<%' AND w NOT LIKE '%>%')
       |      AS words
       |  FROM documents
       |), enc AS (
       |  SELECT doc_id,
       |    COALESCE(CAST(list_aggregate(
       |      list_transform(words, w -> len(w)), 'sum') AS BIGINT), 0)
       |      AS n_chars,
       |    $merged AS sym
       |  FROM fw
       |)
       |SELECT doc_id, n_chars,
       |       CAST(len(sym) - len(replace(sym, '<', '')) AS BIGINT)
       |         AS n_tokens
       |FROM enc ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle: the same merge loop unrolled into CTE stages —
    * one (pairs, argmax, rewrite) triple per round, integer counts
    * throughout. Assumes every round finds at least one pair (true
    * whenever the corpus has any multi-character word).
    */
  /** The w0 → (b1,w1) → … → (bR,wR) CTE chain shared by the merges
    * and encode oracles: per round, the corpus-wide pair argmax (bR)
    * and the vocabulary rewrite (wR).
    */
  private def stagesSql(rounds: Int): String = {
    val stages = new StringBuilder
    stages.append(
      """w0 AS MATERIALIZED (
        |  SELECT array_to_string(list_transform(range(1, len(w) + 1),
        |           i -> '<' || w[CAST(i AS INT):CAST(i AS INT)] || '>'), ' ')
        |           AS sym,
        |         freq
        |  FROM (SELECT w, count(*) AS freq
        |        FROM (SELECT unnest(string_split(text, ' ')) AS w
        |              FROM documents)
        |        WHERE len(w) > 0 AND w NOT LIKE '%<%' AND w NOT LIKE '%>%'
        |        GROUP BY w)
        |)""".stripMargin)
    for (r <- 1 to rounds) {
      val p = r - 1
      stages.append(s""",
        |b$r AS MATERIALIZED (
        |  SELECT l, r2, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (
        |    SELECT a[CAST(i AS INT)] AS l, a[CAST(i AS INT) + 1] AS r2, freq
        |    FROM (SELECT string_split(sym, ' ') AS a, freq FROM w$p) q,
        |         UNNEST(range(1, len(a))) AS u(i)
        |    WHERE len(a) >= 2)
        |  GROUP BY l, r2
        |  ORDER BY cnt DESC, l, r2 LIMIT 1
        |),
        |w$r AS MATERIALIZED (
        |  SELECT replace(sym,
        |           (SELECT l || ' ' || r2 FROM b$r),
        |           (SELECT '<' || replace(replace(l, '<', ''), '>', '') ||
        |                replace(replace(r2, '<', ''), '>', '') || '>'
        |            FROM b$r)) AS sym,
        |         freq
        |  FROM w$p
        |)""".stripMargin)
    }
    stages.toString
  }

  def mergesSql(rounds: Int): String = {
    val arms = (1 to rounds).map { r =>
      s"""SELECT $r AS merge_rank,
         |  replace(replace(l, '<', ''), '>', '') AS lhs,
         |  replace(replace(r2, '<', ''), '>', '') AS rhs,
         |  replace(replace(l, '<', ''), '>', '') ||
         |    replace(replace(r2, '<', ''), '>', '') AS merged,
         |  cnt
         |FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${stagesSql(rounds)}
       |SELECT * FROM (
       |$arms
       |) ORDER BY merge_rank""".stripMargin
  }
}
