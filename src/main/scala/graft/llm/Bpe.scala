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
  * every per-round table is pinned (graft.tools.Materialize) so lineage stays flat.
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
      .transform(graft.tools.Materialize(_))
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
          .transform(graft.tools.Materialize(_))
        r += 1
      }
    }
    learned.toSeq
      .toDF("merge_rank", "lhs", "rhs", "merged", "cnt")
      .orderBy(col("merge_rank"))
  }

  /** One merge applied to a word's symbol array: a single
    * left-to-right NON-OVERLAPPING fuse pass — exactly the semantics
    * of `replace(sym, '<l> <r>', '<lr>')` on the bracket-delimited
    * string form (a match consumes both symbols and the scan resumes
    * after the replacement, so the fused symbol never re-matches as
    * the right side within the same pass).
    */
  private def fusePass(syms: Array[String], l: String, r: String): Array[String] = {
    // cheap pre-scan: most merges touch nothing in a given word
    var i = 0
    var hit = -1
    while (hit < 0 && i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) hit = i
      i += 1
    }
    if (hit < 0) return syms
    val out = new ListBuffer[String]
    var j = 0
    while (j < hit) { out += syms(j); j += 1 }
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
        out += (l + r); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Token count of one word under the learned merge table: symbolize
    * to characters, then apply every merge in rank order (one fuse
    * pass each — BPE encode is inherently sequential per word).
    */
  private[graft] def tokenizeWord(word: String, ms: Array[(String, String)]): Int = {
    var syms: Array[String] = word.toCharArray.map(_.toString)
    var mi = 0
    while (mi < ms.length && syms.length >= 2) {
      syms = fusePass(syms, ms(mi)._1, ms(mi)._2)
      mi += 1
    }
    syms.length
  }

  /** Tokenize the corpus with the learned merge table (x47) — the
    * encode half of the tokenizer loop (learn merges → encode docs →
    * pack sequences). Encoding is a typed mapPartitions pass against
    * the BROADCAST merge table: per admitted word (the same contract
    * as learning — non-empty, no angle brackets), apply the merges in
    * rank order as left-to-right non-overlapping fuse passes over the
    * word's symbol array, and count the surviving symbols. A
    * per-partition memo of distinct-word token counts makes the cost
    * O(distinct words × merges × word length) rather than per
    * occurrence.
    *
    * Shape at scale: learning's per-round driver transfer is one
    * argmax row (see [[merges]]); the encode itself is MAP-ONLY — no
    * join, no shuffle, nothing collected — and scales in the
    * MERGE-COUNT dimension (a production tokenizer's ~32k merges is a
    * bigger broadcast array and a longer per-word loop, not a deeper
    * Catalyst expression tree). Output is integer-exact:
    * (doc_id, n_chars, n_tokens), where n_chars counts the characters
    * of the admitted words.
    */
  def encode(docs: DataFrame, rounds: Int): DataFrame = {
    val learned = merges(docs, rounds).collect() // bounded: ≤rounds rows
    encodeWith(docs,
      learned.map(m => (m.getAs[String]("lhs"), m.getAs[String]("rhs"))).toSeq)
  }

  /** BPE encode SERVE path (train-once/serve-many,
    * [[graft.tools.ModelStore]]): the ≤rounds-row merge table is
    * learned + persisted on first use and read back — no per-round
    * argmax jobs at all — on every later one; the encode itself is
    * the same map-only [[encodeWith]] pass, so the served result is
    * bit-identical to [[encode]] (strings and integer counts
    * round-trip parquet exactly).
    */
  def encodeServe(docs: DataFrame, modelPath: String,
      rounds: Int): DataFrame = {
    val learned = graft.tools.ModelStore
      .ensure(modelPath, merges(docs, rounds), spec = "merges v1")
      .orderBy(col("merge_rank"))
      .collect() // bounded: ≤rounds merge rows, applied in rank order
    encodeWith(docs,
      learned.map(m => (m.getAs[String]("lhs"), m.getAs[String]("rhs"))).toSeq)
  }

  /** Encode against an already-learned merge table, in rank order. */
  def encodeWith(docs: DataFrame, ms: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(ms.toArray)
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Option[Long], String)]
      .mapPartitions { it =>
        val table = bc.value
        val memo = new java.util.HashMap[String, Integer]()
        it.map { case (id, text) =>
          if (text == null) (id, None: Option[Long], None: Option[Long])
          else {
            var chars = 0L
            var toks = 0L
            text.split(" ", -1).foreach { w =>
              if (w.nonEmpty && w.indexOf('<') < 0 && w.indexOf('>') < 0) {
                chars += w.length
                var t = memo.get(w)
                if (t == null) { t = tokenizeWord(w, table); memo.put(w, t) }
                toks += t.toLong
              }
            }
            (id, Some(chars), Some(toks))
          }
        }
      }
      .toDF("doc_id", "n_chars", "n_tokens")
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[encode]]: re-derives the merge table with
    * [[mergesSql]]'s unrolled stages, then applies the same nested
    * replaces per document with scalar subqueries against each
    * round's argmax row.
    */
  /** The encode oracle as a CTE body (final relation: `bpetok`
    * (doc_id, n_chars, n_tokens)) — shared by the standalone x47/x69
    * oracle and the x115 fertility oracle.
    */
  /** The per-word symbol string, one `<c>` cell per character. */
  private def symsExpr: String =
    """array_to_string(list_transform(words,
      |  w -> array_to_string(list_transform(range(1, len(w) + 1),
      |    i -> '<' || w[CAST(i AS INT):CAST(i AS INT)] || '>'), ' ')),
      |  ' / ')""".stripMargin

  /** The nested-replace fold applying merge rounds 1..rounds to
    * [[symsExpr]] — shared by the full encode oracle and the x139
    * size-sweep oracle (a truncated tokenizer is the SAME fold
    * stopped at a prefix of the stages).
    */
  private def mergedExpr(rounds: Int): String =
    (1 to rounds).foldLeft(symsExpr) { (acc, r) =>
      s"""replace($acc,
         |  (SELECT l || ' ' || r2 FROM b$r),
         |  (SELECT '<' || replace(replace(l, '<', ''), '>', '') ||
         |       replace(replace(r2, '<', ''), '>', '') || '>' FROM b$r))"""
        .stripMargin
    }

  private[graft] def encodeCtesSql(rounds: Int): String = {
    val merged = mergedExpr(rounds)
    s"""${stagesSql(rounds)},
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
       |), bpetok AS (
       |  SELECT doc_id, n_chars,
       |         CAST(len(sym) - len(replace(sym, '<', '')) AS BIGINT)
       |           AS n_tokens
       |  FROM enc
       |)""".stripMargin
  }

  def encodeSql(rounds: Int): String =
    s"""WITH ${encodeCtesSql(rounds)}
       |SELECT doc_id, n_chars, n_tokens
       |FROM bpetok ORDER BY doc_id""".stripMargin

  /** X3x: tokenizer SIZE sweep — corpus token counts under PREFIXES
    * of the learned merge table (a BPE tokenizer truncated to its
    * first m merges IS the m-merge tokenizer — merges are learned
    * greedily, so every budget m prices as the rank-m prefix): per
    * candidate m, total chars (constant), total tokens, and exact
    * chars-per-token in integer micro-units. x115 prices ONE trained
    * tokenizer per language; this prices the SIZE knob itself —
    * "how much compression does each extra merge buy" — the
    * vocabulary-budget curve for the real subword tokenizer (x123 is
    * its whitespace-unigram cousin).
    *
    * Scale shape: learn once at max(m) (the bounded ≤rounds-row
    * table), then one map-only [[encodeWith]] pass per candidate —
    * \|candidates\| linear passes, each a single 1-row aggregate; no
    * shuffle grows with the corpus.
    */
  def sizeSweep(docs: DataFrame, mergeCounts: Seq[Int]): DataFrame = {
    require(mergeCounts.nonEmpty && mergeCounts.forall(_ >= 1))
    val learned = merges(docs, mergeCounts.max)
      .orderBy(col("merge_rank"))
      .collect() // bounded: ≤max(m) merge rows, applied in rank order
      .map(m => (m.getAs[String]("lhs"), m.getAs[String]("rhs")))
      .toSeq
    mergeCounts.sorted.map { m =>
      encodeWith(docs, learned.take(m))
        .agg(sum(col("n_chars")).as("n_chars"),
          sum(col("n_tokens")).as("n_tokens"))
        .select(lit(m).as("n_merges"), col("n_chars"), col("n_tokens"),
          expr("n_chars * 1000000 div n_tokens")
            .as("chars_per_token_micro"))
    }.reduce(_.unionAll(_)).orderBy(col("n_merges"))
  }

  /** Oracle: ONE stage chain at max(m); each candidate folds the
    * shared [[mergedExpr]] prefix (same greedy-prefix property).
    */
  def sizeSweepSql(mergeCounts: Seq[Int]): String = {
    val maxR = mergeCounts.max
    val arms = mergeCounts.sorted.map { m =>
      s"""SELECT $m AS n_merges,
         |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_chars) * 1000000 // sum(n_tokens) AS BIGINT)
         |    AS chars_per_token_micro
         |FROM (
         |  SELECT doc_id, n_chars,
         |    CAST(len(sym) - len(replace(sym, '<', '')) AS BIGINT)
         |      AS n_tokens
         |  FROM (
         |    SELECT doc_id,
         |      COALESCE(CAST(list_aggregate(
         |        list_transform(words, w -> len(w)), 'sum') AS BIGINT), 0)
         |        AS n_chars,
         |      ${mergedExpr(m)} AS sym
         |    FROM fw))""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${stagesSql(maxR)},
       |fw AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '),
       |      w -> len(w) > 0 AND w NOT LIKE '%<%' AND w NOT LIKE '%>%')
       |      AS words
       |  FROM documents
       |)
       |$arms
       |ORDER BY n_merges""".stripMargin
  }

  /** X3: tokenizer-fertility report — per language: documents,
    * admitted whitespace words, BPE tokens under the TRAINED merge
    * table (the x69 `ModelStore` artifact, served not retrained),
    * and the two ratios a tokenizer eval watches, in exact integer
    * basis points: fertility (BPE tokens per word — how much the
    * tokenizer fragments this language) and compression (chars per
    * BPE token). A language whose fertility runs 2–3× the corpus
    * mean is under-served by the merge table and will consume that
    * multiple of sequence length at training time — THE table behind
    * max-seq-len and per-language budget decisions (x108's cap table
    * consumes whitespace tokens; this one prices the real tokenizer).
    *
    * Scale shape: the map-only served encode pass ([[encodeWith]]
    * against the ≤rounds-row broadcast merge table), one doc_id
    * co-keyed join to the lang/word-count projection, one |langs|-row
    * hash agg; ratios are integer `div` — exact in any engine.
    */
  def fertility(docs: DataFrame, modelPath: String,
      rounds: Int): DataFrame = {
    val enc = encodeServe(docs, modelPath, rounds)
    val words = docs.select(col("doc_id"), col("lang"),
      expr("""size(filter(split(text, ' '),
        |  w -> w != '' and instr(w, '<') = 0 and instr(w, '>') = 0))"""
        .stripMargin).cast("long").as("n_words"))
    enc.join(words, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_words"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("lang"), col("n_docs"), col("total_words"),
        col("total_tokens"), col("total_chars"),
        when(col("total_words") > 0,
          expr("total_tokens * 10000 div total_words"))
          .otherwise(lit(0L)).as("fertility_bp"),
        when(col("total_tokens") > 0,
          expr("total_chars * 10000 div total_tokens"))
          .otherwise(lit(0L)).as("chars_per_token_bp"))
      .orderBy(col("lang"))
  }

  def fertilitySql(rounds: Int): String =
    s"""WITH ${encodeCtesSql(rounds)},
       |wl AS (
       |  SELECT doc_id, lang,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      w -> len(w) > 0 AND w NOT LIKE '%<%' AND w NOT LIKE '%>%'))
       |      AS BIGINT) AS n_words
       |  FROM documents
       |)
       |SELECT w.lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(w.n_words) AS BIGINT) AS total_words,
       |  CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(t.n_chars) AS BIGINT) AS total_chars,
       |  CASE WHEN sum(w.n_words) > 0
       |    THEN CAST((sum(t.n_tokens) * 10000) // sum(w.n_words)
       |      AS BIGINT) ELSE 0 END AS fertility_bp,
       |  CASE WHEN sum(t.n_tokens) > 0
       |    THEN CAST((sum(t.n_chars) * 10000) // sum(t.n_tokens)
       |      AS BIGINT) ELSE 0 END AS chars_per_token_bp
       |FROM bpetok t JOIN wl w ON t.doc_id = w.doc_id
       |GROUP BY w.lang ORDER BY w.lang""".stripMargin

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
