package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus heavy-hitter terms (SURVEY.md §2.9 X3) — the frequent-token
  * statistics a tokenizer/quality pipeline wants from a 100 TB corpus
  * without a full-vocabulary shuffle: a Misra–Gries sketch pass finds
  * a ≤k candidate set in bounded memory (its guarantee: every item
  * with count > n/(k+1) is a candidate), then one exact counting pass
  * over just those candidates yields the true heavy hitters.
  *
  * The final output is sketch-independent — exactly the items with
  * exact count·(k+1) > n — so it is deterministic on any cluster
  * shape and oracle-checkable by a plain exact count in DuckDB. The
  * sketch buys the bounded candidate set; the verify pass is a
  * scan + broadcast-filterable isin over ≤k strings.
  */
object HeavyHitters {

  def heavyHitters(docs: DataFrame, k: Int = 32): DataFrame = {
    val tok = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    // bounded driver transfer: the ≤k-candidate key set
    val cands = tok
      .agg(graft.functions.MisraGries.mg_candidates(k)(col("w")).as("c"))
      .collect()(0).getSeq[String](0)
    val tot = tok.agg(count(lit(1)).as("n"))
    tok.filter(col("w").isin(cands: _*))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("w"), col("cnt"),
        round(col("cnt") / col("n"), 6).as("frac"))
      .orderBy(col("cnt").desc, col("w"))
  }

  /** Oracle: the sketch-free definition — exact counts, keep
    * cnt·(k+1) > n.
    */
  def heavyHittersSql(k: Int = 32): String =
    s"""WITH tok AS (
       |  SELECT w FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0
       |), c AS (
       |  SELECT w, count(*) AS cnt FROM tok GROUP BY w
       |), n AS (
       |  SELECT count(*) AS n FROM tok
       |)
       |SELECT w, cnt, round(cnt / (n * 1.0), 6) AS frac
       |FROM c CROSS JOIN n
       |WHERE cnt * ${k + 1} > n
       |ORDER BY cnt DESC, w""".stripMargin
}
