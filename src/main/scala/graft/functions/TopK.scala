package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate flowing into a bounded top-k. */
final case class ScoredId(cos: Double, vec_id: Long)

/** Bounded top-k aggregate: keeps the k best (cos DESC, vec_id ASC)
  * entries seen so far, never more than 4k in the buffer. Registered
  * as a typed Aggregator so Spark runs it as an ObjectHashAggregate
  * with map-side partials — each input partition reduces to one ≤4k
  * buffer per group BEFORE the shuffle, so the exchange carries
  * O(partitions · groups · k) rows no matter how many candidates were
  * scored. This is the scale-safe replacement for
  * `row_number() OVER (PARTITION BY qid ORDER BY cos DESC)`, which
  * shuffles every scored row into one partition per distinct qid and
  * fully sorts it — a near-single-reducer funnel when qids are few.
  *
  * Ordering matches Spark's SQL sort on (cos DESC, vec_id ASC) exactly
  * (java.lang.Double.compare: NaN greatest, -0.0 < 0.0), so results
  * are bit-identical to the window form it replaces.
  */
final class BoundedTopK(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.cos, b.cos)
    c > 0 || (c == 0 && a.vec_id < b.vec_id)
  }
  private def compact(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortWith(better).take(k)

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] = {
    val nb = buf :+ a
    if (nb.size >= k * 4) compact(nb) else nb
  }
  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    compact(x ++ y)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = compact(buf)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

/** One (score, key) candidate flowing into a string-keyed bounded
  * top-k — integer scores, lexicographic tie-break.
  */
final case class ScoredStr(score: Long, key: String)

/** String-keyed sibling of [[BoundedTopK]]: keeps the k best
  * (score DESC, key ASC) entries, ≤4k buffered, map-side partials —
  * the scale-safe replacement for
  * `row_number() OVER (PARTITION BY grp ORDER BY score DESC, key)`
  * when the grouping key has low cardinality (a per-source window
  * would funnel every candidate row into \|sources\| reducers).
  * ASCII keys order identically in Java, Spark UTF8String, and
  * DuckDB, so the tie-break is engine-stable.
  */
final class BoundedTopKStr(k: Int)
    extends Aggregator[ScoredStr, Seq[ScoredStr], Seq[ScoredStr]] {

  private def better(a: ScoredStr, b: ScoredStr): Boolean =
    a.score > b.score || (a.score == b.score && a.key < b.key)
  private def compact(s: Seq[ScoredStr]): Seq[ScoredStr] =
    s.sortWith(better).take(k)

  override def zero: Seq[ScoredStr] = Vector.empty
  override def reduce(buf: Seq[ScoredStr], a: ScoredStr): Seq[ScoredStr] = {
    val nb = buf :+ a
    if (nb.size >= k * 4) compact(nb) else nb
  }
  override def merge(x: Seq[ScoredStr], y: Seq[ScoredStr]): Seq[ScoredStr] =
    compact(x ++ y)
  override def finish(buf: Seq[ScoredStr]): Seq[ScoredStr] = compact(buf)

  override def bufferEncoder: Encoder[Seq[ScoredStr]] =
    ExpressionEncoder[Seq[ScoredStr]]()
  override def outputEncoder: Encoder[Seq[ScoredStr]] =
    ExpressionEncoder[Seq[ScoredStr]]()
}

object TopK {
  /** `top_k(cos, id)` column: array<struct<cos,vec_id>> of the k best
    * rows of the group, sorted (cos DESC, vec_id ASC).
    */
  def top_k(k: Int)(cos: Column, id: Column): Column =
    udaf(new BoundedTopK(k), ExpressionEncoder[ScoredId]())(cos, id)

  /** `top_k_str(score, key)` column: array<struct<score,key>> of the
    * k best rows of the group, sorted (score DESC, key ASC).
    */
  def top_k_str(k: Int)(score: Column, key: Column): Column =
    udaf(new BoundedTopKStr(k), ExpressionEncoder[ScoredStr]())(score, key)
}
