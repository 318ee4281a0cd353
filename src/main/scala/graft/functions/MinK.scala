package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Cap-and-drop bucket collection in ONE bounded pass: keeps at most
  * `cap + 1` smallest distinct values per group; a group still
  * holding more than `cap` at the end is an over-full LSH bucket and
  * finishes EMPTY (cap-and-drop), otherwise the full sorted member
  * list is returned — exactly `sort_array(collect_list(...))` + size
  * filter, but the aggregation buffer never exceeds cap+1 entries.
  * The naive form materializes a degenerate bucket's entire member
  * list before the size check (the single-buffer OOM the cap exists
  * to prevent); the count-prune-then-collect form is safe but pays a
  * second aggregation over the exploded rows. This is one
  * ObjectHashAggregate with map-side partials, one exchange.
  *
  * Composite members (e.g. (doc_id, simhash)) pack into the Long —
  * sorting by the packed value must equal sorting by the tuple.
  */
final class BoundedMinK(cap: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def compact(s: Seq[Long]): Seq[Long] =
    s.distinct.sorted.take(cap + 1)

  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = {
    val nb = buf :+ v
    if (nb.size > 2 * (cap + 1)) compact(nb) else nb
  }
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    compact(x ++ y)
  override def finish(buf: Seq[Long]): Seq[Long] = {
    val d = compact(buf)
    if (d.size > cap) Vector.empty else d
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** Keep-the-k-smallest aggregate (no drop): the bounded replacement
  * for a per-group `row_number() <= k` cut when the downstream wants
  * the k best packed values of EVERY group, however large the group
  * — unlike [[BoundedMinK]], an over-full group keeps its k smallest
  * instead of finishing empty. Buffer never exceeds 4k entries;
  * ObjectHashAggregate with map-side partials, one exchange.
  */
final class SmallestK(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def compact(s: Seq[Long]): Seq[Long] = s.sorted.take(k)

  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = {
    val nb = buf :+ v
    if (nb.size >= 4 * k) compact(nb) else nb
  }
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    compact(x ++ y)
  override def finish(buf: Seq[Long]): Seq[Long] = compact(buf)

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinK {
  /** `bounded_min_k(v)`: sorted member array, or empty when the group
    * exceeds `cap` members (drop the bucket).
    */
  def bounded_min_k(cap: Int)(v: Column): Column =
    udaf(new BoundedMinK(cap), Encoders.scalaLong)(v)

  /** `smallest_k(v)`: the group's k smallest values, sorted ascending
    * (never dropped, duplicates kept).
    */
  def smallest_k(k: Int)(v: Column): Column =
    udaf(new SmallestK(k), Encoders.scalaLong)(v)
}
