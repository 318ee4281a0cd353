package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (t, v) observation flowing into a bounded series tail. */
final case class TPoint(t: Double, v: Double)

/** Bounded per-group series tail: keeps the k LARGEST-t (t, v) pairs
  * seen so far (≤4k buffered, map-side partials), returned in
  * ascending time order — the fleet twin of the driver-side
  * `orderBy(t desc).limit(p)` TakeOrdered in
  * [[graft.pipeline.Darima.seriesTailTimed]]. One
  * `groupBy(sid).agg(series_tail(p)(t, v))` pass collects every
  * series' forecast seed window at once: the exchange carries
  * O(partitions · series · k) rows regardless of series length —
  * never a per-series sort, never a window (the
  * [[BoundedTopK]] shape applied to time order).
  *
  * Ties on t keep the smaller v (deterministic; the engine's series
  * contract is unique timestamps — see OrderedLag — so ties never
  * occur on real input).
  */
final class BoundedSeriesTail(k: Int)
    extends Aggregator[TPoint, Seq[TPoint], Seq[TPoint]] {

  private def later(a: TPoint, b: TPoint): Boolean = {
    val c = java.lang.Double.compare(a.t, b.t)
    c > 0 || (c == 0 && a.v < b.v)
  }
  private def compact(s: Seq[TPoint]): Seq[TPoint] =
    s.sortWith(later).take(k)

  override def zero: Seq[TPoint] = Vector.empty
  override def reduce(buf: Seq[TPoint], a: TPoint): Seq[TPoint] = {
    val nb = buf :+ a
    if (nb.size >= k * 4) compact(nb) else nb
  }
  override def merge(x: Seq[TPoint], y: Seq[TPoint]): Seq[TPoint] =
    compact(x ++ y)
  override def finish(buf: Seq[TPoint]): Seq[TPoint] =
    compact(buf).reverse // ascending time order out

  override def bufferEncoder: Encoder[Seq[TPoint]] =
    ExpressionEncoder[Seq[TPoint]]()
  override def outputEncoder: Encoder[Seq[TPoint]] =
    ExpressionEncoder[Seq[TPoint]]()
}

object SeriesTail {
  /** `series_tail(k)(t, v)` — array of ≤k (t, v) structs, ascending t. */
  def series_tail(k: Int): (Column, Column) => Column = {
    val f = udaf(new BoundedSeriesTail(k))
    (t, v) => f(t, v)
  }
}
