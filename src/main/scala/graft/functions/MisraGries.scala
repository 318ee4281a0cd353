package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter summary: at most k counters; an unseen
  * item either claims a free counter or decrements all of them. The
  * classic guarantee: any item with true count > n/(k+1) is
  * GUARANTEED to hold a counter at the end, so the counter keys are a
  * complete candidate set for the heavy hitters.
  *
  * Merging (Agarwal et al., "Mergeable Summaries") sums two counter
  * sets and subtracts the (k+1)-th largest count — the summary stays
  * size-≤k and keeps the guarantee, which is exactly what makes it a
  * one-pass bounded-memory distributed aggregate (ObjectHashAggregate
  * partials of ≤k entries per partition; nothing shuffles but the
  * counter maps).
  *
  * The counter VALUES are merge-order-dependent, so the operator
  * never exposes them: `finish` returns only the candidate KEY set,
  * and the caller verifies candidates with one exact counting pass —
  * the textbook sketch-then-verify pattern whose final output is
  * deterministic on any cluster shape.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], w: String)
      : Map[String, Long] =
    buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1)
      case None if buf.size < k => buf.updated(w, 1L)
      case None => buf.collect {
        case (key, c) if c > 1 => key -> (c - 1)
      }
    }

  override def merge(x: Map[String, Long], y: Map[String, Long])
      : Map[String, Long] = {
    val summed = y.foldLeft(x) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sortBy(-_).apply(k)
      summed.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MisraGries {
  /** `mg_candidates(w)` — candidate heavy-hitter keys. */
  def mg_candidates(k: Int)(w: Column): Column =
    udaf(new MisraGries(k), Encoders.STRING)(w)
}
