package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct-count sketch: keep the k smallest
  * DISTINCT hash values seen; if fewer than k distinct hashes exist
  * the count is exact, otherwise distinct ≈ (k−1) / h₍k₎ with h₍k₎
  * the k-th smallest hash normalized to [0,1).
  *
  * The aggregate is a typed Aggregator (ObjectHashAggregate): each
  * partition reduces to a ≤4k buffer before the shuffle, so counting
  * distinct tokens over 100 TB moves O(partitions · groups · k)
  * values — where exact countDistinct shuffles every distinct value.
  * Hashes are 48-bit integers from the md5 hex prefix (exact in a
  * double), so DuckDB reproduces the estimate bit-for-bit from the
  * same md5 — a deterministic, engine-portable sketch (same trick as
  * the MinHash/SimHash operators).
  */
final class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Double] {
  /** 16¹²: normalizer for 12-hex-digit (48-bit) hash values. */
  private val norm = 281474976710656.0

  private def compact(s: Seq[Long]): Seq[Long] =
    s.distinct.sorted.take(k)

  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
    val nb = buf :+ h
    if (nb.size >= k * 4) compact(nb) else nb
  }
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    compact(x ++ y)
  override def finish(buf: Seq[Long]): Double = {
    val d = compact(buf)
    if (d.size < k) d.size.toDouble
    else (k - 1).toDouble / (d.last.toDouble / norm)
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Kmv {
  /** `kmv_distinct(h)` column over 48-bit hash values. */
  def kmv_distinct(k: Int)(h: Column): Column =
    udaf(new KmvSketch(k), Encoders.scalaLong)(h)
}
