package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** All `perms` Carter–Wegman permutation minima in ONE aggregate
  * state: min over rows of (x·a_b + c_b) mod p per permutation b,
  * returned as the length-`perms` signature array.
  *
  * The previous form — 128 separate `min(...)` aggregate columns —
  * produced a 128-field aggregation buffer, which is past Spark's
  * whole-stage-codegen field limit (spark.sql.codegen.maxFields =
  * 100): the ENTIRE signature plan fell back to interpreted
  * row-at-a-time evaluation, measured at 18.5 s of task time for
  * x141's signature pass at sf0.1 (68 µs/row for what is ~128
  * multiply-mods). Here the buffer is one long[] and the permutation
  * loop is a tight JVM loop (the MinK/TopK ObjectHashAggregate idiom,
  * map-side partials + elementwise-min merge); the surrounding
  * projections regain codegen.
  *
  * Exactly the integers of the column form: products stay < 2⁶⁰
  * (x < 2²⁸, a < p ≈ 2³¹), Java % equals Spark's pmod-free % on
  * non-negative operands, and a group always has ≥ 1 input row (the
  * minima come from grouped shingle rows), so the MaxValue sentinel
  * never escapes.
  */
final class MinhashSigAgg(pa: Array[Long], pc: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(pa.length)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var b = 0
    val n = pa.length
    while (b < n) {
      val v = (x * pa(b) + pc(b)) % p
      if (v < buf(b)) buf(b) = v
      b += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var b = 0
    val n = x.length
    while (b < n) {
      if (y(b) < x(b)) x(b) = y(b)
      b += 1
    }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinhashSig {
  /** `minhash_sig(x)`: the group's permutation-minima signature
    * array under the (pa, pc, p) family, in permutation order.
    */
  def minhash_sig(pa: Seq[Long], pc: Seq[Long], p: Long)(
      x: Column): Column =
    udaf(new MinhashSigAgg(pa.toArray, pc.toArray, p),
      Encoders.scalaLong)(x)
}
