package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 128-bit signed accumulator helpers shared by the power-iteration
  * aggregates: state is (hi, lo) long pairs in two's complement, with
  * products formed exactly via Math.multiplyHigh. Exact integer sums
  * in any order — the same values the previous DECIMAL(38,0) column
  * sums produced (all magnitudes here stay far under 2¹²⁷), without
  * per-row BigDecimal allocation or the interpreted higher-order
  * dot-product fold (HigherOrderFunction is CodegenFallback): one
  * power-iteration step was measured at 3-4 s of task time over a
  * 5,000-row cloud; the tight-loop form is microseconds per row.
  */
private object Acc128 {
  /** buf(2i), buf(2i+1) += the 128-bit product a·b. */
  def addProduct(buf: Array[Long], i: Int, a: Long, b: Long): Unit = {
    val lo = a * b
    val hi = Math.multiplyHigh(a, b)
    val oldLo = buf(2 * i + 1)
    val newLo = oldLo + lo
    // unsigned carry out of the low word
    val carry = ((oldLo & lo) | ((oldLo | lo) & ~newLo)) >>> 63
    buf(2 * i + 1) = newLo
    buf(2 * i) = buf(2 * i) + hi + carry
  }

  /** x(2i..) += y(2i..) for each 128-bit slot. */
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) {
      val oldLo = x(i + 1)
      val lo = y(i + 1)
      val newLo = oldLo + lo
      val carry = ((oldLo & lo) | ((oldLo | lo) & ~newLo)) >>> 63
      x(i + 1) = newLo
      x(i) = x(i) + y(i) + carry
      i += 2
    }
    x
  }

  /** Exact decimal string of the signed 128-bit slot i. */
  def toDecimalString(buf: Array[Long], i: Int): String =
    BigInteger.valueOf(buf(2 * i)).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(buf(2 * i + 1))))
      .toString
}

/** One power-iteration matvec step w = Σ_x x·(x·v) as a single
  * aggregate: per row the long dot x·v (exact — same bound the
  * previous in-plan fold relied on), then dim exact 128-bit sums of
  * x_j·dot. Rows shorter than `dim` contribute only their defined
  * positions, matching the previous CASE WHEN size(xs) > j sums
  * (a position with no contributions finishes 0, which is what the
  * driver mapped the previous form's NULL to).
  */
final class PowerStepAgg(v: Array[Long], dim: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[String]] {

  override def zero: Array[Long] = new Array[Long](2 * dim)

  override def reduce(buf: Array[Long], xs: Seq[Long]): Array[Long] = {
    val x = xs.toArray
    val n = math.min(math.min(x.length, v.length), dim)
    var dot = 0L
    var j = 0
    while (j < n) { dot += x(j) * v(j); j += 1 }
    j = 0
    while (j < n) { Acc128.addProduct(buf, j, x(j), dot); j += 1 }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    Acc128.merge(x, y)

  override def finish(buf: Array[Long]): Seq[String] =
    (0 until dim).map(j => Acc128.toDecimalString(buf, j))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

/** (Σ (x·v)², Σ ‖x‖²) in one pass — the quadratic form and trace the
  * share report reads, as exact 128-bit sums.
  */
final class QuadTraceAgg(v: Array[Long])
    extends Aggregator[Seq[Long], Array[Long], Seq[String]] {

  override def zero: Array[Long] = new Array[Long](4)

  override def reduce(buf: Array[Long], xs: Seq[Long]): Array[Long] = {
    val x = xs.toArray
    val n = math.min(x.length, v.length)
    var dot = 0L
    var j = 0
    while (j < n) { dot += x(j) * v(j); j += 1 }
    Acc128.addProduct(buf, 0, dot, dot)
    j = 0
    while (j < x.length) { Acc128.addProduct(buf, 1, x(j), x(j)); j += 1 }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    Acc128.merge(x, y)

  override def finish(buf: Array[Long]): Seq[String] =
    Seq(Acc128.toDecimalString(buf, 0), Acc128.toDecimalString(buf, 1))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object PowerSums {
  def power_step(v: Seq[Long], dim: Int)(xs: Column): Column =
    udaf(new PowerStepAgg(v.toArray, dim),
      ExpressionEncoder[Seq[Long]]())(xs)

  def quad_trace(v: Seq[Long])(xs: Column): Column =
    udaf(new QuadTraceAgg(v.toArray), ExpressionEncoder[Seq[Long]]())(xs)
}
