package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count–Min sketch: a depth×width grid of counters; every item
  * increments one counter per row (hash_j(item) mod width), and a
  * point-frequency estimate is the MIN over the rows' counters —
  * never an underestimate, overcounting only by hash collisions
  * (Cormode & Muthukrishnan 2005).
  *
  * Unlike Misra–Gries (whose counter VALUES depend on merge order,
  * so only its key set is exposed), the CMS merge is an elementwise
  * sum — commutative and associative — so the whole sketch is
  * deterministic on any cluster shape and its estimates are directly
  * oracle-checkable. Partials are one bounded long-array per
  * partition (ObjectHashAggregate); nothing shuffles but the grids.
  *
  * The row hash is the first 16 md5 bits of "j:item" mod width — the
  * same value `Dedup.hash16Expr` produces in Spark SQL and DuckDB
  * SQL, so the engine probe, the sketch build, and the oracle all
  * address identical cells.
  */
final class CountMin(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  // the cell hash is 16 bits: any width beyond 2^16 would silently
  // leave counters unreachable (and widths just below it take a
  // non-uniform modulo bias) — reject instead of degrading
  require(depth >= 1, s"depth=$depth must be >= 1")
  require(width >= 1 && width <= 65536,
    s"width=$width outside [1, 65536] (16-bit cell hash)")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], w: String): Array[Long] = {
    var j = 0
    while (j < depth) {
      buf(j * width + CountMin.cell(j, w, width)) += 1L
      j += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    buf.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CountMin {
  /** First 16 bits of md5("j:w") mod width — bit-identical to the
    * portable nibble expression over `concat(j, ':', w)` in both SQL
    * dialects (first 4 hex chars = first 2 digest bytes, big-endian).
    */
  private[graft] def cell(j: Int, w: String, width: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"$j:$w".getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % width
  }

  /** `cm_sketch(w)` — the flattened depth×width counter grid. */
  def cm_sketch(depth: Int, width: Int)(w: Column): Column =
    udaf(new CountMin(depth, width), Encoders.STRING)(w)
}
