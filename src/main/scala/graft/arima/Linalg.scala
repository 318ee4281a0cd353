package graft.arima

/** Tiny dense linear-algebra helpers for the fitter's normal
  * equations (systems are at most ~(p+q+2)², i.e. tens of entries —
  * no external library warranted).
  */
object Linalg {

  /** Solve A·x = b in place (Gaussian elimination, partial pivoting).
    * A is row-major square; both inputs are clobbered.
    */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col = 0
    while (col < n) {
      var piv = col
      var best = math.abs(a(col)(col))
      var r = col + 1
      while (r < n) {
        val v = math.abs(a(r)(col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      require(best > 1e-12, s"singular system at column $col")
      if (piv != col) {
        val tmp = a(piv); a(piv) = a(col); a(col) = tmp
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      val d = a(col)(col)
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / d
        if (f != 0.0) {
          var c = col
          while (c < n) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var acc = b(i)
      var j = i + 1
      while (j < n) { acc -= a(i)(j) * x(j); j += 1 }
      x(i) = acc / a(i)(i)
      i -= 1
    }
    x
  }
}
