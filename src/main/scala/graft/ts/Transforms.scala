package graft.ts

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Series transforms as Column expressions (codegen'd, no UDF).
  *
  * Box–Cox pair — reference `py_handlers/utils.py:10-37`: the forward
  * transform is used ahead of fitting to stabilize variance; the
  * inverse (`inv_box_cox`, DEAD CODE in the reference — never called)
  * is implemented here so the pair is complete and a forecast made on
  * the transformed scale can be mapped back.
  */
object Transforms {

  /** y = ln x when λ = 0, else (x^λ − 1)/λ. Domain x > 0. */
  def boxCox(x: Column, lambda: Double): Column =
    if (lambda == 0.0) log(x)
    else (pow(x, lit(lambda)) - lit(1.0)) / lit(lambda)

  /** x = e^y when λ = 0, else (λy + 1)^(1/λ) — inverse of [[boxCox]]. */
  def invBoxCox(y: Column, lambda: Double): Column =
    if (lambda == 0.0) exp(y)
    else pow(y * lit(lambda) + lit(1.0), lit(1.0 / lambda))
}
