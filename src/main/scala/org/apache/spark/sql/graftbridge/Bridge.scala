package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 moved `Column.expr` behind
  * `private[sql] classic.ExpressionUtils`; third-party Catalyst
  * extensions conventionally re-export it from inside the
  * org.apache.spark.sql namespace (same technique used by Delta,
  * Sedona, etc. for their native expressions).
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
