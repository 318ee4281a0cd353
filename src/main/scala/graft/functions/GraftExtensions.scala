package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native deployment hook: register graft's codegen expressions
  * through `SparkSessionExtensions`, so any session created with
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`) has `dot_product` and
  * `cosine_sim` as first-class SQL functions — no per-session
  * registration call, works from pure SQL (thriftserver, notebooks).
  * This is preference tier (c) plumbing from the build brief applied
  * where it genuinely belongs: function injection, not plan surgery
  * (every operator here composes from standard plans, so no custom
  * Rule/Strategy is warranted).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, make: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => make(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$name expects exactly 2 arguments, got ${exprs.length}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      binary("dot_product", DotProduct.apply)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      binary("cosine_sim", CosineSim.apply)))
  }
}
