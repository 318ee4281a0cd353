package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expressions for embedding math (SURVEY.md §2.9 X2).
  *
  * The composable form (`zip_with` + `aggregate`) works but Spark
  * evaluates higher-order functions interpreted, per element, with a
  * lambda variable per step. A brute-force ANN pass at 100 TB runs
  * the dot product N·Q times — worth a real codegen'd kernel: a tight
  * primitive loop over the two ArrayData buffers, no boxing, no
  * lambda dispatch. This is preference tier (b) from the build brief:
  * custom Expression, not a UDF (still codegen, null-safe, columnar
  * inputs).
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  // Nullable regardless of child nullability: a dimension mismatch
  // between the two arrays yields null at runtime.
  override def nullable: Boolean = true

  /** A null *element* nullifies the whole product (matching Spark
    * arithmetic conventions and DuckDB's list_dot_product) — reading
    * it as 0.0 would silently corrupt similarity scores. A dimension
    * mismatch also yields null: truncating to the shorter array would
    * mask corrupt embeddings with plausible-looking scores (DuckDB's
    * list_dot_product errors on unequal lengths).
    */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    if (mayHaveNullElems) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (isFloat(left)) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (isFloat(right)) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    } else {
      if (isFloat(left) && isFloat(right)) {
        while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i); i += 1 }
      } else if (isFloat(left)) {
        while (i < n) { acc += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
      } else if (isFloat(right)) {
        while (i < n) { acc += x.getDouble(i) * y.getFloat(i); i += 1 }
      } else {
        while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val lGet = if (isFloat(left)) s"(double) $x.getFloat(%I%)"
        else s"$x.getDouble(%I%)"
      val rGet = if (isFloat(right)) s"(double) $y.getFloat(%I%)"
        else s"$y.getDouble(%I%)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullElemCheck = if (mayHaveNullElems)
        s"""if ($x.isNullAt($i) || $y.isNullAt($i)) {
           |    ${ev.isNull} = true; break;
           |  }""".stripMargin
      else ""
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $acc += ${lGet.replace("%I%", i)} * ${rGet.replace("%I%", i)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: dot(a,b) / (‖a‖·‖b‖) in ONE traversal of
  * the two arrays — the composed form (three DotProducts) walks each
  * buffer three times; in a brute-force ANN pass the similarity
  * kernel runs N·Q times, so the fusion is a direct 3× cut in array
  * reads. Accumulation order per component matches the composed form
  * exactly (dot, ‖a‖², ‖b‖² each accumulate independently in index
  * order), so results are bit-identical and the DuckDB oracles are
  * unaffected. Null element or dimension mismatch → null, zero
  * norm → null (0/0), matching the composed form's semantics.
  */
final case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elemOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val lf = isFloat(left)
    val rf = isFloat(right)
    val checkNulls = mayHaveNullElems
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val lGet = if (isFloat(left)) s"(double) $x.getFloat(%I%)"
        else s"$x.getDouble(%I%)"
      val rGet = if (isFloat(right)) s"(double) $y.getFloat(%I%)"
        else s"$y.getDouble(%I%)"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      val nullElemCheck = if (mayHaveNullElems)
        s"""if ($x.isNullAt($i) || $y.isNullAt($i)) {
           |    ${ev.isNull} = true; break;
           |  }""".stripMargin
      else ""
      s"""
         |int $n = $x.numElements();
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    double $xv = ${lGet.replace("%I%", i)};
         |    double $yv = ${rGet.replace("%I%", i)};
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** dot_product(a, b): codegen'd Σ a_i·b_i over float/double arrays. */
  def dot_product(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(Bridge.toExpr(a), Bridge.toExpr(b)))

  /** cosine_similarity(a, b): fused single-traversal codegen kernel
    * (see [[CosineSim]]); bit-identical to the composed
    * dot/(√dot·√dot) form.
    */
  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.toColumn(CosineSim(Bridge.toExpr(a), Bridge.toExpr(b)))

  /** Register dot_product and cosine_sim for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
  }
}
