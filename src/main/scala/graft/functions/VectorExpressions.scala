package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two `array<double>`
  * vectors in a single fused loop (dot product and both norms accumulated
  * together), with `doGenCode` so the surrounding join stays inside
  * whole-stage codegen.
  *
  * This replaces the higher-order-function formulation
  * (`aggregate(zip_with(a,b,*))/...`): lambda expressions don't participate
  * in whole-stage codegen and get no common-subexpression elimination, so
  * the HOF cosine materializes an intermediate zipped array per pair and
  * walks each input three times. On the ANN cross joins (|corpus| × |queries|
  * evaluations) the fused loop is the difference between the similarity
  * kernel being memory-bound and allocation-bound.
  *
  * Numerics are kept bit-identical to the HOF version (and to DuckDB's
  * `list_cosine_similarity` over DOUBLE[]): sequential left-to-right
  * accumulation, `sqrt(na)*sqrt(nb)` denominator, null (not an ANSI
  * divide-by-zero error) for zero-norm vectors.
  */
@ExpressionDescription(
  usage = "cosine_similarity(a, b) - cosine similarity of two array<double> vectors; null if either norm is zero")
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // mismatched lengths yield null, matching the HOF form (zip_with pads
    // the shorter side with null → null product → null sum) — never a
    // silently-truncated "similarity" over the common prefix
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) null else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val den = ctx.freshName("den")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = $a.getDouble($i); double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  double $den = Math.sqrt($na) * Math.sqrt($nb);
         |  if ($den == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $den; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column API; both inputs must already be `array<double>`. */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native dot product of two `array<double>` vectors — same fused-loop /
  * codegen treatment as [[CosineSimilarity]], for the kernels that want the
  * raw inner product (PQ codebook assignment and ADC scoring, LSH
  * hyperplane projections). The HOF formulation
  * (`aggregate(zip_with(a,b,*))`) allocates a zipped array per evaluation
  * and blocks whole-stage codegen — measured 3-4× slower on the
  * |subvectors|×|centroids| assignment joins. Null on length mismatch,
  * matching zip_with's null-padding semantics. */
@ExpressionDescription(
  usage = "dot_product(a, b) - inner product of two array<double> vectors; null on length mismatch")
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column API; both inputs must already be `array<double>`. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
