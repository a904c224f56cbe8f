package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: |A ∩ B| for two SORTED, DISTINCT arrays of
  * strings or longs, via a merge walk — O(|A|+|B|) with zero allocation.
  *
  * This is the set-similarity hot path: `size(array_intersect(a, b))`
  * allocates a hash set and a result array per evaluated pair, which on an
  * all-pairs or LSH-candidate join means millions of discarded allocations.
  * Sorting is hoisted to once per document (array_sort in the projection);
  * the per-pair work is then pure comparison. Implements `doGenCode` so the
  * surrounding join/projection stays inside whole-stage codegen.
  */
@ExpressionDescription(
  usage = "sorted_intersect_size(a, b) - intersection size of two sorted distinct arrays (string or bigint elements)")
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  /** Analysis-time validation (the function is SQL-registered, so arbitrary
    * argument types reach it): both sides must be arrays of the SAME
    * supported element type, or the getLong/getUTF8String accessors below
    * would misread the array bytes at runtime. */
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> or two array<bigint> " +
          s"arguments, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  private lazy val isLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    val an = a.numElements(); val bn = b.numElements()
    if (isLong) {
      while (i < an && j < bn) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      while (i < an && j < bn) {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val cmp =
        if (isLong)
          s"int $c = Long.compare($a.getLong($i), $b.getLong($j));"
        else
          s"int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));"
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  $cmp
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column API: both inputs must be sorted ascending and distinct
    * (apply `array_sort(array_distinct(...))` upstream, once per row). */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
