package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression family: Σ over the KEY INTERSECTION of two
  * sorted postings lists, of a per-match combine of the two long values —
  * `min(va, vb)` ([[SortedKeyMinSum]], weighted-Jaccard numerators) or
  * `va * vb` ([[SortedKeyDotSum]], integer dot products).
  *
  * Each side is a pair of co-indexed arrays (keys sorted ascending and
  * DISTINCT, values aligned) built ONCE per document in a projection;
  * the per-pair work is then a zero-allocation merge walk. This replaces
  * the exact-rescore shape `candidates ⋈ postings(a) ⋈ postings(b, key)`
  * — whose intermediate is |candidates| × |avg postings| rows through a
  * full shuffle — with |candidates| rows through two hash joins and a
  * codegen loop (the q134 sorted-array verify idiom, guide §2.3:
  * "shuffle keys and metadata instead of payloads").
  *
  * Arithmetic is EXACT and overflow is LOUD: sums and products go through
  * Math.addExact/multiplyExact, so a corpus that genuinely overflows
  * int64 fails like ANSI mode instead of silently wrapping — the same
  * failure contract as the integer-accumulation idiom it replaces.
  */
abstract class SortedKeyWeightSumBase extends QuaternaryExpression {
  def keysA: Expression
  def valsA: Expression
  def keysB: Expression
  def valsB: Expression

  /** Combine one matched pair of values (exact, throws on overflow). */
  protected def combine(va: Long, vb: Long): Long
  /** Java source for the combine, over vars `va`/`vb`. */
  protected def combineCode(va: String, vb: String): String

  override def first: Expression = keysA
  override def second: Expression = valsA
  override def third: Expression = keysB
  override def fourth: Expression = valsB

  override def dataType: DataType = LongType
  override def nullable: Boolean =
    children.exists(_.nullable)

  private lazy val keyIsLong: Boolean = keysA.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (keysA.dataType, valsA.dataType, keysB.dataType, valsB.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
            ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(LongType, _),
            ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ka, va, kb, vb) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string|bigint> keys, array<bigint> " +
          s"values) × 2 with matching key types, got " +
          s"${ka.simpleString(10)}, ${va.simpleString(10)}, " +
          s"${kb.simpleString(10)}, ${vb.simpleString(10)}")
    }

  override def nullSafeEval(ka: Any, va: Any, kb: Any, vb: Any): Any = {
    val aK = ka.asInstanceOf[ArrayData]; val aV = va.asInstanceOf[ArrayData]
    val bK = kb.asInstanceOf[ArrayData]; val bV = vb.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var s = 0L
    val an = aK.numElements(); val bn = bK.numElements()
    while (i < an && j < bn) {
      val c =
        if (keyIsLong) java.lang.Long.compare(aK.getLong(i), bK.getLong(j))
        else aK.getUTF8String(i).compareTo(bK.getUTF8String(j))
      if (c == 0) {
        s = Math.addExact(s, combine(aV.getLong(i), bV.getLong(j)))
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (ak, av, bk, bv) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      val cmp =
        if (keyIsLong)
          s"int $c = Long.compare($ak.getLong($i), $bk.getLong($j));"
        else
          s"int $c = $ak.getUTF8String($i).compareTo($bk.getUTF8String($j));"
      s"""
         |int $i = 0; int $j = 0; long $s = 0L;
         |while ($i < $ak.numElements() && $j < $bk.numElements()) {
         |  $cmp
         |  if ($c == 0) {
         |    long $va = $av.getLong($i); long $vb = $bv.getLong($j);
         |    $s = Math.addExact($s, ${combineCode(va, vb)});
         |    $i++; $j++;
         |  } else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ min(va, vb) over matching keys — exact weighted-Jaccard numerator. */
@ExpressionDescription(
  usage = "sorted_key_min_sum(ka, va, kb, vb) - sum of min(va, vb) over the sorted-key intersection")
case class SortedKeyMinSum(keysA: Expression, valsA: Expression,
    keysB: Expression, valsB: Expression) extends SortedKeyWeightSumBase {
  override def prettyName: String = "sorted_key_min_sum"
  override protected def combine(va: Long, vb: Long): Long = math.min(va, vb)
  override protected def combineCode(va: String, vb: String): String =
    s"Math.min($va, $vb)"
  override protected def withNewChildrenInternal(first: Expression,
      second: Expression, third: Expression, fourth: Expression)
      : SortedKeyMinSum =
    copy(keysA = first, valsA = second, keysB = third, valsB = fourth)
}

/** Σ va·vb over matching keys — exact integer dot product (throws on
  * int64 overflow, like ANSI arithmetic). */
@ExpressionDescription(
  usage = "sorted_key_dot_sum(ka, va, kb, vb) - sum of va*vb over the sorted-key intersection")
case class SortedKeyDotSum(keysA: Expression, valsA: Expression,
    keysB: Expression, valsB: Expression) extends SortedKeyWeightSumBase {
  override def prettyName: String = "sorted_key_dot_sum"
  override protected def combine(va: Long, vb: Long): Long =
    Math.multiplyExact(va, vb)
  override protected def combineCode(va: String, vb: String): String =
    s"Math.multiplyExact($va, $vb)"
  override protected def withNewChildrenInternal(first: Expression,
      second: Expression, third: Expression, fourth: Expression)
      : SortedKeyDotSum =
    copy(keysA = first, valsA = second, keysB = third, valsB = fourth)
}

object SortedKeyWeightSum {
  def sortedKeyMinSum(ka: Column, va: Column, kb: Column, vb: Column)
      : Column =
    ColumnBridge.column(SortedKeyMinSum(
      ColumnBridge.expression(ka), ColumnBridge.expression(va),
      ColumnBridge.expression(kb), ColumnBridge.expression(vb)))

  def sortedKeyDotSum(ka: Column, va: Column, kb: Column, vb: Column)
      : Column =
    ColumnBridge.column(SortedKeyDotSum(
      ColumnBridge.expression(ka), ColumnBridge.expression(va),
      ColumnBridge.expression(kb), ColumnBridge.expression(vb)))
}
