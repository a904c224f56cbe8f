package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a serialized
  * `org.apache.spark.util.sketch.BloomFilter` — the explicit form of the
  * runtime bloom filter Spark's optimizer injects for shuffle joins
  * (spark.sql.optimizer.runtime.bloomFilter.*): the small side's key set
  * is sketched once, and the probe rides INSIDE whole-stage codegen on
  * the big side's scan, before any exchange. May return false positives
  * (callers follow with an exact join); never false negatives.
  *
  * The filter bytes travel with the expression (plans are serialized to
  * executors anyway); the sketch deserializes lazily once per executor
  * thread, and codegen calls [[test]] through a reference object rather
  * than re-reading bytes per row. */
@ExpressionDescription(
  usage = "bloom_might_contain_long(key) - true if the bundled bloom filter may contain the bigint key")
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "bloom_might_contain_long"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${t.simpleString(10)}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Row-level probe (also the codegen entry point via addReferenceObj). */
  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = test(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this,
      classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.test($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}

object BloomFilterExpressions {
  /** Column API over a bloom filter serialized with `BloomFilter.writeTo`. */
  def mightContainLong(key: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(key), bloomBytes))
}
