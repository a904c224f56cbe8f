package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Native point-frequency probe against a serialized
  * `org.apache.spark.util.sketch.CountMinSketch` — the counting sibling of
  * [[BloomMightContainLong]]: the sketch is built in ONE distributed pass
  * (mergeable per-partition sketches), and the probe rides inside
  * whole-stage codegen on the query side. Estimates OVERCOUNT only
  * (est ≥ true, est ≤ true + ε·N w.h.p.), which is exactly the guarantee
  * sketch-then-verify pipelines need: thresholding estimates yields a
  * provable SUPERSET of the truly-frequent keys, and an exact pass over
  * just that sliver restores exactness (q81's Misra-Gries plays the same
  * role for top-k; Count-Min adds point queries over an unbounded key
  * universe with fixed memory).
  *
  * Bytes travel with the expression; the sketch deserializes lazily once
  * per executor thread (same lifecycle as the bloom probe). */
@ExpressionDescription(
  usage = "cm_estimate_long(key) - Count-Min frequency estimate for the bigint key")
case class CmEstimateLong(child: Expression, cmBytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "cm_estimate_long"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${t.simpleString(10)}")
    }

  @transient private lazy val cm: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmBytes))

  /** Row-level probe (also the codegen entry point via addReferenceObj). */
  def est(v: Long): Long = cm.estimateCount(v)

  override def nullSafeEval(v: Any): Any = est(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("graftCm", this,
      classOf[CmEstimateLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.est($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmEstimateLong = copy(child = newChild)
}

object CountMinExpressions {
  /** Column API over a sketch serialized with `CountMinSketch.writeTo`. */
  def estimateLong(key: Column, cmBytes: Array[Byte]): Column =
    ColumnBridge.column(
      CmEstimateLong(ColumnBridge.expression(key), cmBytes))
}
