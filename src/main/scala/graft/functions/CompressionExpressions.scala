package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string — the compression-ratio quality
  * signal corpus pipelines use to flag repetitive/boilerplate documents
  * (highly compressible text ⇒ templated or repeated content; the signal
  * appears in most public pretraining-cleaning recipes alongside the
  * Gopher rules of q75). Computed per row inside codegen with a
  * per-evaluation Deflater (java.util.zip, BEST_SPEED — the ratio signal
  * is insensitive to the level, and speed is what matters in a scan).
  * Deterministic for a given JVM zlib, which is what the spec pins;
  * there is no DuckDB equivalent, so the consuming query is rows-only. */
@ExpressionDescription(
  usage = "deflate_size(s) - byte length of DEFLATE(UTF-8(s))")
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "deflate_size"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string, got ${t.simpleString(10)}")
    }

  /** Row-level kernel (also the codegen entry point via addReferenceObj). */
  def sz(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new Deflater(Deflater.BEST_SPEED)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](math.max(64, in.length + 64))
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override def nullSafeEval(v: Any): Any = sz(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("graftDeflate", this,
      classOf[DeflateSize].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sz($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): DeflateSize = copy(child = newChild)
}

object CompressionExpressions {
  def deflateSize(s: Column): Column =
    ColumnBridge.column(DeflateSize(ColumnBridge.expression(s)))
}
