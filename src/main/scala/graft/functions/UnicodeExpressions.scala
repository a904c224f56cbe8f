package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical-composition normalization (NFC) as a native codegen
  * expression — the first cleaning step of any multilingual training-data
  * pipeline (dedup keys, tokenizers, and exact-match filters all assume
  * one byte sequence per canonically-equal string). Spark ships no
  * normalizer, and a UDF here would break whole-stage codegen on the
  * scan-side projection where cleaning runs. Semantics are exactly
  * `java.text.Normalizer.normalize(s, NFC)` (Unicode UAX #15 canonical
  * decomposition + composition), verified cross-engine against DuckDB's
  * independent `nfc_normalize` in the q206 oracle. */
object UnicodeKernel {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan for the common
    // already-composed case — avoids allocating for ASCII-heavy corpora
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

@ExpressionDescription(
  usage = "nfc(str) - canonical-composition (NFC) normalization of str")
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.simpleString(10)}")
    }

  override def nullSafeEval(v: Any): Any =
    UnicodeKernel.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.UnicodeKernel.nfc($a)")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(child = newChild)
}

object UnicodeExpressions {
  def nfc(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))
}
