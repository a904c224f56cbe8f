package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression — Spark ships
  * levenshtein but no Jaro-Winkler, and the UDF alternative would both
  * break whole-stage codegen and allocate per row on the fuzzy-join hot
  * path. Semantics follow the standard algorithm (Winkler '90): Jaro
  * similarity (match window ⌊max(|a|,|b|)/2⌋−1, transpositions halved)
  * plus the common-prefix boost min(4, prefix)·0.1·(1−jaro) applied only
  * when jaro exceeds 0.7 — verified case-by-case against DuckDB's
  * independent implementation (the q183 oracle engine), including its
  * empty-string convention (either side empty → 0.0) and the
  * boost-threshold edge (jaro ≤ 0.7 stays unboosted). */
@ExpressionDescription(
  usage = "jaro_winkler(a, b) - Jaro-Winkler similarity of two strings in [0, 1]")
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  /** Row-level kernel (also the codegen entry point via addReferenceObj). */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars of s1 vs matched chars of s2, in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
      s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("graftJw", this,
      classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.sim($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object StringSimilarityExpressions {
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
