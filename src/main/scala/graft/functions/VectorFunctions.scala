package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns.
  *
  * All arithmetic is double-precision (inputs upcast once) so results are
  * bit-comparable with the DuckDB oracle's DOUBLE[] computations.
  *
  * [[cosine]] is the native fused-loop Catalyst expression
  * ([[CosineSimilarity]]); the higher-order-function formulation is kept as
  * [[cosineHof]] — it computes bit-identical results (same accumulation
  * order) and serves as the spec reference, but lambda expressions don't
  * whole-stage-codegen and walk the arrays three times, which on ANN cross
  * joins is the hot path.
  */
object VectorFunctions {

  /** Upcast an array<float> column to array<double>. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Inner product (native fused-loop expression, [[DotProduct]]). */
  def dot(a: Column, b: Column): Column = DotProduct.dotProduct(a, b)

  /** Higher-order-function dot — the spec reference for [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, p) => s + p)

  def norm2(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, x) => s + x))

  /** Cosine similarity (native expression); callers pass already-upcast
    * columns. Null (not a DIVIDE_BY_ZERO abort under ANSI mode) for zero
    * vectors. */
  def cosine(a: Column, b: Column): Column =
    CosineSimilarity.cosineSimilarity(a, b)

  /** Higher-order-function cosine — the spec reference for [[cosine]]. */
  def cosineHof(a: Column, b: Column): Column = {
    val den = norm2(a) * norm2(b)
    dotHof(a, b) / when(den =!= 0.0, den)
  }
}
