package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-row MinHash/SimHash kernels.
  *
  * The exploded formulation of MinHash (one row per shingle, a window for
  * the 3-gram leads, then a 32-way min aggregate) shuffles |corpus| × ~|doc
  * tokens| rows to compute what is a per-document pure function. At 100 TB
  * that shuffle dwarfs the LSH banding shuffle it feeds. These kernels
  * compute the signature, the sorted distinct shingle set, and the SimHash
  * signature in one pass over the token array — per-row map work inside
  * whole-stage codegen, no shuffle at all.
  *
  * Hash construction is IDENTICAL to the exploded pipeline (and spec-checked
  * against it): token hash = pmod(xxhash64(tok), 1e9+7) with Spark's seed
  * 42; 3-gram shingle = pmod(h0*961 + h1*31 + h2, 1e9+7) over full trigrams
  * (docs shorter than 3 tokens fall back to trailing-zero mixes so no doc is
  * left without a signature); minhash family i = min over shingles of
  * (s*a_i + b_i) mod (2^61-1). All operands are positive and bounded so
  * plain Java `%`/`*` can never overflow (max product ≈ 1.3e18 < 2^63).
  */
object MinHashKernel {
  val HashDomain = 1000000007L
  val MinhashPrime = 2305843009213693951L // 2^61 - 1 (shingle-mix prime)
  val NumHashes = 32
  val XxSeed = 42L // Spark's xxhash64() seed

  // Affine family coefficients — mirrored by Dedup.hashFamilies. Each
  // family is a TRUE permutation of Z_{1e9+7}: v = (a·s + b) mod p with
  // a drawn pseudo-randomly across [1, p−1] (Knuth multiplicative
  // constants), so a·s wraps the modulus ~a times across the shingle
  // range and the 32 argmins decorrelate. The original family
  // (a_i = 2i + 1.23e9 mod 2^61−1) NEVER wrapped its modulus — products
  // stayed below 2^61 — so every family shared one argmin and the
  // signature was one permutation repeated 32×; q271's calibration
  // caught it. Products stay < 2^63 (a, s < 2^30), so Spark-side ANSI
  // mirrors can never overflow either.
  private val As: Array[Long] =
    Array.tabulate(NumHashes)(i =>
      java.lang.Math.floorMod(2654435761L * (i + 1) + 1013904223L,
        HashDomain - 1) + 1)
  private val Bs: Array[Long] =
    Array.tabulate(NumHashes)(i =>
      java.lang.Math.floorMod(40503L * 2654435761L * (i + 1) + 97531L,
        HashDomain))

  /** 3-gram shingle-hash multiset of a token array (order-preserving). */
  def shingleHashes(tokens: ArrayData): Array[Long] = {
    val n = tokens.numElements()
    if (n == 0) return Array.emptyLongArray
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = XXH64.hashUTF8String(tokens.getUTF8String(i), XxSeed)
      h(i) = java.lang.Math.floorMod(x, HashDomain)
      i += 1
    }
    if (n >= 3) {
      val out = new Array[Long](n - 2)
      i = 0
      while (i < n - 2) {
        out(i) = (h(i) * 961L + h(i + 1) * 31L + h(i + 2)) % HashDomain
        i += 1
      }
      out
    } else {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        val h1 = if (i + 1 < n) h(i + 1) else 0L
        val h2 = if (i + 2 < n) h(i + 2) else 0L
        out(i) = (h(i) * 961L + h1 * 31L + h2) % HashDomain
        i += 1
      }
      out
    }
  }

  /** 32-long MinHash signature; null for tokenless docs (mirroring the
    * exploded pipeline, where such docs simply produce no rows). */
  def signature(tokens: ArrayData): ArrayData = {
    val sh = shingleHashes(tokens)
    if (sh.isEmpty) return null
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val s = sh(i)
      var j = 0
      while (j < NumHashes) {
        val v = (s * As(j) + Bs(j)) % HashDomain
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Sorted distinct shingle-hash set (the exact-verification feature
    * space); null for tokenless docs. */
  def sortedShingleSet(tokens: ArrayData): ArrayData = {
    val sh = shingleHashes(tokens)
    if (sh.isEmpty) return null
    java.util.Arrays.sort(sh)
    var w = 0; var i = 0
    while (i < sh.length) {
      if (i == 0 || sh(i) != sh(i - 1)) { sh(w) = sh(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(sh, w))
  }

  /** 64-bit SimHash over a token array: per-token xxhash64, ±1 per bit,
    * sign → bit. Callers pass DISTINCT tokens for set semantics. */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val c = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(tokens.getUTF8String(i), XxSeed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) c(j) += 1 else c(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (c(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** Common shape for the token-array kernels: input array<string>, codegen
  * delegates to a static MinHashKernel method (the loop runs as compiled
  * JVM code inside the whole-stage-generated class — one call, no
  * interpreted expression tree). */
abstract class TokenKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${t.simpleString(10)}")
    }
}

@ExpressionDescription(
  usage = "minhash_signature(tokens) - 32-hash MinHash signature (array<bigint>) of a token array; null if empty")
case class MinHashSignature(child: Expression) extends TokenKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(t: Any): Any =
    MinHashKernel.signature(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.functions.MinHashKernel.signature($a);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
}

@ExpressionDescription(
  usage = "shingle_set(tokens) - sorted distinct 3-gram shingle hashes (array<bigint>) of a token array; null if empty")
case class ShingleSet(child: Expression) extends TokenKernelExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"

  override def nullSafeEval(t: Any): Any =
    MinHashKernel.sortedShingleSet(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.functions.MinHashKernel.sortedShingleSet($a);
      |${ev.isNull} = ${ev.value} == null;
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleSet = copy(child = newChild)
}

@ExpressionDescription(
  usage = "simhash64(tokens) - 64-bit SimHash signature (bigint) of a (distinct) token array")
case class SimHash64(child: Expression) extends TokenKernelExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(t: Any): Any =
    MinHashKernel.simhash64(t.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.MinHashKernel.simhash64($a)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

object MinHashExpressions {
  def minhashSignature(tokens: Column): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(tokens)))
  def shingleSet(tokens: Column): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(tokens)))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
