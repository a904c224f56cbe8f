package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL mergeable quantile sketch (Karnin–Lang–Liberty, FOCS'16) over
  * doubles. State is a ladder of buffers: items in level h carry weight
  * 2^h; when a level overflows its capacity (k at the top, decaying by
  * (2/3)^depth below it, floor 8), it is sorted and every other item is
  * promoted to the level above — halving the count, doubling the weight,
  * and perturbing any item's rank by at most the level weight. Total state
  * is O(k log(n/k)) items regardless of input size, and sketches merge by
  * concatenating ladders and re-compacting — the shuffle carries one small
  * summary per group per mapper, which is what a grouped quantile needs to
  * cost at 100 TB.
  *
  * The compaction offset alternates deterministically per level (the
  * classic derandomization) so results are reproducible run-to-run; the
  * rank-error guarantee (ε ≈ O(1/k) of n) is what the QuantileSketchSpec
  * pins, and what [[graft.operators.Advanced.sketchQuantiles]] converts
  * into EXACT oracle-checkable quantiles via a verified band refinement.
  *
  * The reference has no aggregation at all beyond a global count
  * (SURVEY §2.2); this belongs to the mandated extension surface.
  */
final class KllSummary(val k: Int) {
  // levels(h): items of weight 2^h, unsorted between compactions
  val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  var n: Long = 0L
  // per-level alternating compaction parity (derandomized offset);
  // serialized with the ladder so resumed buffers keep alternating
  var parity: Long = 0L

  private def capacity(h: Int): Int = {
    val depth = levels.length - 1 - h
    math.max(math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt, 8)
  }

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1
    compress()
  }

  def merge(other: KllSummary): Unit = {
    while (levels.length < other.levels.length)
      levels += ArrayBuffer.empty[Double]
    var h = 0
    while (h < other.levels.length) {
      levels(h) ++= other.levels(h)
      h += 1
    }
    n += other.n
    compress()
  }

  private def compress(): Unit = {
    var h = 0
    while (h < levels.length) {
      if (levels(h).length > capacity(h)) {
        if (h + 1 == levels.length) levels += ArrayBuffer.empty[Double]
        val buf = levels(h)
        val sorted = buf.toArray
        java.util.Arrays.sort(sorted)
        val off = ((parity >> h) & 1L).toInt
        parity ^= 1L << h
        val up = levels(h + 1)
        buf.clear()
        // odd count: set one extreme aside (alternating end) BEFORE
        // pairing — promoting an odd count would inflate total weight;
        // pairing an even range conserves it exactly (M items of weight
        // 2^h become M/2 items of weight 2^(h+1))
        var b = 0
        var m = sorted.length
        if (m % 2 == 1) {
          if (off == 0) buf += sorted(m - 1)
          else { buf += sorted(0); b = 1 }
          m -= 1
        }
        var i = b + off
        while (i < b + m) { up += sorted(i); i += 2 }
      }
      h += 1
    }
  }

  /** (value, weight) pairs sorted by value; weights sum to n exactly. */
  def sortedItems(): (Array[Double], Array[Long]) = {
    val total = levels.map(_.length).sum
    val vs = new Array[Double](total)
    val ws = new Array[Long](total)
    var i = 0
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach { v => vs(i) = v; ws(i) = w; i += 1 }
      h += 1
    }
    val idx = (0 until total).sortBy(vs)
    (idx.map(vs).toArray, idx.map(ws).toArray)
  }

  def toBytes: Array[Byte] = {
    val size = 8 + 8 + 4 + levels.map(4 + _.length * 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putLong(n)
    bb.putLong(parity)
    bb.putInt(levels.length)
    levels.foreach { l =>
      bb.putInt(l.length)
      l.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object KllSummary {
  def fromBytes(k: Int, bytes: Array[Byte]): KllSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new KllSummary(k)
    s.n = bb.getLong
    s.parity = bb.getLong
    val nLevels = bb.getInt
    s.levels.clear()
    var h = 0
    while (h < nLevels) {
      val len = bb.getInt
      val l = new ArrayBuffer[Double](len)
      var i = 0
      while (i < len) { l += bb.getDouble; i += 1 }
      s.levels += l
      h += 1
    }
    s
  }

  val EntryType: StructType = StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("w", LongType, nullable = false)))

  /** Estimated value at 0-indexed rank r from a collected summary
    * (midpoint-weight rule: item i spans cumulative ranks
    * [cum − w, cum)). */
  def valueAtRank(vs: Array[Double], ws: Array[Long], r: Double): Double = {
    var cum = 0L
    var i = 0
    while (i < vs.length) {
      cum += ws(i)
      if (r < cum) return vs(i)
      i += 1
    }
    if (vs.isEmpty) Double.NaN else vs(vs.length - 1)
  }
}

@ExpressionDescription(
  usage = "kll_sketch(value, k) - mergeable KLL quantile summary as array<struct<v double, w bigint>> sorted by value; weights sum to the group count")
case class KllSketch(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSummary] {

  require(k >= 8, "kll_sketch requires k >= 8")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(KllSummary.EntryType, containsNull = false)
  override def prettyName: String = "kll_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires double, got ${t.simpleString(10)}")
    }

  override def createAggregationBuffer(): KllSummary = new KllSummary(k)

  override def update(buf: KllSummary, input: InternalRow): KllSummary = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllSummary, b: KllSummary): KllSummary = {
    a.merge(b); a
  }

  override def eval(buf: KllSummary): Any = {
    val (vs, ws) = buf.sortedItems()
    val out = new Array[Any](vs.length)
    var i = 0
    while (i < vs.length) { out(i) = InternalRow(vs(i), ws(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KllSummary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSummary =
    KllSummary.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : KllSketch = copy(child = c(0))
}

object KllSketch {
  /** Column API: KLL quantile summary of a double column. */
  def kllSketch(value: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      KllSketch(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(value), k)
        .toAggregateExpression())
}
