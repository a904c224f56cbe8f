package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom typed-imperative AGGREGATE functions — the partial-aggregation
  * counterpart of the scalar kernels. Both exist to make map-side combine
  * do the heavy lifting, so the shuffle carries one small buffer per group
  * per mapper instead of one row per input:
  *
  *  - [[TopKByScore]]: bounded top-k heap. The ranking-window formulation
  *    of per-key top-k shuffles EVERY scored row and sorts each partition;
  *    the heap aggregate shuffles ≤k entries per (group, mapper). For ANN
  *    over a 100 TB corpus that is the difference between shuffling
  *    |corpus|·|queries| candidate rows and |queries|·mappers·k.
  *  - [[VectorSum]]: element-wise Σ over `array<double>`. The explode
  *    formulation of centroid recompute shuffles |rows|·dim (row, pos,
  *    value) triples; this buffers one dim-length vector per group per
  *    mapper.
  */
object AggregateKernels {

  /** Column API: top-k (score desc, id asc) pairs per group as a sorted
    * array<struct<score,id>>. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score),
        ColumnBridge.expression(id), k).toAggregateExpression())

  /** Column API: element-wise sum of array<double> rows (null rows
    * ignored; null when the group has no non-null rows). */
  def vectorSum(v: Column): Column =
    ColumnBridge.column(
      VectorSum(ColumnBridge.expression(v)).toAggregateExpression())

  /** Column API: Misra-Gries heavy-hitter summary (≤k candidates with
    * estimated counts; any item with true frequency > n/(k+1) is
    * guaranteed present). */
  def misraGries(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(item), k).toAggregateExpression())

  /** Column API: weighted isotonic (nondecreasing) fit of binary
    * outcomes over a fixed bin grid, as sorted
    * array<struct<bin,n,pos,rate_iso>>. */
  def isotonicPava(bin: Column, y: Column, bins: Int): Column =
    ColumnBridge.column(
      IsotonicPava(ColumnBridge.expression(bin),
        ColumnBridge.expression(y), bins).toAggregateExpression())

  /** Column API: exact scaled second-moment matrix of array<double>
    * rows — all dim² cells of Σ floor(xᵢ·xⱼ·1e9), carried as (hi, lo)
    * long pairs, in ONE pass with no Generate. */
  def momentMatrix(v: Column): Column =
    ColumnBridge.column(
      MomentMatrix(ColumnBridge.expression(v)).toAggregateExpression())

  /** Column API: the long id whose (score desc, id asc) is maximal —
    * exactly `max_by(id, struct(score, -id))`, but HASH-aggregable.
    * max_by's single STRUCT buffer slot is an immutable buffer type,
    * which silently demotes the whole aggregate from HashAggregate to
    * SortAggregateExec — sorting the entire pre-aggregation stream
    * through UnsafeExternalSorter per task. On the broadcast-argmax
    * shape every ANN/semdedup assignment uses (corpus × centroids
    * crossJoin into groupBy(vec_id)) that is an n·|cents|-row sort with
    * embedding arrays riding every row; the round-10 ×128 mega-cluster
    * probe caught its task threads thrashing in sorter page allocation,
    * and run-to-run variance of the same probe spanned 2-8× from the
    * sort's spill behavior. [[ArgMaxTieMinId]] keeps two flat primitive
    * buffer slots (double, long) → HashAggregate with map-side partial
    * combine, and callers re-attach any payload columns with a narrow
    * equi-join instead of `first(array)` (array buffers cause the same
    * demotion). Double comparisons are Catalyst's, which order NaN
    * largest and NaN = NaN — the struct ordering's total order. */
  def argMaxTieMinId(score: Column, id: Column): Column =
    ColumnBridge.column(
      ArgMaxTieMinId(ColumnBridge.expression(score),
        ColumnBridge.expression(id)).toAggregateExpression())
}

/** Misra-Gries frequent-items sketch over string items: at most k
  * (item, count) entries; an incoming miss on a full summary decrements
  * every counter (amortized O(1) — each decrement cancels a prior
  * increment). Merge per Agarwal et al., "Mergeable Summaries" (PODS'12):
  * sum counters, then subtract the (k+1)-largest and drop non-positives.
  * Guarantees after any merge tree: f(x) ≥ est(x) ≥ f(x) − n/(k+1), so
  * every item with f(x) > n/(k+1) is present — the candidate set is a
  * provable superset of the true heavy hitters, which is what lets q81
  * verify against an EXACT oracle. Shuffle cost: one ≤k-entry map per
  * group per mapper, independent of input size. */
@ExpressionDescription(
  usage = "misra_gries(item, k) - frequent-item candidates as array<struct<item string, est bigint>>")
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] {

  require(k > 0, "misra_gries requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(MisraGries.EntryType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.simpleString(10)}")
    }

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.toString)
    buf
  }

  override def merge(a: MGSummary, b: MGSummary): MGSummary = {
    a.absorb(b); a
  }

  override def eval(buf: MGSummary): Any = {
    val entries = buf.entries.toArray.sortBy { case (i, c) => (-c, i) }
    val out: Array[Any] = entries.map { case (i, c) =>
      InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(i), c): Any
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: MGSummary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MGSummary =
    MGSummary.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : MisraGries = copy(child = c(0))
}

object MisraGries {
  val EntryType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))
}

final class MGSummary(val k: Int) {
  val entries = scala.collection.mutable.HashMap.empty[String, Long]

  def offer(item: String): Unit = {
    entries.get(item) match {
      case Some(c) => entries(item) = c + 1L
      case None if entries.size < k => entries(item) = 1L
      case None =>
        // decrement-all: pair this arrival off against one prior
        // arrival of each tracked item
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        entries.mapValuesInPlace((_, c) => c - 1L)
        entries.foreach { case (i, c) => if (c <= 0) dead += i }
        dead.foreach(entries.remove)
    }
  }

  def absorb(other: MGSummary): Unit = {
    other.entries.foreach { case (i, c) =>
      entries(i) = entries.getOrElse(i, 0L) + c
    }
    if (entries.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives
      val counts = entries.values.toArray.sorted(Ordering[Long].reverse)
      val cut = counts(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      entries.mapValuesInPlace((_, c) => c - cut)
      entries.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(entries.remove)
    }
  }

  def toBytes: Array[Byte] = {
    val items = entries.toArray
    val itemBytes = items.map(_._1.getBytes("UTF-8"))
    val size = 4 + itemBytes.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(items.length)
    var i = 0
    while (i < items.length) {
      bb.putInt(itemBytes(i).length)
      bb.put(itemBytes(i))
      bb.putLong(items(i)._2)
      i += 1
    }
    bb.array()
  }
}

object MGSummary {
  def fromBytes(k: Int, bytes: Array[Byte]): MGSummary = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new MGSummary(k)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      s.entries(new String(b, "UTF-8")) = bb.getLong
      i += 1
    }
    s
  }
}

/** Bounded top-k aggregate: keeps the k largest (score, id) pairs by
  * (score desc, id asc) — a deterministic total order, so results are
  * reproducible and tie-stable across partitionings. Buffer is two parallel
  * arrays managed as a binary min-heap (root = current worst), O(log k)
  * per update, 16·k bytes serialized. */
@ExpressionDescription(
  usage = "topk_by_score(score, id, k) - k largest (score,id) pairs, score desc / id asc, as array<struct<score double, id bigint>>")
case class TopKByScore(
    scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "topk_by_score requires k > 0")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.EntryType, containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got " +
          s"${s.simpleString(10)}, ${i.simpleString(10)}")
    }

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = { a.absorb(b); a }

  override def eval(buf: TopKHeap): Any = {
    val (scores, ids) = buf.sortedDesc()
    val out = new Array[Any](scores.length)
    var i = 0
    while (i < scores.length) {
      out(i) = InternalRow(scores(i), ids(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKHeap): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : TopKByScore = copy(scoreExpr = c(0), idExpr = c(1))
}

object TopKByScore {
  val EntryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))
}

/** Min-heap of (score, id) under (score desc, id asc) priority: the root is
  * the WORST retained entry, evicted when a better one arrives. */
final class TopKHeap(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** true if (s1,i1) ranks WORSE than (s2,i2): lower score, or equal score
    * and higher id. NaN ranks strictly worst (a plain `<` comparator is
    * false for every NaN comparison, which would let a NaN entered while
    * filling the heap sit at the root and reject all later entries). */
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long)
      : Boolean = {
    val n1 = java.lang.Double.isNaN(s1)
    val n2 = java.lang.Double.isNaN(s2)
    if (n1 != n2) n1
    else if (!n1 && s1 < s2) true
    else if (!n1 && s1 > s2) false
    else i1 > i2
  }

  def offer(s: Double, id: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      var c = n - 1
      while (c > 0 && worse(scores(c), ids(c), scores((c - 1) / 2), ids((c - 1) / 2))) {
        swap(c, (c - 1) / 2); c = (c - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown()
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftDown(): Unit = {
    var p = 0
    var done = false
    while (!done) {
      val l = 2 * p + 1; val r = l + 1
      var w = p
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == p) done = true else { swap(p, w); p = w }
    }
  }

  def absorb(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.n) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries ordered best-first (score desc, id asc). */
  def sortedDesc(): (Array[Double], Array[Long]) = {
    val idx = (0 until n).sortBy(i => (-scores(i), ids(i)))
    (idx.map(scores).toArray, idx.map(ids).toArray)
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val h = new TopKHeap(k)
    val n = bb.getInt
    var i = 0
    while (i < n) { h.offer(bb.getDouble, bb.getLong); i += 1 }
    h
  }
}

/** Element-wise Σ over array<double> rows. Dimension is taken from the
  * first non-null row; mismatched rows raise (vector columns are
  * fixed-dim). */
@ExpressionDescription(
  usage = "vector_sum(v) - element-wise sum of array<double> rows")
case class VectorSum(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VectorSumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.simpleString(10)}")
    }

  override def createAggregationBuffer(): VectorSumBuffer =
    new VectorSumBuffer

  override def update(buf: VectorSumBuffer, input: InternalRow)
      : VectorSumBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: VectorSumBuffer, b: VectorSumBuffer)
      : VectorSumBuffer = { a.absorb(b); a }

  override def eval(buf: VectorSumBuffer): Any =
    if (buf.sums == null) null else new GenericArrayData(buf.sums)

  override def serialize(buf: VectorSumBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): VectorSumBuffer =
    VectorSumBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): VectorSum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : VectorSum = copy(child = c(0))
}

final class VectorSumBuffer {
  var sums: Array[Double] = _

  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    if (sums == null) sums = new Array[Double](n)
    else require(sums.length == n,
      s"vector_sum: dimension mismatch (${sums.length} vs $n)")
    var i = 0
    while (i < n) { sums(i) += v.getDouble(i); i += 1 }
  }

  def absorb(other: VectorSumBuffer): Unit =
    if (other.sums != null) {
      if (sums == null) sums = other.sums.clone()
      else {
        require(sums.length == other.sums.length,
          s"vector_sum: dimension mismatch (${sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < sums.length) { sums(i) += other.sums(i); i += 1 }
      }
    }

  def toBytes: Array[Byte] = {
    if (sums == null) return Array(0, 0, 0, 0)
    val bb = ByteBuffer.allocate(4 + 8 * sums.length)
    bb.putInt(sums.length)
    sums.foreach(bb.putDouble)
    bb.array()
  }
}

object VectorSumBuffer {
  def fromBytes(bytes: Array[Byte]): VectorSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new VectorSumBuffer
    val n = bb.getInt
    if (n > 0) {
      b.sums = new Array[Double](n)
      var i = 0
      while (i < n) { b.sums(i) = bb.getDouble; i += 1 }
    }
    b
  }
}

/** Weighted isotonic regression over a fixed bin grid via pool-adjacent-
  * violators (PAVA) — the calibration step behind reliability curves
  * (Platt/isotonic calibration of model scores). Input rows are
  * (bin, y∈{0,1}); the buffer is two fixed-size count arrays, so the
  * shuffle carries 2·B longs per group per mapper regardless of input
  * size (the map-side-combine contract of this file). The fitted value
  * of every pooled block is ONE double division of exact long counts,
  * and PAVA's output equals the minimax formula
  * max_{j≤i} min_{k≥i} avg(y[j..k]) over the same exact rationals —
  * double rounding is monotone, so the oracle's quadratic minimax over
  * single-division doubles is BIT-IDENTICAL to this sequential pool
  * (the q97-q100 algorithm-diverse-oracle pattern: a hash match proves
  * the algorithm, not just arithmetic). Block-merge comparisons use
  * BigInt cross-multiplication — exact at any scale, no float ties. */
@ExpressionDescription(
  usage = "isotonic_pava(bin, y) - nondecreasing fit per bin as array<struct<bin int, n bigint, pos bigint, rate_iso double>>")
case class IsotonicPava(left: Expression, right: Expression, bins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PavaBuffer] {

  require(bins > 0 && bins <= 4096, "isotonic_pava: 1 <= bins <= 4096")

  override def children: Seq[Expression] = Seq(left, right)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IsotonicPava.EntryType, containsNull = false)
  override def prettyName: String = "isotonic_pava"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int, bigint), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def createAggregationBuffer(): PavaBuffer = new PavaBuffer(bins)

  override def update(buf: PavaBuffer, input: InternalRow): PavaBuffer = {
    val b = left.eval(input)
    val y = right.eval(input)
    if (b != null && y != null)
      buf.add(b.asInstanceOf[Int], y.asInstanceOf[Long])
    buf
  }

  override def merge(a: PavaBuffer, b: PavaBuffer): PavaBuffer = {
    a.absorb(b); a
  }

  override def eval(buf: PavaBuffer): Any = {
    // collect nonempty bins in bin order, then sequential PAVA: push a
    // block per bin, merge backward while the nondecreasing constraint
    // is violated (exact BigInt cross-multiplication comparison)
    val idx = (0 until bins).filter(buf.n(_) > 0)
    val stack = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long)] // (first bin position in idx, pos, n)
    idx.indices.foreach { i =>
      var blk = (i, buf.pos(idx(i)), buf.n(idx(i)))
      while (stack.nonEmpty && {
        val t = stack.last
        // violation: rate(blk) < rate(top)  ⇔  pos_b·n_t < pos_t·n_b
        BigInt(blk._2) * t._3 < BigInt(t._2) * blk._3
      }) {
        val t = stack.remove(stack.length - 1)
        blk = (t._1, t._2 + blk._2, t._3 + blk._3)
      }
      stack += blk
    }
    // each block covers the idx positions [first, next block's first)
    val out = new Array[Any](idx.length)
    stack.indices.foreach { s =>
      val (first, p, nTot) = stack(s)
      val end = if (s + 1 < stack.length) stack(s + 1)._1 else idx.length
      val rate = p.toDouble / nTot.toDouble
      (first until end).foreach { u =>
        val b = idx(u)
        out(u) = InternalRow(b, buf.n(b), buf.pos(b), rate)
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: PavaBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): PavaBuffer =
    PavaBuffer.fromBytes(bins, bytes)

  override def withNewMutableAggBufferOffset(o: Int): IsotonicPava =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): IsotonicPava =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : IsotonicPava = copy(left = c(0), right = c(1))
}

object IsotonicPava {
  val EntryType: StructType = StructType(Seq(
    StructField("bin", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("rate_iso", DoubleType, nullable = false)))
}

final class PavaBuffer(val bins: Int) {
  val pos: Array[Long] = new Array[Long](bins)
  val n: Array[Long] = new Array[Long](bins)

  def add(bin: Int, y: Long): Unit = {
    require(bin >= 0 && bin < bins,
      s"isotonic_pava: bin $bin outside [0, $bins)")
    pos(bin) += y
    n(bin) += 1
  }

  def absorb(other: PavaBuffer): Unit = {
    var i = 0
    while (i < bins) { pos(i) += other.pos(i); n(i) += other.n(i); i += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * bins)
    var i = 0
    while (i < bins) { bb.putLong(pos(i)); bb.putLong(n(i)); i += 1 }
    bb.array()
  }
}

object PavaBuffer {
  def fromBytes(bins: Int, bytes: Array[Byte]): PavaBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new PavaBuffer(bins)
    var i = 0
    while (i < bins) { b.pos(i) = bb.getLong; b.n(i) = bb.getLong; i += 1 }
    b
  }
}

/** Exact scaled second-moment matrix over array<double> rows: every cell
  * (i, j) accumulates Σ floor(xᵢ·xⱼ·1e9) as an exact (hi, lo) long pair
  * (lo is carried into hi whenever |lo| reaches 1e9, so the pair never
  * overflows at ANY row count while hi·1e9 + lo stays the exact total).
  *
  * This replaces the outer-product explode formulation of the PCA
  * covariance pass (dim²·|rows| generated rows through a Generate + one
  * partial-aggregated shuffle — 200M rows at bench scale) with one
  * dim²-cell buffer per mapper: the scan does the same multiplications
  * in a tight JVM loop and the shuffle carries dim² longs per partition,
  * input-size-independent. Per-cell arithmetic mirrors the SQL path
  * bit-for-bit (same double multiply association, same floor, same
  * truncating div/mod), so swapping formulations cannot move a result.
  */
@ExpressionDescription(
  usage = "moment_matrix(v) - exact scaled second-moment matrix cells " +
    "of array<double> rows as array<struct<i,j,shi,slo,n>>")
case class MomentMatrix(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(new StructType()
    .add("i", IntegerType).add("j", IntegerType)
    .add("shi", LongType).add("slo", LongType).add("n", LongType),
    containsNull = false)
  override def prettyName: String = "moment_matrix"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${t.simpleString(10)}")
    }

  override def createAggregationBuffer(): MomentBuffer = new MomentBuffer

  override def update(buf: MomentBuffer, input: InternalRow)
      : MomentBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(a: MomentBuffer, b: MomentBuffer): MomentBuffer = {
    a.absorb(b); a
  }

  override def eval(buf: MomentBuffer): Any =
    if (buf.d == 0) null
    else {
      val cells = new Array[Any](buf.d * buf.d)
      var c = 0
      while (c < cells.length) {
        cells(c) = InternalRow(c / buf.d, c % buf.d,
          buf.shi(c), buf.slo(c), buf.n)
        c += 1
      }
      new GenericArrayData(cells)
    }

  override def serialize(buf: MomentBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MomentBuffer =
    MomentBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MomentMatrix =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MomentMatrix =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression])
      : MomentMatrix = copy(child = c(0))
}

final class MomentBuffer {
  import MomentBuffer.B
  var d: Int = 0
  var n: Long = 0L
  var shi: Array[Long] = _
  var slo: Array[Long] = _

  private def init(dim: Int): Unit = {
    d = dim; shi = new Array[Long](d * d); slo = new Array[Long](d * d)
  }

  @inline private def put(c: Int, t: Long): Unit = {
    shi(c) += t / B
    val s = slo(c) + t % B
    if (s >= B || s <= -B) { shi(c) += s / B; slo(c) = s % B }
    else slo(c) = s
  }

  def add(v: ArrayData): Unit = {
    val dim = v.numElements()
    // An empty array is a degenerate input, not a dimension: ignore it
    // entirely so it can neither throw (empty after non-empty) nor
    // leave a half-initialized buffer (d=0 with n>0) that a later
    // non-empty row would absorb into a miscounted n.
    if (dim == 0) return
    if (d == 0) init(dim)
    else require(dim == d,
      s"moment_matrix: dimension mismatch ($d vs $dim)")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = v.getDouble(i); i += 1 }
    n += 1
    var c = 0
    i = 0
    while (i < d) {
      val xi = x(i)
      var j = 0
      while (j < d) {
        // same association as the SQL path: (xᵢ·xⱼ)·1e9, then floor
        put(c, math.floor(xi * x(j) * 1e9).toLong)
        j += 1; c += 1
      }
      i += 1
    }
  }

  def absorb(o: MomentBuffer): Unit =
    if (o.d != 0) {
      if (d == 0) {
        init(o.d)
        System.arraycopy(o.shi, 0, shi, 0, shi.length)
        System.arraycopy(o.slo, 0, slo, 0, slo.length)
        n = o.n
      } else {
        require(d == o.d,
          s"moment_matrix: dimension mismatch ($d vs ${o.d})")
        n += o.n
        var c = 0
        while (c < shi.length) {
          shi(c) += o.shi(c)
          val s = slo(c) + o.slo(c)
          if (s >= B || s <= -B) { shi(c) += s / B; slo(c) = s % B }
          else slo(c) = s
          c += 1
        }
      }
    }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 + 16 * (if (d == 0) 0 else d * d))
    bb.putInt(d); bb.putLong(n)
    if (d != 0) {
      var c = 0
      while (c < shi.length) { bb.putLong(shi(c)); bb.putLong(slo(c)); c += 1 }
    }
    bb.array()
  }
}

object MomentBuffer {
  val B = 1000000000L

  def fromBytes(bytes: Array[Byte]): MomentBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new MomentBuffer
    val dim = bb.getInt
    val n = bb.getLong
    if (dim != 0) {
      b.d = dim; b.n = n
      b.shi = new Array[Long](dim * dim); b.slo = new Array[Long](dim * dim)
      var c = 0
      while (c < b.shi.length) { b.shi(c) = bb.getLong; b.slo(c) = bb.getLong; c += 1 }
    }
    b
  }
}

/** Hash-aggregable argmax with the (score desc, lowest id) tie-break —
  * see [[AggregateKernels.argMaxTieMinId]] for why this exists instead
  * of `max_by(id, struct(score, -id))`. Declarative with two flat
  * primitive buffer slots, so HashAggregateExec's mutable-buffer check
  * passes and the plan never demotes to sort-based aggregation.
  * Null handling (round 11, hardened per the round-10 advice): an input
  * row with a null score OR a null id never replaces the buffer — the
  * update condition is null-guarded, so a null id can never be written
  * into the non-nullable long buffer slot (undefined for unsafe-row
  * hash-agg buffers) — and a group with NO qualifying row evaluates to
  * NULL (nullable = true). Emptiness is an explicit third boolean
  * buffer slot (round 12, per the round-11 advice): the previous
  * sentinel encoding (-Inf, MaxValue) collided with a legitimate input
  * — a group containing only (score = -Inf, id = Long.MaxValue) rows
  * could never select that row and evaluated to null where
  * `max_by(id, struct(score, -id))` returns Long.MaxValue. With the
  * `seen` slot the first non-null row ALWAYS loads the buffer
  * (regardless of value) and evaluate is exact for every input,
  * sentinel values included. Three flat primitive slots still pass
  * HashAggregateExec's mutable-buffer check. */
case class ArgMaxTieMinId(score: Expression, id: Expression)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, GreaterThan, If, IsNotNull, LessThan, Literal, Not, Or}

  override def children: Seq[Expression] = Seq(score, id)
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got " +
          s"(${s.simpleString(10)}, ${i.simpleString(10)})")
    }
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "argmax_tie_min_id"

  private lazy val bScore =
    AttributeReference("bScore", DoubleType, nullable = false)()
  private lazy val bId =
    AttributeReference("bId", LongType, nullable = false)()
  private lazy val bSeen =
    AttributeReference("bSeen", BooleanType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bScore, bId, bSeen)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(Double.NegativeInfinity), Literal(Long.MaxValue),
      Literal(false))
  override lazy val updateExpressions: Seq[Expression] = {
    // null-guard BOTH inputs: without it a null id with a strictly
    // greater (non-null) score makes `better` TRUE and writes null
    // into the non-nullable buffer slot — undefined behavior for
    // unsafe-row hash-agg buffers. An unseen buffer accepts ANY
    // non-null row — including (-Inf, Long.MaxValue), which the old
    // sentinel encoding could never select.
    val better = And(And(IsNotNull(score), IsNotNull(id)),
      Or(Not(bSeen),
        Or(GreaterThan(score, bScore),
          And(EqualTo(score, bScore), LessThan(id, bId)))))
    Seq(If(better, score, bScore), If(better, id, bId),
      Or(bSeen, better))
  }
  override lazy val mergeExpressions: Seq[Expression] = {
    // right wins iff it has seen a row AND (left hasn't, or right's
    // (score desc, id asc) beats left's); an unseen side's slot values
    // are the inert initials and must never be compared as data
    val rightWins = And(bSeen.right,
      Or(Not(bSeen.left),
        Or(GreaterThan(bScore.right, bScore.left),
          And(EqualTo(bScore.right, bScore.left),
            LessThan(bId.right, bId.left)))))
    Seq(If(rightWins, bScore.right, bScore.left),
      If(rightWins, bId.right, bId.left),
      Or(bSeen.left, bSeen.right))
  }
  override lazy val evaluateExpression: Expression =
    If(bSeen, bId, Literal(null, LongType))

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): ArgMaxTieMinId =
    copy(score = c(0), id = c(1))
}
