package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for data-skipping: interleave the bits
  * of two normalized sort keys so that files (and parquet row groups) are
  * tight in BOTH dimensions at once. A single-column sort gives perfect
  * min/max locality on one predicate column and none on any other; the
  * Z-curve trades a little locality on each for usable locality on both —
  * at 100 TB this is the difference between a selective filter touching a
  * handful of files and touching every file in the table. Everything here
  * is built-in bitwise expressions (codegen'd, no UDF) + one tiny min/max
  * aggregation for normalization.
  */
object ZOrder {

  val Bits = 16

  /** Interleave the low `Bits` bits of two non-negative longs:
    * result bit 2i = bit i of a, bit 2i+1 = bit i of b. */
  def interleave(a: Column, b: Column, bits: Int = Bits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Min/max-normalize a numeric column into [0, 2^bits): the rank space
    * the curve interleaves. Degenerate (constant) columns map to 0. */
  def normalize(x: Column, mn: Column, mx: Column, bits: Int = Bits): Column =
    when(mx > mn,
      ((x - mn).cast("double") / (mx - mn) * lit((1L << bits) - 1))
        .cast("long"))
      .otherwise(lit(0L))

  /** Z-value column for two numeric dimensions, given their global min/max
    * (one tiny pre-aggregation supplies them). */
  def zValue(a: Column, aMin: Column, aMax: Column,
      b: Column, bMin: Column, bMax: Column): Column =
    interleave(normalize(a, aMin, aMax), normalize(b, bMin, bMax))

  /** Rewrite `df` into `nFiles` files clustered along the Z-curve of
    * (colA, colB): range-repartition + sort within partitions by z-value,
    * so every output file covers a compact Z-range — i.e., a compact
    * rectangle-ish region in (colA, colB) space, giving parquet min/max
    * stats real pruning power on BOTH columns. The min/max normalization
    * constants come from one scalar aggregation (broadcast via crossJoin). */
  def writeClustered(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int): Unit = {
    // collision-proof internal names: a user column named zv/amn/… must
    // survive the rewrite untouched
    val (amn, amx, bmn, bmx, zv) = ("__graft_amn", "__graft_amx",
      "__graft_bmn", "__graft_bmx", "__graft_zv")
    val bounds = df.agg(
      min(col(colA)).as(amn), max(col(colA)).as(amx),
      min(col(colB)).as(bmn), max(col(colB)).as(bmx))
    df.crossJoin(broadcast(bounds))
      .withColumn(zv, zValue(
        col(colA), col(amn), col(amx),
        col(colB), col(bmn), col(bmx)))
      .drop(amn, amx, bmn, bmx)
      .repartitionByRange(nFiles, col(zv))
      .sortWithinPartitions(col(zv))
      .drop(zv)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max spans for a column — what a stats-based reader prunes
    * on. Returns (file, lo, hi) via input_file_name. */
  def fileSpans(df: DataFrame, c: String): DataFrame =
    df.withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))

  /** Fraction of files whose [lo, hi] span contains `v` — the files a
    * min/max-pruning scan must touch for an equality predicate. */
  def touchFraction(spans: DataFrame, v: Double): Double = {
    val total = spans.count().toDouble
    val touched = spans
      .filter(col("lo") <= v && col("hi") >= v).count().toDouble
    touched / total
  }
}
