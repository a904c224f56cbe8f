package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The delivered / other-status two-way split.
  *
  * The reference filters field 8 == "delivered" and its complement off one
  * shared cleaned collection (reference `code/beam.py:123-135`); T2 has
  * already lowercased, so the comparison is exact-match on the lowercased
  * status. F1 ∪ F2 partition the parent (disjoint, covering) — SURVEY §2.
  */
object Split {
  val DeliveredStatus = "delivered"

  /** Branch tag column used by the single-pass partitioned writer. */
  val BranchCol = "branch"

  def delivered(df: DataFrame): DataFrame =
    df.filter(col("status") === DeliveredStatus)

  def other(df: DataFrame): DataFrame =
    df.filter(col("status") =!= DeliveredStatus || col("status").isNull)

  /** Both branches off one parent. Callers that run two write actions should
    * persist the parent first (see [[FoodOrdersJob]]) — Spark recomputes per
    * action, unlike Beam's single-graph fan-out (SURVEY §4.3). */
  def byStatus(df: DataFrame): (DataFrame, DataFrame) =
    (delivered(df), other(df))

  /** Scale path: tag each row with its branch so one write action can emit
    * both tables via `partitionBy(branch)` — a single scan of the input
    * instead of two (at 100 TB this halves IO; no cache needed). */
  def tagged(df: DataFrame): DataFrame =
    df.withColumn(
      BranchCol,
      when(col("status") === DeliveredStatus, lit("delivered"))
        .otherwise(lit("other")))
}
