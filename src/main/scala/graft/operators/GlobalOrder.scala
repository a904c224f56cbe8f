package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ordered passes — the two-level prefix-sum idiom
  * (range-partition → per-partition window → P-row offset table →
  * broadcast back) shared by every query that needs a running total or
  * rank over a GLOBAL order. A bare `Window.orderBy(...)` drags the
  * whole input through ONE partition ("WindowExec: No Partition
  * Defined"); this form keeps the data range-partitioned across the
  * cluster and only ever single-partitions the P-row offset table, so
  * it survives a 100× scale-up unchanged. Same structure as
  * [[Advanced.shardPackDf]] (q64) and the q99/q175 passes, factored out
  * so the ntile/percent_rank/CDF family stops hand-rolling global
  * windows.
  *
  * Determinism: every output value (running sum, row number) depends
  * only on the total order defined by `sortCols`, never on where the
  * range partitioner happens to cut — partition boundaries shift the
  * intermediate offsets, not the result.
  */
object GlobalOrder {

  /** Appends, for each `(name, valueCol)`, an INCLUSIVE running sum
    * column `name` over the global total order given by `sortCols`.
    * Values may be negative (partition totals are summed directly, not
    * taken as the max of the running column). Temp columns are dropped;
    * all original columns pass through. */
  def runningSums(df: DataFrame, sortCols: Seq[Column],
      values: Seq[(String, Column)]): DataFrame = {
    // localCheckpoint: the frame is consumed by BOTH the offset
    // aggregation and the final join. Without pinning, each branch
    // re-instantiates the range exchange, and RangePartitioner's
    // sampling seed varies with the RDD id — the two branches can draw
    // slightly different boundaries, assign rows near a cut different
    // __pids, and corrupt ranks for exactly those rows (observed at
    // sf0.01 before the pin). Materializing once freezes one set of
    // boundaries for everyone.
    val local = localFrame(df, sortCols, values).localCheckpoint()
    // P-row offset table: per-partition totals → exclusive prefix.
    // The global window here is over ≤ P rows — bounded by cluster
    // parallelism, not data volume.
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(values.map { case (n, _) =>
        sum(col(s"__v_$n")).as(s"__t_$n")
      }.head, values.drop(1).map { case (n, _) =>
        sum(col(s"__v_$n")).as(s"__t_$n")
      }: _*)
      .select(col("__pid") +: values.map { case (n, _) =>
        coalesce(sum(col(s"__t_$n")).over(wOff), lit(0L)).as(s"__o_$n")
      }: _*)
    val joined = local.join(broadcast(offsets), Seq("__pid"))
    val finished = values.foldLeft(joined) { case (d, (n, _)) =>
      d.withColumn(n, col(s"__o_$n") + col(s"__l_$n"))
    }
    finished.drop(
      "__pid" +: values.flatMap { case (n, _) =>
        Seq(s"__v_$n", s"__l_$n", s"__o_$n")
      }: _*)
  }

  /** The pre-checkpoint partitioned pass: range partition, stage value
    * columns, per-partition running sums. Package-visible so
    * PlanAuditSpec can assert the scale property of the production
    * plan (the corpus window partitions by __pid; no SinglePartition
    * exchange) — the eager checkpoint in [[runningSums]] hides this
    * subtree from the final query plan. */
  private[operators] def localFrame(df: DataFrame, sortCols: Seq[Column],
      values: Seq[(String, Column)]): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val parts = df
      .repartitionByRange(p, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val staged = values.foldLeft(parts) { case (d, (n, c)) =>
      d.withColumn(s"__v_$n", c)
    }
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    values.foldLeft(staged) { case (d, (n, _)) =>
      d.withColumn(s"__l_$n", sum(col(s"__v_$n")).over(wLocal))
    }
  }

  /** Appends a global 1-based row number `outCol` over the TOTAL order
    * `sortCols` (callers must make the order total — include a
    * tie-breaking key — for a deterministic result). */
  def rowNumber(df: DataFrame, outCol: String, sortCols: Column*)
      : DataFrame =
    runningSums(df, sortCols, Seq(outCol -> lit(1L)))

  /** SQL ntile semantics from a 1-based global row number: with n rows
    * and k tiles, the first n % k tiles take ⌈n/k⌉ rows, the rest
    * ⌊n/k⌋. Pure integer arithmetic (`div`), exact at any n. */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    val base = n.divide(k).cast("long")
    val rem = n % k
    val cut = rem * (base + 1)
    // n < k ⇒ base = 0: SQL ntile gives each row its own tile (tile = rn).
    // Guarding explicitly keeps the otherwise-branch divide-by-zero
    // (Infinity → ANSI cast error) unreachable regardless of how the
    // planner folds or reorders the CaseWhen branches.
    when(base === 0L, rn)
      .when(rn <= cut, (rn - 1).divide(base + 1).cast("long") + 1)
      .otherwise(rem + (rn - cut - 1).divide(base).cast("long") + 1)
  }
}
