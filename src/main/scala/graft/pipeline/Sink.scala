package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned-append sinks.
  *
  * The reference appends to two day-ingestion-time-partitioned BigQuery
  * tables with CREATE_IF_NEEDED (reference `code/beam.py:167-193`,
  * `README.md:194-198`). Locally we stand in with parquet partitioned by an
  * `ingest_date = current_date()` column — same layout contract (daily
  * partitions, append, auto-create); a BigQuery connector sink would swap in
  * behind the same method without touching the plan.
  */
object Sink {
  val IngestDateCol = "ingest_date"

  def withIngestDate(df: DataFrame): DataFrame =
    df.withColumn(IngestDateCol, current_date())

  /** Append `df` day-partitioned at `path` (creates the table dir if
    * needed — CREATE_IF_NEEDED parity). */
  def writePartitioned(df: DataFrame, path: String): Unit =
    withIngestDate(df).write
      .mode("append")
      .partitionBy(IngestDateCol)
      .parquet(path)

  /** Single-pass variant: write a branch-tagged frame once, partitioned by
    * (branch, ingest_date). `basePath/branch=delivered` and
    * `basePath/branch=other` are the two "tables" — one scan, two outputs. */
  def writeTaggedSinglePass(tagged: DataFrame, basePath: String): Unit =
    withIngestDate(tagged).write
      .mode("append")
      .partitionBy(Split.BranchCol, IngestDateCol)
      .parquet(basePath)
}
