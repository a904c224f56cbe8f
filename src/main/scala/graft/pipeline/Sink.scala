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

  /** BigQuery arm of the sink contract (reference `code/beam.py:167-193`):
    * the exact option mapping the public `spark-bigquery-connector`
    * (`com.google.cloud.spark:spark-bigquery-with-dependencies`) takes to
    * reproduce the reference's `WriteToBigQuery` semantics —
    *
    *   - `WRITE_APPEND`            → `.mode("append")`
    *   - `CREATE_IF_NEEDED`        → connector default (creates the table
    *                                  on first write; no option needed)
    *   - `timePartitioning: DAY`   → `partitionType=DAY` (+`partitionField`
    *                                  to partition on a data column rather
    *                                  than ingestion time)
    *   - indirect load staging     → `temporaryGcsBucket`
    *
    * Built as (format, mode, options) so it compiles and unit-tests
    * WITHOUT the connector jar or GCP access (this sandbox has neither):
    * [[bigQueryWriter]] applies the tuple to a `DataFrameWriter`, and the
    * terminal `.save()` stays with the caller, who must have the
    * connector on the classpath. The parquet sinks above implement the
    * same contract locally; a deployment swaps sinks without touching
    * any upstream plan. */
  def bigQueryWriteConfig(table: String, temporaryGcsBucket: String,
      partitionField: Option[String] = None)
      : (String, String, Map[String, String]) =
    ("bigquery", "append",
      Map(
        "table" -> table,
        "temporaryGcsBucket" -> temporaryGcsBucket,
        "partitionType" -> "DAY") ++
        partitionField.map("partitionField" -> _))

  /** Configure (but do not execute) a BigQuery append for `df`:
    * `bigQueryWriter(df, t, b).save()` is the deployment call. */
  def bigQueryWriter(df: DataFrame, table: String,
      temporaryGcsBucket: String, partitionField: Option[String] = None)
      : org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] = {
    val (fmt, mode, opts) =
      bigQueryWriteConfig(table, temporaryGcsBucket, partitionField)
    df.write.format(fmt).mode(mode).options(opts)
  }

  /** Single-pass variant: write a branch-tagged frame once, partitioned by
    * (branch, ingest_date). `basePath/branch=delivered` and
    * `basePath/branch=other` are the two "tables" — one scan, two outputs. */
  def writeTaggedSinglePass(tagged: DataFrame, basePath: String): Unit =
    withIngestDate(tagged).write
      .mode("append")
      .partitionBy(Split.BranchCol, IngestDateCol)
      .parquet(basePath)

  /** Micro-batch-idempotent form of [[writeTaggedSinglePass]] — the
    * streaming sink's exactly-once half. foreachBatch offers at-least-
    * once: a crash BETWEEN the sink write and the checkpoint commit
    * re-runs the batch on restart, and a plain append would then
    * duplicate every row of that batch. Keying a dynamic-partition
    * overwrite by batch_id makes the re-run rewrite EXACTLY its own
    * partitions: the file source re-reads the same WAL-pinned offset
    * range (same file, deterministic rows), so the second attempt
    * converges on the first instead of stacking on it. Downstream
    * readers see the same branch=…/ingest_date=… layout with one extra
    * partition column. */
  def writeTaggedIdempotent(tagged: DataFrame, basePath: String,
      batchId: Long): Unit =
    withIngestDate(tagged)
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(Split.BranchCol, IngestDateCol, "batch_id")
      .parquet(basePath)

  /** Idempotent day-partitioned write: dynamic partition overwrite replaces
    * ONLY the partitions present in `df`, so re-running a day's job (after
    * a failure, a backfill, a bad deploy) converges to one copy instead of
    * appending duplicates — the exactly-once-per-partition contract plain
    * append can't give. Untouched historical partitions are left intact. */
  def writePartitionedIdempotent(df: DataFrame, path: String): Unit =
    withIngestDate(df).write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(IngestDateCol)
      .parquet(path)

  /** Upsert (merge) into a KEY-BUCKETED parquet sink: for each key the
    * latest version wins. The table is partitioned by a hash bucket of the
    * key (NOT by ingest date) — the layout that makes touched-partition
    * merging CORRECT: a key always lives in exactly one bucket, so reading
    * back just the buckets present in the incoming batch sees every prior
    * version of every incoming key, and dynamic partition overwrite
    * rewrites only those buckets. (A date-partitioned layout cannot support
    * partial-merge upserts: a key's prior version may live in any day.)
    * Ties on (key, version) — e.g. a replayed batch carrying two payloads —
    * resolve deterministically by the full-row ordering. Converges under
    * re-runs. */
  val UpsertBuckets = 16

  def upsertByKey(s: org.apache.spark.sql.SparkSession, incoming: DataFrame,
      path: String, keyCol: String, versionCol: String): Unit = {
    val dataCols = incoming.columns.toSeq
    val inc = incoming.withColumn("key_bucket",
      pmod(xxhash64(col(keyCol)), lit(UpsertBuckets.toLong)))
    val buckets = inc.select(col("key_bucket")).distinct()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val existing =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        s.read.parquet(path)
          .join(broadcast(buckets), Seq("key_bucket"), "left_semi")
          .select(inc.columns.map(col).toSeq: _*)
      else inc.limit(0)
    val rowStruct = struct(dataCols.map(col): _*)
    val merged = existing.unionByName(inc)
      .groupBy(col(keyCol))
      .agg(
        max_by(struct((dataCols :+ "key_bucket").map(col): _*),
          // version first; full row as the deterministic tie-break (keyCol
          // alone would be constant within the group, i.e. no tie-break)
          struct(col(versionCol), rowStruct)).as("r"))
      .select(col("r.*"))
      // materialize before writing: the plan reads the same path it is
      // about to overwrite
      .localCheckpoint()
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("key_bucket")
      .parquet(path)
  }

  /** Small-file compaction for a partitioned sink: streaming/incremental
    * appends leave one-file-per-micro-batch debris that kills scan
    * performance at scale (footer reads + scheduling overhead dominate).
    * Rewrites each partition's data into ~`targetFileBytes` files, computed
    * from the partition's actual byte size, preserving the partition
    * layout. Returns (files_before, files_after). */
  def compactPartitioned(s: org.apache.spark.sql.SparkSession, path: String,
      partitionCol: String = IngestDateCol,
      targetFileBytes: Long = 128L << 20): (Long, Long) = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    def dataFiles(): Seq[org.apache.hadoop.fs.FileStatus] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
      val buf = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val before = dataFiles()
    val totalBytes = before.map(_.getLen).sum
    val targetFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = s.read.parquet(path)
    // hash on (partition column, spread key): the spread key lets a single
    // oversized partition split across up to `targetFiles` tasks/files —
    // hashing on the partition column alone would force every row of a
    // partition into ONE task and one file, ignoring the size target
    val spread = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.monotonically_increasing_id(),
      org.apache.spark.sql.functions.lit(targetFiles.toLong))
    // the rewrite goes to a temp dir first; the two renames below are NOT
    // one atomic swap — a crash between them leaves the data under
    // `<path>__compact_bak` (recovery: rename it back). A true atomic swap
    // needs a table format with a metadata pointer (Iceberg/Delta); for a
    // plain parquet dir this bak-then-swap is the strongest available.
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    df.repartition(targetFiles,
        org.apache.spark.sql.functions.col(partitionCol), spread)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmp)
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_bak")
    fs.rename(new org.apache.hadoop.fs.Path(path), bak)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    fs.delete(bak, true)
    (before.size.toLong, dataFiles().size.toLong)
  }
}
