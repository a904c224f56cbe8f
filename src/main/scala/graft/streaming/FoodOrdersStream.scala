package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.{Clean, Ingest, Sink, Split}

/** The reference's orchestration loop (GCS sensor → claim one file → run
  * batch job every 10 min, `code/airflow_pipe.py:63-94`) re-expressed as a
  * Structured Streaming file source — the robust exactly-once form:
  * checkpointed file-source offsets replace the sensor+move claim protocol,
  * `maxFilesPerTrigger=1` reproduces one-file-per-run, and
  * `cleanSource=archive` reproduces move-to-processed.
  *
  * The transform chain is the SAME [[Clean]]/[[Split]] code as the batch
  * path — one definition of the semantics, two execution modes.
  */
object FoodOrdersStream {

  /** Start the stream: watch `inputDir` for CSVs, clean, split, write both
    * branches day-partitioned under `outDir` via foreachBatch (reusing the
    * batch sink, one write action per micro-batch).
    *
    * Exactly-once, both halves: the checkpointed file-source WAL gives
    * no-loss/no-skip across restarts, and [[Sink.writeTaggedIdempotent]]
    * (dynamic partition overwrite keyed by batch_id) gives no-duplication
    * when a crash lands AFTER the sink write but BEFORE the checkpoint
    * commit — the at-least-once window plain foreachBatch appends leave
    * open. `failAfterSinkWrite` is the fault-injection hook the
    * kill-restart spec uses to land a crash deterministically inside
    * that window (the sink write has completed; throwing here kills the
    * query before the batch commits); production callers leave it. */
  def start(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, archiveDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 minutes"),
      failAfterSinkWrite: Long => Boolean = _ => false)
      : StreamingQuery = {
    // same line-split scan as the batch path (Ingest.parseLines), so batch
    // and streaming have identical malformed-row and empty-field semantics
    val lines = spark.readStream
      .schema(Ingest.LineSchema)
      .options(Ingest.ReaderOptions)
      .option("maxFilesPerTrigger", "1")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", archiveDir)
      .csv(inputDir)

    Clean(Ingest.parseLines(lines)).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sink.writeTaggedIdempotent(Split.tagged(batch), outDir, batchId)
        if (failAfterSinkWrite(batchId))
          throw new RuntimeException(
            s"injected crash: batch $batchId written, not committed")
      }
      .start()
  }

  /** Streaming deduplication: drop repeat events by key within the
    * watermark horizon — state stores one entry per key seen inside the
    * watermark, so memory is bounded by the horizon's key cardinality, not
    * history. The streaming form of exact dedup (SURVEY §2.3). */
  def dedupEvents(events: DataFrame, keys: Seq[String] = Seq("event_id"))
      : DataFrame = {
    import org.apache.spark.sql.functions.col
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      .select((keys :+ "ts").map(col): _*)
  }

  /** Streaming NEAR-dedup: per-row SimHash64 signature (native kernel, pure
    * map — no shuffle to build it) + dropDuplicatesWithinWatermark on the
    * signature. Documents whose near-dup class (identical token SET, i.e.
    * reordered/repeated-token copies) was seen inside the watermark horizon
    * are dropped — near-dedup at streaming-exact-dedup state cost (one
    * 8-byte signature per class in state, bounded by the horizon). The
    * streaming form of Dedup.simhashGroups. */
  def dedupNearSimhash(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.MinHashExpressions.simhash64
    import graft.functions.TextAnalysis
    docs
      .withColumn("toks", array_distinct(TextAnalysis.tokens(col("text"))))
      .filter(size(col("toks")) > 0)
      .withColumn("sig", simhash64(col("toks")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("sig")
      .select(col("doc_id"), col("sig"), col("ts"))
  }

  /** Stream-stream interval join: purchases ⋈ errors of the same user where
    * the error falls within 30 minutes after the purchase. Both sides are
    * watermarked and the join condition carries an explicit event-time
    * range, so Spark bounds the join state: each side buffers only rows
    * inside (watermark + interval), the production-safe form of a
    * stream-stream join — unbounded-state joins don't survive day one at
    * scale. Inner-join matches are emitted as they occur; the watermark
    * governs state eviction only, so the result equals the batch join
    * (spec-checked). */
  def purchaseErrorJoin(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val errors = events
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
    purchases.join(errors,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("error_id"),
        unix_millis(col("p_ts")).as("p_ms"),
        unix_millis(col("e_ts")).as("e_ms"))
  }

  /** Event-time windowed aggregation over a streaming source — watermarked
    * tumbling windows (the streaming form of Relational.eventsWindowed).
    * Used by the spec with a memory sink; in production the same plan runs
    * against Kafka/files with `outputMode(Append)` after the watermark
    * closes windows. */
  def windowedEventCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
  }
}
