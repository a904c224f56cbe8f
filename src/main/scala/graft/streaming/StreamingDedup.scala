package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Sink

/** Streaming corpus deduplication: a continuously-maintained EXACT dedup
  * registry. Each micro-batch of documents is content-addressed
  * (sha2-256 of the text), and the batch merges into the key-bucketed
  * registry through `Sink.upsertByKey` keyed on the digest with version
  * = −doc_id — max_by(version) therefore keeps the SMALLEST doc_id ever
  * seen for that content, i.e. first-wins dedup that is deterministic,
  * order-insensitive ACROSS batches, and replay-convergent (a re-run
  * micro-batch merges to the identical registry — the exactly-once story
  * is checkpointed offsets + the idempotent merge, same as CdcStream).
  * The registry rows keep the document payload, so the registry IS the
  * deduplicated corpus; per-batch cost touches only the hash-buckets
  * present in the batch, never the whole registry. */
object StreamingDedup {

  def start(docs: DataFrame, registryPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sink.upsertByKey(batch.sparkSession, address(batch), registryPath,
          "h", "neg_id")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Content-address a (doc_id, text, …) frame: digest key + first-wins
    * version. Exposed for the replay-convergence spec. */
  def address(batch: DataFrame): DataFrame =
    batch.withColumn("h", sha2(col("text"), 256))
      .withColumn("neg_id", -col("doc_id"))
}
