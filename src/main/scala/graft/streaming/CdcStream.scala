package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.pipeline.Sink

/** Streaming CDC apply: continuous materialized-view maintenance. Each
  * micro-batch of change rows (any frame carrying a key and a monotonic
  * version) merges into the key-bucketed parquet table through
  * `Sink.upsertByKey` via foreachBatch — latest version per key wins,
  * only the hash-buckets present in the batch are rewritten, and because
  * the merge itself is idempotent and deterministic, a replayed
  * micro-batch (failure/restart between sink write and checkpoint
  * commit) converges instead of duplicating: the exactly-once story is
  * checkpointed offsets + an idempotent sink, the same contract a table
  * format's MERGE gives. */
object CdcStream {

  def start(changes: DataFrame, path: String, keyCol: String,
      versionCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sink.upsertByKey(batch.sparkSession, batch, path, keyCol, versionCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
