package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{ImageNeardup, VideoNeardup}

/** Streaming video near-dup ingest filter — the temporal member of the
  * streaming probe family ([[StreamingImageNeardup]],
  * [[StreamingAudioNeardup]]): arriving videos are container-decoded
  * (GVID or animated GIF89a — [[VideoNeardup.fingerprintOf]] dispatches
  * on the magic bytes, so one stream may carry both) and fingerprinted
  * per partition into the 256-bit temporal stack, their 8 × 32-bit wide
  * band keys stream-static-join the FROZEN registry's band table, and
  * every collision exact-verifies with the summed per-word bit_count.
  * Projection + one stream-static equi-join + a filter: no state store,
  * no watermark, no streaming aggregation — bounded memory at any
  * stream length.
  *
  * A pair that collides in several bands emits once per colliding band
  * (streaming `distinct` would need a state store); emissions are
  * idempotent under the registry discipline — downstream upserts by
  * (asset_id, match_id) or reads the distinct set, and the spec pins
  * distinct(stream) == batch probe. */
object StreamingVideoNeardup {

  /** Matches of an arriving (asset_id, media) frame against a frozen
    * fingerprinted registry ([[VideoNeardup.fingerprints]] output):
    * one row per (arriving video, registry video, band) collision
    * within `maxHamming` summed bits. Works identically on a batch
    * frame (the parity the spec pins). */
  def matches(arriving: DataFrame, registry: DataFrame, s: SparkSession,
      maxHamming: Int = VideoNeardup.MaxHamming): DataFrame = {
    val reg = ImageNeardup.bandTableWide(
      registry.localCheckpointIfBatch(), "match_id")
      .withColumnRenamed("dwords", "r_dwords")
    val fp = ImageNeardup.bandTableWide(
      VideoNeardup.fingerprints(arriving, s), "asset_id")
    fp.join(reg, Seq("band", "bandkey"))
      .withColumn("hamming", expr(
        "aggregate(zip_with(dwords, r_dwords, (x, y) -> " +
          "CAST(bit_count(x ^ y) AS INT)), 0, (acc, v) -> acc + v)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("asset_id"), col("match_id"), col("hamming"))
  }

  private implicit class BatchPin(df: DataFrame) {
    /** localCheckpoint is illegal on a streaming frame; the registry is
      * always static here, but guard anyway so a caller passing a
      * stream as the registry fails with the real error, not ours. */
    def localCheckpointIfBatch(): DataFrame =
      if (df.isStreaming) df else df.localCheckpoint()
  }
}
