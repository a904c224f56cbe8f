package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{ImageNeardup, VideoNeardup}

/** Streaming video near-dup ingest filter — the temporal member of the
  * streaming probe family: arriving videos are container-decoded (GVID,
  * animated GIF89a, or MJPEG — [[VideoNeardup.fingerprintOf]] dispatches
  * on the magic bytes, so one stream may carry all three) and
  * fingerprinted per partition into the 256-bit temporal stack, then
  * probed against the frozen registry through the shared
  * [[FrozenRegistryProbe]] kernel (plan-shape/idempotence/scale notes
  * there). This wrapper owns only the modality: the 8 × 32-bit wide
  * band table and the summed per-word bit_count verify. */
object StreamingVideoNeardup {

  /** Matches of an arriving (asset_id, media) frame against a frozen
    * fingerprinted registry ([[VideoNeardup.fingerprints]] output):
    * one row per (arriving video, registry video, band) collision
    * within `maxHamming` summed bits. Works identically on a batch
    * frame (the parity the spec pins). */
  def matches(arriving: DataFrame, registry: DataFrame, s: SparkSession,
      maxHamming: Int = VideoNeardup.MaxHamming): DataFrame =
    FrozenRegistryProbe.matches(
      VideoNeardup.fingerprints(arriving, s), registry,
      ImageNeardup.bandTableWide(_, _), "dwords",
      (a, r) => aggregate(
        zip_with(a, r, (x, y) => bit_count(x.bitwiseXOR(y)).cast("int")),
        lit(0), (acc, v) => acc + v),
      maxHamming)
}
