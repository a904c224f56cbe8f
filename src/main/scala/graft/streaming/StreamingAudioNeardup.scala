package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{AudioNeardup, ImageNeardup}

/** Streaming audio near-dup ingest filter — [[AudioNeardup]]'s probe arm
  * run CONTINUOUSLY, the [[StreamingImageNeardup]] shape one modality
  * over: arriving clips are decoded and fingerprinted per partition,
  * then probed against the frozen registry through the shared
  * [[FrozenRegistryProbe]] kernel (plan-shape/idempotence/scale notes
  * there). This wrapper owns only the modality: Haitsma-Kalker
  * fingerprints sharing [[ImageNeardup]]'s compact 64-bit band table
  * (the fingerprint column shares its name and width) and the
  * single-word bit_count verify. */
object StreamingAudioNeardup {

  /** Matches of an arriving (asset_id, media) frame against a frozen
    * fingerprinted registry ([[AudioNeardup.fingerprints]] output): one
    * row per (arriving clip, registry clip, band) collision within
    * `maxHamming` bits. Works identically on a batch frame (the parity
    * the spec pins). */
  def matches(arriving: DataFrame, registry: DataFrame, s: SparkSession,
      maxHamming: Int = AudioNeardup.DefaultMaxHamming): DataFrame =
    FrozenRegistryProbe.matches(
      AudioNeardup.fingerprints(arriving, s), registry,
      ImageNeardup.bandTable(_, _, maxHamming), "dhash",
      (a, r) => bit_count(a.bitwiseXOR(r)), maxHamming)
}
