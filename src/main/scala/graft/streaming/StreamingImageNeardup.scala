package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.ImageNeardup

/** Streaming image near-dup ingest filter — [[ImageNeardup]]'s probe arm
  * run CONTINUOUSLY, mirroring [[StreamingNeardup]]'s text arm: arriving
  * image assets are decoded and dHashed per partition (stateless map
  * work), then probed against the frozen registry through the shared
  * [[FrozenRegistryProbe]] kernel (its scaladoc carries the plan-shape,
  * idempotence, and scale notes; this wrapper owns only the modality:
  * dHash fingerprints, compact 64-bit band table, single-word
  * bit_count verify). */
object StreamingImageNeardup {

  /** Matches of an arriving (asset_id, media) frame against a frozen
    * hashed registry ([[ImageNeardup.dHashes]] output): one row per
    * (arriving asset, registry asset, band) collision within
    * `maxHamming` bits. Works identically on a batch frame (the parity
    * the spec pins). */
  def matches(arriving: DataFrame, registry: DataFrame, s: SparkSession,
      maxHamming: Int = ImageNeardup.DefaultMaxHamming): DataFrame =
    FrozenRegistryProbe.matches(
      ImageNeardup.dHashes(arriving, s), registry,
      ImageNeardup.bandTable(_, _, maxHamming), "dhash",
      (a, r) => bit_count(a.bitwiseXOR(r)), maxHamming)
}
