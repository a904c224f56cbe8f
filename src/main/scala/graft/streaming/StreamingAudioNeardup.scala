package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{AudioNeardup, ImageNeardup}

/** Streaming audio near-dup ingest filter — [[AudioNeardup]]'s probe arm
  * run CONTINUOUSLY, the [[StreamingImageNeardup]] shape one modality
  * over: arriving audio assets are decoded and fingerprinted per
  * partition (stateless map work), their band keys stream-static-join
  * the FROZEN registry's band table, and every collision exact-verifies
  * with a bit_count on the two carried fingerprints. Projection + one
  * stream-static equi-join + a filter: no state store, no watermark, no
  * streaming aggregation — bounded memory at any stream length.
  *
  * A pair that collides in several bands emits once per colliding band
  * (streaming `distinct` would need a state store); emissions are
  * idempotent under the registry discipline — downstream upserts by
  * (asset_id, match_id) or reads the distinct set, and the spec pins
  * distinct(stream) == batch probe. */
object StreamingAudioNeardup {

  /** Matches of an arriving (asset_id, media) frame against a frozen
    * fingerprinted registry ([[AudioNeardup.fingerprints]] output): one
    * row per (arriving clip, registry clip, band) collision within
    * `maxHamming` bits. Works identically on a batch frame (the parity
    * the spec pins). The band machinery is [[ImageNeardup]]'s — the
    * fingerprint column shares its name and width. */
  def matches(arriving: DataFrame, registry: DataFrame, s: SparkSession,
      maxHamming: Int = AudioNeardup.DefaultMaxHamming): DataFrame = {
    val reg = ImageNeardup.bandTable(
      registry.localCheckpointIfBatch(), "match_id", maxHamming)
      .withColumnRenamed("dhash", "r_dhash")
    val fp = ImageNeardup.bandTable(
      AudioNeardup.fingerprints(arriving, s), "asset_id", maxHamming)
    fp.join(reg, Seq("band", "bandkey"))
      .withColumn("hamming",
        bit_count(col("dhash").bitwiseXOR(col("r_dhash"))).cast("int"))
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
