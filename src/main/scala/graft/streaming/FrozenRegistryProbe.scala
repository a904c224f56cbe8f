package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared frozen-registry streaming probe kernel (round 13, verdict
  * item 5): [[StreamingImageNeardup]], [[StreamingAudioNeardup]] and
  * [[StreamingVideoNeardup]] are one plan shape — fingerprint the
  * arriving assets per partition (stateless map work), explode both
  * sides into (band, bandkey) tables, stream-static equi-join the
  * FROZEN registry, exact-verify each collision on the carried
  * fingerprints — differing only in the fingerprint function, the band
  * table, and the hamming expression. Those three arrive as parameters;
  * the modality wrappers are one-liners, and the next modality costs
  * one more.
  *
  * Projection + one stream-static equi-join + a filter: no state store,
  * no watermark, no streaming aggregation — bounded memory at any
  * stream length (the wrappers' specs pin the node-typed stateless-plan
  * check per modality, so the kernel cannot silently grow state).
  *
  * A pair that collides in several bands emits once per colliding band
  * (streaming `distinct` would need a state store); emissions are
  * idempotent under the registry discipline — downstream upserts by
  * (asset_id, match_id) or reads the distinct set, and each wrapper's
  * spec pins distinct(stream) == batch probe.
  *
  * Scale shape: the arriving micro-batch is small; the registry band
  * table is touched only through its (band, bandkey) equi-key — Spark
  * broadcasts or shuffles it as sizes dictate; nothing is quadratic in
  * either side. */
object FrozenRegistryProbe {

  /** Matches of an already-fingerprinted arriving frame against a
    * frozen fingerprinted registry: one (asset_id, match_id, hamming)
    * row per band collision within `maxHamming`.
    *
    * @param bandTable the modality's LSH key-table builder — one
    *   (idCol, band, bandkey, fingerprint) row per band, stateless
    *   per-row explode ([[graft.multimodal.ImageNeardup.bandTable]] /
    *   `bandTableWide`)
    * @param fpCol the fingerprint column the band table carries
    *   ("dhash" / "dwords")
    * @param hamming the exact verify expression over (arriving,
    *   registry) fingerprint columns */
  def matches(fingerprinted: DataFrame, registry: DataFrame,
      bandTable: (DataFrame, String) => DataFrame, fpCol: String,
      hamming: (Column, Column) => Column, maxHamming: Int): DataFrame = {
    val reg = bandTable(registry.localCheckpointIfBatch(), "match_id")
      .withColumnRenamed(fpCol, s"r_$fpCol")
    val fp = bandTable(fingerprinted, "asset_id")
    fp.join(reg, Seq("band", "bandkey"))
      .withColumn("hamming",
        hamming(col(fpCol), col(s"r_$fpCol")).cast("int"))
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
