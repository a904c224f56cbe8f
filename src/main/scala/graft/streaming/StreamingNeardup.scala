package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Streaming near-dup ingest filter — [[graft.dedup.Dedup.snapshotNeardup]]'s
  * probe arm run CONTINUOUSLY: arriving documents are fingerprinted
  * in-row (trigram-md5 set + minhash signature — pure kernel
  * projections), their band hashes stream-static-join the FROZEN
  * registry's band table, and every collision exact-verifies with the
  * trigram Jaccard computed between the two carried sets. The whole
  * pipeline is STATELESS — projection, two stream-static joins, a
  * filter: no state store, no watermark, no streaming aggregation — so
  * it runs at ingest rate with bounded memory regardless of stream
  * length, the property a 100 TB/day crawl intake needs.
  *
  * A pair that collides in several bands emits once per colliding band
  * (streaming `distinct` would need a state store); emissions are
  * IDEMPOTENT under the house registry discipline — downstream either
  * upserts by (doc_id, match_id) (Sink.upsertByKey) or reads the
  * distinct set, and the spec pins distinct(stream) == batch probe.
  *
  * Scale shape: the arriving batch is micro-batch-sized; the registry
  * band table is touched only through its (band, bandhash) key and the
  * per-match e_id lookup — both content-keyed equi-joins Spark can
  * shuffle or broadcast as sizes dictate; nothing is quadratic in
  * either the stream or the registry. */
object StreamingNeardup {

  /** Matched near-dup pairs of an arriving (doc_id, text) frame against
    * a frozen registry ([[Dedup.neardupRegistryDf]] output): one row
    * per (arriving doc, registry doc, band) collision whose exact
    * trigram Jaccard ≥ `threshold`. Works identically on a batch frame
    * (the parity the spec pins). */
  def matches(arriving: DataFrame, registry: DataFrame,
      threshold: Double = 0.6): DataFrame = {
    val reg = registry.localCheckpointIfBatch()
    val fp = Dedup.neardupRegistryDf(arriving)
      .select(col("e_id").as("doc_id"), col("gs").as("a_gs"),
        col("sig"))
    val bandsA = Dedup.bandTable(fp.select(col("doc_id"), col("sig")),
      "doc_id")
      .join(fp.select(col("doc_id"), col("a_gs")), Seq("doc_id"))
    val bandsR = Dedup.bandTable(
      reg.select(col("e_id"), col("sig")), "e_id")
    bandsA.join(bandsR, Seq("band", "bandhash"))
      .join(reg.select(col("e_id"), col("gs").as("e_gs")), Seq("e_id"))
      .withColumn("i",
        size(array_intersect(col("a_gs"), col("e_gs"))).cast("double"))
      .withColumn("jac", round(col("i") /
        (size(col("a_gs")) + size(col("e_gs")) - col("i")), 4))
      .filter(col("jac") >= threshold)
      .select(col("doc_id"), col("e_id").as("match_id"), col("jac"))
  }

  private implicit class BatchPin(df: DataFrame) {
    /** localCheckpoint is illegal on a streaming frame; the registry is
      * always static here, but guard anyway so a caller passing a
      * stream as the registry fails with the real error, not ours. */
    def localCheckpointIfBatch(): DataFrame =
      if (df.isStreaming) df else df.localCheckpoint()
  }
}
