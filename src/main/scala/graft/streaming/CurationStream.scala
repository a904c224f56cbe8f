package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Advanced
import graft.pipeline.Sink

/** Streaming corpus curation — the q259 funnel run continuously:
  * arriving documents pass the quality gate (the SAME integer-arithmetic
  * rules as the batch funnel, recast as one pure projection so a stream
  * needs no state for it), merge into a canon-keyed first-wins dedup
  * registry (q25's canonical key through the idempotent
  * `Sink.upsertByKey` — replay-convergent, smallest doc_id wins across
  * ANY batch order), and the kept corpus is the registry under a FROZEN
  * mixture-rate draw applied at read time.
  *
  * Design notes mirrored from the batch funnel:
  *  - quality → dedup → rebalance ordering is preserved: the draw
  *    applies to the registry KEEPER (lowest id per canon), exactly as
  *    the batch form draws on the post-dedup representative — applying
  *    the draw before dedup would keep a higher-id duplicate whose
  *    keeper lost the draw, a different corpus.
  *  - rates are FROZEN (Advanced.mixtureRates on a reference corpus),
  *    the q257/q268 train-once/score-forever shape — a live stream
  *    can't compute "the smallest language so far" without a second
  *    stateful pass, and a sampling plan that drifts per trigger is
  *    not a plan.
  *  - exactly-once = checkpointed offsets + the idempotent merge
  *    (CdcStream's contract): a replayed micro-batch merges to the
  *    identical registry.
  *
  * At 100 TB/day: the gate is a projection on the stream; the merge
  * touches only the key-buckets present in the batch; the registry
  * holds one row per surviving canonical document. */
object CurationStream {

  /** The batch funnel's quality stage as ONE pure projection —
    * stream-safe (no explode, no aggregation, no join). Per-row cost is
    * bounded by document length; the bigram-multiplicity HOF is
    * O(distinct-bigrams × bigrams) per document, the same work the
    * batch groupBy does, just row-local. Emits the survivors with their
    * canonical dedup key. */
  def qualityGate(docs: DataFrame): DataFrame =
    docs
      .withColumn("w",
        expr("filter(split(lower(text), ' '), x -> x != '')"))
      .withColumn("n_tok", size(col("w")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("w"))).cast("long"))
      // explicit sub-2-token guard (the filterAblationDf discipline):
      // sequence(0, size(w) - 2) DESCENDS for 0/1-token docs and
      // element_at(w, 0) throws under ANSI — the n_tok >= 10 conjunct
      // below short-circuits today, but conjunct order surviving
      // planner transforms is not a contract (the GlobalOrder CaseWhen
      // lesson), so the expression itself must be total
      .withColumn("bg", expr("IF(size(w) >= 2, " +
        "transform(sequence(0, size(w) - 2), i -> " +
        "concat(element_at(w, i + 1), ' ', element_at(w, i + 2))), " +
        "cast(array() as array<string>))"))
      .withColumn("max_bg", expr("IF(size(bg) >= 1, " +
        "array_max(transform(array_distinct(bg), " +
        "x -> size(filter(bg, y -> y = x)))), 0)").cast("long"))
      .withColumn("total_bg", size(col("bg")).cast("long"))
      .filter(col("n_tok") >= 10 &&
        !(col("max_bg") * 100 > col("total_bg") * 18) &&
        !((col("n_tok") - col("n_distinct")) * 10 > col("n_tok") * 7))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        concat_ws(" ", array_sort(array_distinct(col("w")))).as("canon"))

  /** Start the funnel over a streaming (doc_id, lang, text) frame:
    * gate → canon-keyed first-wins registry at `registryPath`. */
  def start(docs: DataFrame, registryPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sink.upsertByKey(batch.sparkSession,
          qualityGate(batch).withColumn("neg_id", -col("doc_id")),
          registryPath, "canon", "neg_id")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** The kept corpus: registry keepers under the frozen-rate draw —
    * a stateless read-side filter, so "what would training consume
    * right now" needs no recomputation of any stage. */
  def kept(s: SparkSession, registryPath: String,
      rates: Map[String, Double]): DataFrame =
    Advanced.rebalanceApplyDf(
      s.read.parquet(registryPath)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("canon")),
      rates)
}
