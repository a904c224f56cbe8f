package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._

/** Query-shaped entry points for the text-analysis functions over the
  * `documents` table. All per-row expression work — no shuffle except where
  * a final group-by is part of the query shape. */
object TextQueries {

  /** Per-document stats: token counts (exact + BPE estimate), punctuation
    * ratio, stopword ratio, composite quality score. */
  def textStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      bpeTokenEstimate(col("text")).as("bpe_est"),
      punctRatio(col("text")).as("punct_ratio"),
      stopwordRatio(col("text")).as("stop_ratio"),
      qualityScore(col("text")).as("quality"))

  /** Language-ID confusion counts: declared lang × predicted lang. */
  def langIdConfusion(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), langId(col("text")).as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  /** Rolling-hash document fingerprints. */
  def fingerprints(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), fingerprint(col("text")).as("fp"))
}
