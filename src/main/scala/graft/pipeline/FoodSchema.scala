package graft.pipeline

import org.apache.spark.sql.types._

/** Schemas for the food-delivery pipeline.
  *
  * The reference declares a 12-column all-STRING BigQuery schema
  * (reference `code/beam.py:73-86`); column 12 (`new_col`) is synthesized by
  * the cleaning chain, so the raw CSV carries the first 11 columns
  * (reference `data/food_daily.csv:1`, header skipped at `code/beam.py:115`).
  * Everything stays `StringType` on purpose — the reference performs no
  * casts, and the oracle comparison is on string values.
  */
object FoodSchema {
  /** Output column order, matching the reference's `to_json` dict order
    * (reference `code/beam.py:53-66`). */
  val outputColumns: Seq[String] = Seq(
    "customer_id", "date", "timestamp", "order_id", "items", "amount",
    "mode", "restaurant", "status", "ratings", "feedback", "new_col")

  /** Raw CSV columns (the 11 physical fields). */
  val rawColumns: Seq[String] = outputColumns.dropRight(1)

  /** 11-field all-string input schema. */
  val raw: StructType =
    StructType(rawColumns.map(StructField(_, StringType, nullable = true)))

  /** 12-field all-string output schema (raw + constant `new_col`). */
  val output: StructType =
    StructType(outputColumns.map(StructField(_, StringType, nullable = true)))
}
