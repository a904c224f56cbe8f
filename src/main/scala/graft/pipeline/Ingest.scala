package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion with the reference's exact scan semantics.
  *
  * The reference reads the file as raw text lines with the header skipped and
  * recovers columns by a naive `row.split(',')` — no quoting, no escaping
  * (reference `code/beam.py:113-116`, split at `:36,:44,:126`). We reproduce
  * that with Spark's CSV source with quoting disabled, which is both faithful
  * and scan-parallel (a 100 TB input splits by HDFS/GCS block, unlike a
  * driver-side line loop).
  */
object Ingest {

  /** Read the raw food-orders CSV: header skipped, no quote handling,
    * PERMISSIVE (short rows yield nulls; [[Clean]] drops them, matching the
    * documented intent of the reference's `<12 fields` guard,
    * `code/beam.py:50-51`). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(FoodSchema.raw)
      .option("header", "true")         // skip_header_lines=1
      .option("quote", "")              // bare comma split, like row.split(',')
      .option("mode", "PERMISSIVE")
      .option("encoding", "UTF-8")      // BOM rides on the skipped header line
      .csv(path)
}
