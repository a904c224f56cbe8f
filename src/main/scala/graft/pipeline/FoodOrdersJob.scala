package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end food-orders job: scan → clean → split → 2 partitioned appends
  * + 3 global counts (the reference's whole dataflow, `code/beam.py:109-193`).
  *
  * The reference's Beam graph computes the cleaned collection once for five
  * consumers (2 filters+sinks, 3 counts) inside a single run. Spark executes
  * per action, so a naive translation re-reads and re-cleans per sink —
  * SURVEY §4.3 calls this the one real design decision. Two strategies:
  *
  *  - [[runSinglePass]] (default, scale path): tag rows with their branch and
  *    write ONCE via `partitionBy(branch, ingest_date)`; counts ride along as
  *    `Observation` metrics. One scan, zero caching, zero extra actions —
  *    this is the plan you want at 100 TB.
  *  - [[runTwoWrites]] (table-layout parity): persist the cleaned frame
  *    (MEMORY_AND_DISK — spills instead of OOM on big inputs), run the two
  *    filtered writes against the cache, unpersist. Counts come from an
  *    `Observation` on the first pass — no separate count actions.
  */
object FoodOrdersJob {

  /** total / delivered / other — the reference logs these every run
    * (`code/beam.py:140-162`); invariant total == delivered + other. */
  final case class Counts(total: Long, delivered: Long, other: Long)

  private def observed(df: DataFrame, obs: Observation): DataFrame =
    df.observe(
      obs,
      count(lit(1)).as("total"),
      count(when(col("status") === Split.DeliveredStatus, 1)).as("delivered"),
      // null-safe: a null status routes to the other branch (Split.other),
      // so it must count as other here too or total != delivered + other
      count(when(col("status") =!= Split.DeliveredStatus ||
        col("status").isNull, 1)).as("other"))

  private def counts(obs: Observation): Counts = {
    val m = obs.get
    Counts(m("total").asInstanceOf[Long], m("delivered").asInstanceOf[Long],
      m("other").asInstanceOf[Long])
  }

  /** One scan, one write action, both branches + all three counts. */
  def runSinglePass(spark: SparkSession, input: String, basePath: String)
      : Counts = {
    val cleaned = Clean(Ingest.readRaw(spark, input))
    val obs = Observation()
    Sink.writeTaggedSinglePass(Split.tagged(observed(cleaned, obs)), basePath)
    counts(obs)
  }

  /** Two separate output tables (exact reference layout), cache-backed. */
  def runTwoWrites(spark: SparkSession, input: String,
      deliveredPath: String, otherPath: String): Counts = {
    val cleaned = Clean(Ingest.readRaw(spark, input))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val obs = Observation()
      Sink.writePartitioned(observed(Split.delivered(cleaned), obs),
        deliveredPath)
      Sink.writePartitioned(Split.other(cleaned), otherPath)
      // obs carries total==delivered here (branch already filtered); compute
      // full counts from the cached parent cheaply instead.
      val delivered = obs.get("total").asInstanceOf[Long]
      val total = cleaned.count()
      Counts(total, delivered, total - delivered)
    } finally { cleaned.unpersist() }
  }
}
