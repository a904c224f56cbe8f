package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational diagnostics — the measurements behind the engine's scale
  * decisions (when to salt a join, when to compact, what to broadcast). */
object Diagnostics {

  /** Key-skew profile for a prospective join/groupBy key: per-key counts
    * summarized as max/p99/median plus the heaviest keys. The max/median
    * ratio is the salting signal — AQE's skew-join handles moderate ratios,
    * explicit salting (Relational.hotKeySaltedJoin) the pathological ones.
    * One partial-aggregated pass + a tiny summary aggregation. */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 5): DataFrame = {
    // two consumers (summary + top keys): checkpoint the per-key counts so
    // the scan + aggregation over df runs once, not once per branch
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val summary = counts.agg(
      max(col("n")).as("max_n"),
      round(expr("percentile(n, 0.99)"), 2).as("p99_n"),
      round(expr("percentile(n, 0.5)"), 2).as("median_n"),
      count(lit(1)).as("n_keys"))
    // collect_list does not preserve the pre-limit sort order; sort the
    // collected (−n, key) structs so top_keys is contractually heaviest-
    // first (ties by key ascending)
    val top = counts.orderBy(col("n").desc, col(keyCol))
      .limit(topN)
      .agg(transform(
        sort_array(collect_list(
          struct((-col("n")).as("negn"), col(keyCol).cast("string").as("k")))),
        x => x.getField("k")).as("top_keys"))
    summary.crossJoin(top)
      .withColumn("skew_ratio",
        round(col("max_n") / col("median_n"), 2))
  }

  /** Size-estimate for broadcast decisions: bytes per row (sampled) ×
    * row count, compared against the session's broadcast threshold. */
  def broadcastAdvice(s: SparkSession, df: DataFrame): DataFrame = {
    // the conf may carry a size suffix ("10485760b", "32m") or be the
    // plain "-1" disable idiom, which the byte-string parser rejects
    val raw = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val threshold = raw.toLongOption.getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val session = s
    import session.implicits._
    Seq((est.toString, threshold,
      est <= threshold && est > 0))
      .toDF("estimated_bytes", "broadcast_threshold", "would_broadcast")
  }
}
