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
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val summary = counts.agg(
      max(col("n")).as("max_n"),
      round(expr("percentile(n, 0.99)"), 2).as("p99_n"),
      round(expr("percentile(n, 0.5)"), 2).as("median_n"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("n").desc, col(keyCol))
      .limit(topN)
      .agg(collect_list(col(keyCol).cast("string")).as("top_keys"))
    summary.crossJoin(top)
      .withColumn("skew_ratio",
        round(col("max_n") / col("median_n"), 2))
  }

  /** Size-estimate for broadcast decisions: bytes per row (sampled) ×
    * row count, compared against the session's broadcast threshold. */
  def broadcastAdvice(s: SparkSession, df: DataFrame): DataFrame = {
    // the conf may carry a size suffix ("10485760b", "32m")
    val threshold = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(s.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val session = s
    import session.implicits._
    Seq((est.toString, threshold,
      est <= threshold && est > 0))
      .toDF("estimated_bytes", "broadcast_threshold", "would_broadcast")
  }
}
