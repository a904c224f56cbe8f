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

  /** Contract-shaped key-skew audit over the three natural shuffle keys
    * of the schema (events.user_id, lineitem.l_orderkey,
    * orders.o_custkey) — the "do I need salting before this join"
    * report, one row per key: row/key counts, max / p99 / median key
    * frequency, the max-to-median skew ratio, the top-8 heavy-hitter
    * row share, and an integer-arithmetic salting flag (the hottest key
    * exceeding 1/32 of all rows would overflow its fair share of this
    * session's 32 shuffle partitions — exactly the case
    * Relational.hotKeySaltedJoin exists for).
    *
    * Determinism: median/p99 are interpolated percentiles rounded to
    * 2 dp (the q39 cross-engine convention); the skew ratio divides the
    * ROUNDED median (re-quantize rule); top-8 orders by (freq desc, key
    * string asc) — a total order. Scale shape: one partial-aggregated
    * key-count shuffle per audited key; the percentile's aggregation
    * state is bounded by the number of DISTINCT frequency values, which
    * is ≤ √(2·n_rows) (k distinct frequencies sum to ≥ k(k+1)/2 rows) —
    * ~1.4 M entries at 10¹² rows, driver-safe; top-8 is a partial
    * top-k (TakeOrderedAndProject), never a global sort. */
  def keySkewAudit(s: SparkSession, d: String): DataFrame = {
    def audit(df: DataFrame, keyCol: String, label: String): DataFrame = {
      val counts = df.select(col(keyCol).cast("string").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .localCheckpoint() // summary + top-8 share the key-count pass
      val summary = counts.agg(
        sum(col("n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("n")).as("max_freq"),
        round(expr("percentile(n, 0.99)"), 2).as("p99_freq"),
        round(expr("percentile(n, 0.5)"), 2).as("median_freq"))
      val top8 = counts.orderBy(col("n").desc, col("k")).limit(8)
        .agg(sum(col("n")).as("top8"))
      summary.crossJoin(broadcast(top8))
        .select(lit(label).as("key_name"), col("n_rows"), col("n_keys"),
          col("max_freq"), col("p99_freq"), col("median_freq"),
          round(col("max_freq") / col("median_freq"), 4).as("skew_ratio"),
          round(col("top8") / col("n_rows").cast("double"), 6)
            .as("top8_share"),
          (col("max_freq") * 32 > col("n_rows")).as("needs_salting"))
    }
    audit(Tables.events(s, d), "user_id", "events.user_id")
      .union(audit(Tables.lineitem(s, d), "l_orderkey",
        "lineitem.l_orderkey"))
      .union(audit(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
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
