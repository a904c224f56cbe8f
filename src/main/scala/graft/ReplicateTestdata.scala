package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-time builder for the SECOND-SCALE bench dataset: replicates the
  * sf0.1 tables ×N (default 16 → ~9.6 M lineitem rows) into a local dir
  * that [[Bench]] can point at, so the 2× guard protocol is armed at two
  * scales instead of one. Replication preserves JOIN CONSISTENCY — every
  * foreign key is transformed with the same `key·N + rep` map as its
  * referenced primary key — and follows [[ScaleProbe]]'s corpus
  * discipline: document replicas get DISJOINT token namespaces (true
  * similarity/dedup pair counts grow linearly, not quadratically in N)
  * and embedding replicas get a deterministic first-component nudge
  * (distance ties never depend on replica order). region/nation stay
  * as-is (fixed-size dimensions, like TPC-H itself).
  *
  * Usage: runMain graft.ReplicateTestdata [srcDir dstDir n]
  */
object ReplicateTestdata {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf0.1_x16"
    val n = if (args.length > 2) args(2).toInt else 16
    val spark: SparkSession = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    def rep(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0L), lit(n - 1L))))
    def scaleKeys(df: DataFrame, keys: String*): DataFrame =
      keys.foldLeft(rep(df)) { (d, k) =>
        d.withColumn(k, col(k) * n + col("rep"))
      }.drop("rep")

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(scaleKeys(read("supplier"), "s_suppkey"), "supplier")
    write(scaleKeys(read("part"), "p_partkey"), "part")
    write(scaleKeys(read("customer"), "c_custkey"), "customer")
    write(scaleKeys(read("orders"), "o_orderkey", "o_custkey"), "orders")
    write(scaleKeys(read("lineitem"),
      "l_orderkey", "l_partkey", "l_suppkey"), "lineitem")
    // items live inside the props JSON ({"k": N}, ~100 distinct at
    // sf0.1): they must scale with the same disjoint-replica map as
    // user_id, or every item hub's degree grows ×n and wedge-shaped
    // graph queries densify quadratically instead of scaling linearly
    // (event_id % n recovers the replica tag post-scale)
    write(scaleKeys(read("events"), "event_id", "user_id")
      .withColumn("props", when(
        get_json_object(col("props"), "$.k").isNotNull,
        concat(lit("{\"k\": "),
          (get_json_object(col("props"), "$.k").cast("long") * n +
            col("event_id") % n).cast("string"), lit("}")))
        .otherwise(col("props"))),
      "events")
    write(scaleKeys(read("documents"), "doc_id")
      .withColumn("text", expr(
        // doc_id % n recovers the replica tag (doc_id = old·n + rep)
        "concat_ws(' ', transform(filter(split(text, ' '), w -> w != ''), " +
          s"w -> concat(w, '_r', doc_id % $n)))"))
      .withColumn("n_chars", length(col("text"))),
      "documents")
    write(scaleKeys(read("embeddings"), "vec_id")
      .withColumn("embedding", expr(
        s"transform(embedding, (x, i) -> IF(i = 0, " +
          s"CAST(x + (vec_id % $n) * 0.001 AS FLOAT), x))")),
      "embeddings")

    println(s"replicated $src -> $dst x$n")
    spark.stop()
  }
}
