package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configs this engine assumes.
  *
  * Local mode stands in for a real cluster: we size shuffle partitions to the
  * local parallelism (not the 200 default), enable AQE so skewed shuffles and
  * undersized partitions re-plan at runtime, and keep the session timezone
  * pinned to UTC so results hash-match the DuckDB oracle.
  *
  * At 100 TB these same settings translate directly: AQE coalescing +
  * skew-join splitting are the knobs that keep a 1000-executor shuffle
  * healthy, and `autoBroadcastJoinThreshold` governs dim-table broadcasts
  * (region/nation/customer-sized sides never shuffle).
  */
object GraftSession {
  def builder(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      : SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE coalescing keeps its defaults: an A/B at sf0.1 (round 14)
      // measured a session-wide minPartitionSize=64k floor helping the
      // few CPU-dense verify stages (q231 1.10 vs 4.21 s) but REGRESSING
      // the many iterative/multi-stage queries (q124 2.5→4.5 s,
      // q263 1.6→3.3 s — more tasks per stage × many stages). The
      // CPU-dense spots carry an explicit repartition instead (see
      // TextQueries.weightedJaccardPairsDf et al.).
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
      // runtime row-level filtering: build a bloom filter from the small
      // side of a shuffle join and push it into the large side's scan —
      // at 100 TB this prunes fact-table IO before the shuffle
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed-table warehouse (q54): keep catalog data under target/
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
