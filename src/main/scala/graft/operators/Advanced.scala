package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Second wave of relational breadth: analytic window functions, grouping
  * sets, range joins, correlated subqueries, bucketed co-located joins,
  * deterministic argmin/argmax, histograms, multi-format source/sink round
  * trips, and edit-distance fuzzy matching. Every query is oracle-checked
  * against DuckDB; transparency rewrites (bucketing, round trips) use the
  * plain formulation as their oracle, proving the physical rewrite doesn't
  * change semantics. */
object Advanced {
  import Tables._

  /** Analytic window battery over per-customer order history: lag/lead,
    * running sum, moving average — one shuffle on the partition key, all
    * four functions evaluated in a single window pass (same partitioning
    * and ordering ⇒ Catalyst collapses them into one Window operator).
    * Deterministic: ordered by primary key; sampled so the oracle compare
    * stays small. */
  def windowBattery(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val mv = w.rowsBetween(-2, 0)
    val run = w.rowsBetween(Window.unboundedPreceding, 0)
    orders(s, d)
      .filter(col("o_custkey") % 50 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        round(sum(col("o_totalprice")).over(run), 2).as("run_total"),
        round(avg(col("o_totalprice")).over(mv), 4).as("mov_avg3"))
  }

  /** GROUPING SETS: three explicit grouping combinations in one Expand +
    * one aggregation pass (not one scan per set). grouping_id disambiguates
    * subtotal rows from genuine nulls. */
  def groupingSetsAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("revenue"),
        grouping_id().cast("long").as("gid"))

  /** Range (band) join: orders land in price bands via a non-equi BETWEEN
    * join against a tiny in-plan dimension. The dim side broadcasts, so the
    * physical plan is a broadcast nested-loop over 10 rows per order — the
    * right plan for band lookup at any fact-side scale (never shuffle the
    * fact table for a 10-row dim). */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val session = s
    import session.implicits._
    val bands = (0 until 10)
      .map(i => (i.toLong, i * 50000.0, (i + 1) * 50000.0))
      .toDF("band_id", "lo", "hi")
    orders(s, d)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** Correlated scalar subqueries (the SQL surface): per-customer order
    * count and total via subqueries referencing the outer row. Catalyst
    * de-correlates both into left outer joins over pre-aggregated orders —
    * the plan a hand-written join would produce, from declarative SQL. */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("adv_customer")
    orders(s, d).createOrReplaceTempView("adv_orders")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT count(*) FROM adv_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  round(coalesce((SELECT sum(o_totalprice) FROM adv_orders o
        |   WHERE o.o_custkey = c.c_custkey), 0.0), 2) AS total_spent
        |FROM adv_customer c
        |WHERE c_custkey % 10 = 0""".stripMargin)
  }

  /** Bucketed co-located join: both sides are written bucketed (8 buckets,
    * sorted) on the join key, then joined with NO exchange before the join —
    * `.explain` shows sort-merge join over bucketed scans, zero shuffle.
    * This is the 100 TB pattern for repeated fact-fact joins: pay the
    * bucketing once at write time, never shuffle at read time. Oracle = the
    * plain join, proving the physical rewrite transparent. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val suffix = d.replaceAll("[^a-zA-Z0-9]", "_")
    val (lt, ot) = (s"graft_li_b$suffix", s"graft_o_b$suffix")
    ensureBucketed(s, lt, "l_orderkey",
      lineitem(s, d).select(col("l_orderkey"), col("l_quantity")),
      sourceFingerprint(s, d, "lineitem.parquet"))
    ensureBucketed(s, ot, "o_orderkey",
      orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
      sourceFingerprint(s, d, "orders.parquet"))
    s.table(lt)
      .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("total_qty"))
  }

  /** mtime+length of the source file — cheap invalidation key for derived
    * bucketed layouts (same contract a table format's snapshot id serves
    * at cluster scale). */
  private def sourceFingerprint(s: SparkSession, d: String, file: String): String = {
    val p = new org.apache.hadoop.fs.Path(d, file)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"${st.getModificationTime}:${st.getLen}"
  }

  /** Create-or-reuse a bucketed table derived from `df`. The expensive
    * clustered write runs only when the source fingerprint changed; a valid
    * on-disk layout from a previous session (in-memory catalog, persistent
    * warehouse dir) is re-registered as an external bucketed table over the
    * existing files — metadata-only, no data rewrite. */
  private def ensureBucketed(s: SparkSession, tbl: String, key: String,
      df: DataFrame, fp: String): Unit = {
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), tbl)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fpFile = new org.apache.hadoop.fs.Path(loc, "_graft_fingerprint")
    val cachedFp =
      if (!fs.exists(fpFile)) None
      else {
        val in = fs.open(fpFile)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim)
        finally in.close()
      }
    if (cachedFp.contains(fp)) {
      if (!s.catalog.tableExists(tbl))
        s.sql(s"CREATE TABLE $tbl (${df.schema.toDDL}) USING parquet " +
          s"CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS " +
          s"LOCATION '${loc.toString}'")
    } else {
      s.sql(s"DROP TABLE IF EXISTS $tbl")
      if (fs.exists(loc)) fs.delete(loc, true)
      // external (explicit path): DROP TABLE leaves the files, so a later
      // session can re-register instead of rewriting
      df.write.mode(SaveMode.Overwrite)
        .option("path", loc.toString)
        .bucketBy(8, key).sortBy(key)
        .format("parquet").saveAsTable(tbl)
      val out = fs.create(fpFile, true)
      try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Time-series gap fill: per-user daily activity with missing days
    * materialized (count 0) and the last seen daily value carried forward.
    * The day spine is generated per user with sequence() — no driver-side
    * calendar, no cross join against a global date dimension — and the
    * forward fill is one last(ignoreNulls) window pass per user. */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"), col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("day_value"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("user_id", "day"), "left_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("filled"),
        last(col("day_value"), ignoreNulls = true).over(w).as("ffill_value"))
  }

  /** Data profiling: per-column row/null/distinct counts and min/max (as
    * strings) for the orders table. Two pieces with different optimal
    * shapes: the mergeable stats (counts, typed min/max) run in ONE
    * Expand-free pass; the exact distinct counts run as a TWO-LEVEL
    * aggregation over stacked (column, value-as-string) pairs — the
    * single-agg multi-count-distinct formulation plans one Expand
    * multiplying every row ×7 through the shuffle and measured 7× slower
    * (5.3 s vs 0.7 s at sf0.1). The string cast is injective for every
    * profiled type (incl. Double.toString), so distinct-on-string equals
    * distinct-on-value; at 100 TB the distincts switch to
    * approx_count_distinct and rejoin the single pass. */
  def columnProfile(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val o = orders(s, d)
    val basicAggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_cnt"),
      min(col(c)).cast("string").as(s"${c}_min"),
      max(col(c)).cast("string").as(s"${c}_max"))) :+
      count(lit(1)).as("n_rows")
    val basic = o.agg(basicAggs.head, basicAggs.tail: _*) // one row
    val distincts = o
      .selectExpr("stack(" + cols.length + ", " +
        cols.map(c => s"'$c', cast($c as string)").mkString(", ") +
        ") as (column_name, v)")
      .filter(col("v").isNotNull)
      .distinct()
      .groupBy(col("column_name")).agg(count(lit(1)).as("n_distinct"))
    // spine of all profiled columns: an all-NULL column has no distinct
    // rows at all and must still profile (n_distinct = 0), not vanish
    import s.implicits._
    val spine = cols.toDF("column_name")
    def pick(sfx: String) = coalesce(cols.map(c =>
      when(col("column_name") === c, col(s"${c}_$sfx"))): _*)
    spine
      .join(distincts, Seq("column_name"), "left_outer")
      .join(broadcast(basic))
      .select(col("column_name"), col("n_rows"),
        pick("cnt").as("n_non_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        pick("min").as("min_value"), pick("max").as("max_value"))
  }

  /** Unpivot (wide → long reshape): per-status counts of three price
    * bands melt into (status, band, n) rows via Dataset.unpivot — the
    * inverse of q46's pivot, one Expand node, no join. */
  def unpivotBands(s: SparkSession, d: String): DataFrame = {
    val wide = orders(s, d).groupBy(col("o_orderstatus"))
      .agg(
        count(when(col("o_totalprice") < 100000, 1)).as("lo"),
        count(when(col("o_totalprice") >= 100000 &&
          col("o_totalprice") < 250000, 1)).as("mid"),
        count(when(col("o_totalprice") >= 250000, 1)).as("hi"))
    wide.unpivot(Array(col("o_orderstatus")),
      Array(col("lo"), col("mid"), col("hi")), "band", "n")
  }

  /** RANGE-frame windows (value-based frames, vs q50's ROWS frames): for
    * each order, aggregates over every order of the same customer whose
    * price is within ±10000 of it — peers by VALUE, not by position —
    * plus a running range-to-current frame. One window pass. */
  def rangeFrameWindows(s: SparkSession, d: String): DataFrame = {
    // SQL window syntax: range boundaries are typed literals there, so the
    // ±10000 offsets coerce cleanly against the double ordering key
    val near = "PARTITION BY o_custkey ORDER BY o_totalprice " +
      "RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING"
    val upTo = "PARTITION BY o_custkey ORDER BY o_totalprice " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    orders(s, d)
      .filter(col("o_custkey") % 40 === 0)
      .selectExpr("o_custkey", "o_orderkey",
        "round(o_totalprice, 2) AS price",
        s"count(1) OVER ($near) AS n_near",
        s"round(avg(o_totalprice) OVER ($near), 4) AS avg_near",
        s"count(1) OVER ($upTo) AS n_cheaper_eq",
        s"round(min(o_totalprice) OVER ($upTo), 2) AS min_price")
  }

  /** Correlated LATERAL subquery (SQL surface): per-customer top-2 orders
    * via `, LATERAL (... ORDER BY ... LIMIT 2)` — the dependent-join form
    * of per-key top-k. Catalyst decorrelates it into a ranked window under
    * the hood (same plan family as q15), so the SQL ergonomics cost
    * nothing at scale. */
  def lateralTopK(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_lat_orders")
    customer(s, d).createOrReplaceTempView("graft_lat_customer")
    s.sql("""
      SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
      FROM graft_lat_customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM graft_lat_orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey % 10 = 0""")
  }

  /** Outer-join matrix: customers vs their big-ticket orders through a
    * FULL OUTER join, classified into matched / left-only / right-only —
    * the null-extension semantics the inner/semi/anti battery doesn't
    * exercise. (Right-only rows exist because the customer side is
    * filtered to a subset.) */
  def outerJoins(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = orders(s, d).filter(col("o_totalprice") > 250000)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        when(col("c_custkey").isNotNull && col("o_custkey").isNotNull,
          "both")
          .when(col("c_custkey").isNotNull, "customer_only")
          .otherwise("order_only").as("side"),
        coalesce(col("c_mktsegment"), lit("?")).as("seg"))
      .groupBy(col("side"), col("seg"))
      .agg(count(lit(1)).as("n"))
  }

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL): duplicate
    * multiplicity must follow min/difference-of-multiplicities rules, not
    * the set forms' dedup. */
  def bagSetOps(s: SparkSession, d: String): DataFrame = {
    val hi = orders(s, d).filter(col("o_totalprice") > 150000)
      .select(col("o_custkey"))
    val lo = orders(s, d).filter(col("o_totalprice") <= 150000)
      .select(col("o_custkey"))
    hi.intersectAll(lo).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      .unionByName(
        hi.exceptAll(lo).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all")))
  }

  /** Native session windows: Spark's `session_window` operator (dynamic
    * gap-merged windows inside the aggregation, a dedicated
    * SessionWindow plan node) must agree with the lag+running-sum
    * window-function formulation (q38) — the oracle is that same
    * declarative computation. Session start = first event; end here is
    * max event time (session_window's own `end` is last+gap by
    * definition, so the query aggregates max(ts) instead of reading it). */
  def sessionWindowAgg(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"), col("ts"), unix_millis(col("ts")).as("ts_ms"))
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start_ms"),
        col("session_end_ms"), col("n_events"))

  /** Statistical aggregate battery: sample stddev/variance, correlation,
    * covariance, and least-squares regression (slope/intercept) per
    * status group — the numeric-analysis aggregates the arithmetic
    * batteries don't cover. All partial-aggregatable (Welford-style
    * merge states), so one shuffle of constant-size state per group. */
  def statsBattery(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(stddev_samp(col("o_totalprice")), 4).as("sd"),
        round(var_samp(col("o_totalprice")) / 1e6, 4).as("var_m"),
        round(corr(col("o_totalprice"), col("o_custkey")), 6).as("r"),
        round(covar_samp(col("o_totalprice"), col("o_custkey")) / 1e6, 4)
          .as("cov_m"),
        round(regr_slope(col("o_totalprice"), col("o_custkey")), 6)
          .as("slope"),
        round(regr_intercept(col("o_totalprice"), col("o_custkey")), 4)
          .as("intercept"))

  /** Typed regex extraction: parse the numeric id out of a formatted code
    * column and aggregate by it — schema-on-read for string-encoded keys. */
  def regexExtractAgg(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(regexp_extract(col("p_brand"), "Brand#(\\d+)", 1)
        .cast("int").as("brand_num"), col("p_retailprice"))
      .groupBy(col("brand_num"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("p_retailprice")), 2).as("avg_price"))

  /** Deterministic argmax/argmin per group: the order carrying each status's
    * highest/lowest price. max_by/min_by with a composite ordering struct
    * ((price, orderkey)) — partial-aggregatable (one shuffled row per group
    * per mapper), unlike the window formulation, and deterministic under
    * price ties. */
  def minMaxBy(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("max_order"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("min_order"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(min(col("o_totalprice")), 2).as("min_price"))

  /** Fixed-width histogram: one partial-aggregated pass, bucket =
    * floor(value/width) — the scalable histogram (no sort, no per-value
    * shuffle; bucket cardinality is bounded by the value range). */
  def histogram(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Multi-format source/sink round trip: the same sampled projection is
    * written as JSON lines, headered CSV, and ORC, read back with an
    * explicit schema, and re-aggregated per format. The oracle is the
    * direct aggregation — three identical rows prove every write/read pair
    * lossless (long/double/string typed columns survive all three codecs). */
  def formatRoundtrip(s: SparkSession, d: String): DataFrame = {
    val base = "/root/repo/target/tmp/roundtrip"
    val sample = orders(s, d).filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    sample.write.mode(SaveMode.Overwrite).json(s"$base/json")
    sample.write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$base/csv")
    sample.write.mode(SaveMode.Overwrite).orc(s"$base/orc")
    val back = Seq(
      "json" -> s.read.schema(schema).json(s"$base/json"),
      "csv" -> s.read.schema(schema).option("header", "true")
        .csv(s"$base/csv"),
      "orc" -> s.read.schema(schema).orc(s"$base/orc"))
    back.map { case (fmt, df) =>
      df.agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(lit(fmt).as("fmt"), col("n"), col("total"))
    }.reduce(_ unionAll _)
  }

  /** Date/time function battery: extraction, truncation, month-end, ISO
    * weekday, day arithmetic, month arithmetic — the temporal scalar
    * surface, each mirrored exactly in the oracle (weekday normalized to
    * Monday=0 on both engines). */
  def datetimeBattery(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") % 20 === 0)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
      .select(col("o_orderkey"), col("d"),
        year(col("d")).as("yr"),
        quarter(col("d")).as("qtr"),
        month(col("d")).as("mo"),
        trunc(col("d"), "month").as("month_start"),
        last_day(col("d")).as("month_end"),
        weekday(col("d")).as("wd"),
        datediff(lit("1995-06-01").cast("date"), col("d")).as("days_to_mid95"),
        add_months(col("d"), 3).as("plus3m"))

  /** String function battery: case, substring, reverse, padding,
    * translation, field splitting, replacement, concatenation — all
    * codegen'd built-ins over one projection. */
  def stringBattery(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        reverse(col("p_name")).as("rev_name"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"),
        translate(col("p_name"), "aeiou", "AEIOU").as("trans_name"),
        split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))

  /** Null-handling battery: NULLIF/COALESCE fallback chains, bounded values
    * via GREATEST/LEAST, CASE-produced nulls — the three-valued-logic
    * surface. */
  def nullBattery(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER"))
          .as("seg"),
        round(greatest(col("c_acctbal"), lit(0.0)), 2).as("bal_floor"),
        round(least(col("c_acctbal"), lit(1000.0)), 2).as("bal_cap"),
        when(col("c_acctbal") < 0, lit(null).cast("double"))
          .otherwise(round(col("c_acctbal"), 2)).as("pos_bal"))

  /** Stratified deterministic sampling: top-N documents per language by a
    * cross-engine-stable pseudo-random order (md5 of the id) — the
    * reproducible "sample k per stratum" every training-data pipeline
    * needs. One shuffle on the stratum key; no RNG, so any engine (and any
    * rerun) draws the same sample. */
  def stratifiedSample(s: SparkSession, d: String, perStratum: Int = 20)
      : DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    documents(s, d)
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perStratum)
      .select(col("lang"), col("doc_id"), col("rk").cast("int").as("rk"))
  }

  /** Token-budget shard packing: assign documents (in deterministic doc_id
    * order) to training shards of ~`budget` tokens via a DISTRIBUTED prefix
    * sum — range-repartition by id, local running sums per partition, a
    * tiny per-partition offset table (P rows) broadcast back, global prefix
    * = offset + local. A bare global-order window would drag the whole
    * corpus into one partition; this two-pass form is how running totals
    * scale to 100 TB. Output is the shard manifest (docs + tokens per
    * shard). */
  def shardPack(s: SparkSession, d: String, budget: Long = 10000L)
      : DataFrame =
    shardPackDf(s, documents(s, d).select(col("doc_id"), col("text")), budget)

  /** Same, over any (doc_id, text) frame — shared by the driver query and
    * the scale probe, so what the probe measures IS the production path. */
  def shardPackDf(s: SparkSession, docs: DataFrame, budget: Long = 10000L)
      : DataFrame = {
    val t = docs.select(col("doc_id"),
      graft.functions.TextAnalysis.tokenCount(col("text")).as("ntok"))
    GlobalOrder.runningSums(t, Seq(col("doc_id")), Seq("cum" -> col("ntok")))
      .withColumn("cum_before", col("cum") - col("ntok"))
      .withColumn("shard",
        floor(col("cum_before") / lit(budget.toDouble)).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("shard_tokens"))
  }

  /** Fixed context length for [[packContexts]] — the training-example
    * window the packed token stream is cut into. */
  val ContextLen = 512L

  /** GPT-style concat-and-split sequence packing: documents concatenate
    * (in deterministic doc_id order, one EOS token after each) into a
    * single token stream that is cut every [[ContextLen]] tokens into
    * training examples — documents STRADDLE example boundaries, the
    * complement of q64's whole-doc shard binning and q252's within-doc
    * chunking. Output is the dataloader manifest: where each document's
    * tokens land (first example, offset within it, how many examples it
    * spans).
    *
    * Everything is exact integer arithmetic off ONE distributed prefix
    * sum ([[GlobalOrder.runningSums]] — range-partitioned two-level, no
    * global window), so the manifest is deterministic and the whole
    * query is one scan + the P-row offset broadcast: the shape that
    * holds at 100 TB because a running total is the ONLY cross-row
    * dependency packing has. Empty documents are excluded up front
    * (they contribute no tokens; an EOS for a tokenless doc is a
    * formatting choice this contract does not spend). */
  def packContexts(s: SparkSession, d: String): DataFrame =
    packContextsDf(documents(s, d).select(col("doc_id"), col("text")))

  def packContextsDf(docs: DataFrame, len: Long = ContextLen)
      : DataFrame = {
    require(len >= 1, "context length must be positive (len div/% below)")
    val t = docs.select(col("doc_id"),
      graft.functions.TextAnalysis.tokenCount(col("text")).as("ntok"))
      .filter(col("ntok") >= 1)
    GlobalOrder.runningSums(t, Seq(col("doc_id")),
        Seq("cum" -> (col("ntok") + lit(1L))))
      .withColumn("cum_before", col("cum") - col("ntok") - lit(1L))
      // long, matching the oracle's BIGINT len() (size() is int)
      .select(col("doc_id"), col("ntok").cast("long").as("ntok"),
        expr(s"cum_before div $len").as("first_example"),
        (col("cum_before") % lit(len)).as("offset_in_example"),
        (expr(s"(cum_before + ntok - 1) div $len") -
          expr(s"cum_before div $len") + lit(1L)).as("n_examples"))
      .withColumn("crosses", col("n_examples") > 1L)
  }

  /** Context-packing efficiency audit — the utilization report behind
    * choosing q258's concat-and-split over per-document padding: for a
    * fixed context length, how many training examples does each
    * strategy emit, and how many context slots does each waste?
    * Concat-and-split wastes at most one partial final example
    * (len−1 slots corpus-WIDE); pad-to-context wastes the tail of
    * every document (≈ len/2 slots PER DOC) — the ratio is the
    * GPU-hours argument for packing, and pipeline owners re-check it
    * whenever the length distribution shifts (mixture change, chunking
    * upstream). All columns are exact integers off ONE partial-
    * aggregated token-count pass (no GlobalOrder needed — only totals
    * matter, not per-doc offsets); the two ratios divide at the edge
    * and round to 6. */
  def packEfficiency(s: SparkSession, d: String,
      len: Long = ContextLen): DataFrame = {
    require(len >= 1, "context length must be positive")
    documents(s, d)
      .select(graft.functions.TextAnalysis.tokenCount(col("text"))
        .cast("long").as("ntok"))
      .filter(col("ntok") >= 1)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok") + lit(1L)).as("stream_tokens"),
        // pad-to-context: ⌈(ntok+1)/len⌉ examples per doc, exactly
        sum(expr(s"(ntok + $len) div $len")).as("padded_examples"))
      .select(lit(len).as("context_len"), col("n_docs"),
        col("stream_tokens"),
        expr(s"(stream_tokens + ${len - 1}) div $len")
          .as("packed_examples"),
        col("padded_examples"))
      .select(col("context_len"), col("n_docs"), col("stream_tokens"),
        col("packed_examples"), col("padded_examples"),
        (col("packed_examples") * lit(len) - col("stream_tokens"))
          .as("packed_waste"),
        (col("padded_examples") * lit(len) - col("stream_tokens"))
          .as("padded_waste"),
        round(lit(1.0) - col("packed_examples") /
          col("padded_examples").cast("double"), 6)
          .as("example_savings"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any 8-token
    * window with a (small, deterministic) benchmark set — the screening
    * stage that keeps eval data out of training corpora. 8-grams are built
    * PER ROW (transform over positions, one pass, no window/shuffle). The
    * broadcast-join shape assumes the BENCHMARK side is small — true for
    * real eval suites (fixed, thousands of docs), and enforced here by a
    * hard id cap on the stand-in slice so the broadcast stays bounded no
    * matter how large the corpus grows; only the corpus side scales, and
    * it is scanned exactly once. Reports shared n-gram and benchmark-doc
    * counts per contaminated document. */
  val BenchIdCap = 3500L

  def contamination(s: SparkSession, d: String): DataFrame = {
    val grams = documents(s, d)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 8)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 7),
          i => concat_ws(" ", slice(col("toks"), i, lit(8))))).as("g"))
      .distinct()
    val isBench = col("doc_id") % 7 === 0 && col("doc_id") < BenchIdCap
    val bench = grams.filter(isBench)
      .select(col("doc_id").as("bdoc"), col("g"))
    val corpus = grams.filter(!isBench)
    corpus.join(broadcast(bench), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared"),
        countDistinct(col("bdoc")).as("n_bench_docs"))
  }

  /** Benchmark DECONTAMINATION at corpus scale: q69 reports the overlap;
    * this produces the cleaned corpus (per-source doc/token counts of
    * everything with NO shared 8-gram), with a bloom filter over the
    * (hashed) benchmark grams pruning the corpus-gram stream BEFORE the
    * exact verify join — q103's sketch-then-verify shape applied to
    * decontamination. Bloom filters have no false negatives, so a gram
    * that doesn't hit is PROVABLY clean and never shuffles; hits (the
    * contaminated sliver + ~1% false positives) are verified exactly
    * against the broadcast benchmark set, which is what keeps the result
    * identical to the plain exact anti join the oracle runs. At 100 TB
    * the probe is the difference between shuffling every corpus gram and
    * shuffling ~none of them. */
  def bloomDecontaminate(s: SparkSession, d: String): DataFrame = {
    val t = documents(s, d)
      .select(col("doc_id"), col("source"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
    val isBench = col("doc_id") % 7 === 0 && col("doc_id") < BenchIdCap
    val grams = t.filter(size(col("toks")) >= 8)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 7),
          i => concat_ws(" ", slice(col("toks"), i, lit(8))))).as("g"))
      .distinct()
    val bench = grams.filter(isBench).select(col("g")).distinct()
      .localCheckpoint()
    val nB = bench.count()
    val corpusGrams = grams.filter(!isBench)
    val contaminated =
      if (nB == 0) corpusGrams.select(col("doc_id")).limit(0)
      else {
        val bloom = bench.select(xxhash64(col("g")).as("h"))
          .stat.bloomFilter("h", math.max(nB, 64), 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        corpusGrams
          .filter(graft.functions.BloomFilterExpressions
            .mightContainLong(xxhash64(col("g")), bos.toByteArray))
          .join(broadcast(bench), Seq("g"), "left_semi")
          .select(col("doc_id")).distinct()
      }
    t.filter(!isBench)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks")).cast("long")).as("n_tokens"))
  }

  /** Mode / conditional-aggregate battery: most-frequent status per
    * priority with a FULLY DETERMINISTIC tie-break (count desc, value
    * asc — built-in mode() leaves ties undefined in both engines, which
    * is why the explicit count+rank form is the oracle-checkable one),
    * alongside count_if / bool_and / bool_or. */
  def modeBattery(s: SparkSession, d: String): DataFrame = {
    val counts = orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"),
        col("o_orderstatus").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp")).orderBy(col("c").desc, col("v"))
    val md = counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("grp"), col("v").as("mode_status"), col("c").as("mode_n"))
    val aggs = orders(s, d)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(count_if(col("o_totalprice") > 200000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_pos"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        count(lit(1)).as("n"))
    aggs.join(md, Seq("grp"))
  }

  /** Array-function battery over token arrays: size, slice, membership,
    * position (normalized to null-when-absent on both engines), sort,
    * distinct, last element — array outputs stringified so the oracle
    * compares scalars. try_element_at (not element_at) so an empty array
    * yields null instead of an ANSI out-of-bounds error. */
  def arrayBattery(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n"),
        concat_ws(",", slice(col("toks"), 1, 3)).as("first3"),
        array_contains(col("toks"), "the").as("has_the"),
        nullif(array_position(col("toks"), "the"), lit(0L)).cast("int")
          .as("the_pos"),
        concat_ws(",", slice(sort_array(col("toks")), 1, 2)).as("sorted2"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        try_element_at(col("toks"), lit(-1)).as("last_tok"))

  /** Exact percentiles per group (q39 is global-only): the per-key
    * distribution summary. At 100 TB the drop-in is approx_percentile
    * (t-digest, fixed memory — spec-checked against exact within
    * tolerance); exact here because the oracle compares values. */
  def percentileGroups(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"),
        count(lit(1)).as("n"))

  /** Event funnel: view → click → purchase, each stage strictly after the
    * user's entry into the previous one. Three aggregation stages, each
    * joining the (small, one-row-per-user) previous stage back to events —
    * the standard scalable funnel shape (no per-user event sorting, no
    * window over the full stream). */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ms"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ms")).as("v_ms"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ms") > col("v_ms"))
      .groupBy(col("user_id")).agg(min(col("ms")).as("c_ms"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ms") > col("c_ms"))
      .groupBy(col("user_id")).agg(min(col("ms")).as("p_ms"))
    val session = s
    import session.implicits._
    Seq(("1_view", v), ("2_view_click", c), ("3_view_click_purchase", p))
      .map { case (stage, df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).as("stage"), col("n_users"))
      }
      .reduce(_ unionAll _)
  }

  /** Cohort retention: users grouped by first-seen day, activity counted
    * per day offset (0..7). Two shuffles: first-day per user, then the
    * (cohort, offset) distinct-user count. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    e.join(firstDay, Seq("user_id"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Hopping (sliding) event-time windows: 1-hour windows every 30 minutes
    * — each event lands in exactly two overlapping windows. Spark's
    * `window()` generates the window set in-plan (an Expand, ×2 rows, then
    * one partial-aggregated shuffle); the same plan runs unchanged as a
    * watermarked streaming aggregation. Window starts surface as epoch
    * millis for cross-engine hashing. */
  def hoppingWindows(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(unix_millis(col("window.start")).as("ws_ms"),
        col("event_type"), col("n"), col("total_value"))

  /** Cumulative distinct users by day WITHOUT a running set: a user counts
    * from their first-seen day onward, so cumulative-distinct = running sum
    * of first-seen counts — two partial-aggregated shuffles plus a window
    * over the (tiny) per-day frame. The scalable form of "DAU-to-date"
    * (a naive windowed COUNT(DISTINCT) is not partial-aggregatable at all). */
  def cumulativeUsers(s: SparkSession, d: String): DataFrame = {
    val firstDay = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val perDay = firstDay.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perDay.withColumn("cum_users", sum(col("new_users")).over(w))
  }

  /** Rank-function battery: rank / dense_rank / percent_rank / cume_dist
    * over a REAL-ties ordering (price bucket — tie-stable functions), plus
    * ntile over a total order (ntile is position-based, so cross-engine
    * determinism requires a tie-free ordering). */
  def rankBattery(s: SparkSession, d: String): DataFrame = {
    val wTies = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("bucket").desc)
    val wTotal = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .filter(col("o_custkey") % 25 === 0)
      .withColumn("bucket", floor(col("o_totalprice") / 100000).cast("long"))
      .select(col("o_orderkey"), col("o_orderstatus"), col("bucket"),
        rank().over(wTies).cast("int").as("rk"),
        dense_rank().over(wTies).cast("int").as("drk"),
        round(percent_rank().over(wTies), 6).as("prk"),
        round(cume_dist().over(wTies), 6).as("cd"),
        ntile(4).over(wTotal).cast("int").as("quartile"))
  }

  /** Exponentially-weighted moving average of event values per user — an
    * order-dependent recursive fold, which no built-in window aggregate
    * expresses. Events collect per user (bounded: one user's history),
    * sort by (time, value), and fold e ← α·v + (1−α)·e seeded with the
    * first value. The fold arithmetic and ordering are replicated exactly
    * in the oracle (DuckDB list_reduce seeds with the first element), so
    * doubles match bit-for-bit before rounding. */
  def ewmaPerUser(s: SparkSession, d: String, alpha: Double = 0.3)
      : DataFrame = {
    val vs = transform(
      sort_array(collect_list(struct(col("ms"), col("v")))),
      x => x.getField("v"))
    events(s, d)
      .select(col("user_id"), unix_millis(col("ts")).as("ms"),
        col("value").as("v"))
      .groupBy(col("user_id"))
      .agg(vs.as("vs"))
      .select(col("user_id"), size(col("vs")).as("n_events"),
        round(aggregate(
          slice(col("vs"), lit(2), greatest(size(col("vs")) - 1, lit(0))),
          element_at(col("vs"), 1),
          (acc, v) => lit(alpha) * v + lit(1 - alpha) * acc), 4).as("ewma"))
  }

  /** Edit-distance fuzzy matching over a deterministic sample: name pairs
    * within 2 edits — via a LOSSLESS pigeonhole segment-signature
    * equi-join (PassJoin, Li et al. 2011), not an all-pairs loop.
    *
    * Why the old shape was wrong at scale: `a.join(broadcast(b),
    * key_a < key_b)` is a broadcast nested-loop — O(n²) levenshtein
    * calls AND a corpus-proportional broadcast side (the ×16 bench
    * convicted it: 29× time for 16× data).
    *
    * Pigeonhole (lossless): split every name of length n into
    * k = maxDist+1 contiguous segments (segment i spans
    * [⌊i·n/k⌋+1, ⌊(i+1)·n/k⌋]). An alignment with ≤ maxDist edits
    * leaves at least one segment UNTOUCHED, and an untouched segment
    * appears VERBATIM in the partner at a start position shifted by at
    * most the number of indels before it (≤ maxDist). So every
    * qualifying pair is found by equi-joining one side's segments
    * against the other side's same-length substrings, filtered by
    * |len_a − len_b| ≤ maxDist (edit distance bounds length drift) and
    * |pos − start| ≤ maxDist (the shift bound). Candidates dedup, then
    * rescore with EXACT levenshtein — output identical to the naive
    * join (the oracle stays the brute-force cross join).
    *
    * Scale shape: the index side emits k rows per name; the probe side
    * emits the MULTI-MATCH-AWARE substring set — for each partner
    * length l ∈ [n−maxDist, n+maxDist] and slot i, only the ≤ 2·maxDist+1
    * positions within maxDist of slot i's start (an untouched segment
    * cannot shift further), ≤ k·(2maxDist+1)·(2maxDist+1) slim rows per
    * name. Both sides are linear in the corpus and the join is a
    * shuffle hash join on (segment, partner length, slot) — the
    * position constraint lives in the KEYED generation, so a hot
    * segment string (TPC-H color names share many ⌈n/3⌉-grams) only
    * collides when it sits at the matching slot of a length-compatible
    * partner; pair work scales with true near-match density, never n²
    * (the first cut joined on bare segment content and position-
    * filtered AFTER the join — hot 11-grams made that 14× slower than
    * the broadcast loop it replaced at ×16). Names shorter than k
    * segments (where an empty segment would void the pigeonhole) pair
    * inside a tiny length-bounded arm: their partners are ≤
    * k−1+maxDist chars, a character-alphabet-bounded set at any
    * corpus size. */
  def fuzzyLevenshtein(s: SparkSession, d: String, maxDist: Int = 2)
      : DataFrame =
    fuzzyLevenshteinPairsDf(
      part(s, d).filter(col("p_partkey") % 20 === 0)
        .select(col("p_partkey").as("key"), col("p_name").as("name")),
      maxDist)

  /** [[fuzzyLevenshtein]] over an arbitrary (key, name) frame — exposed
    * for the losslessness spec (equality vs brute force, including
    * sub-k-length names and shifted-segment indel pairs). The PassJoin
    * machinery itself lives in [[FuzzyJoin.editDistancePairs]] (round-9
    * kernel promotion): the measured lessons — the position constraint
    * in the KEYED generation, dedup-first so candidate volume tracks
    * fuzzy structure, the alphabet-bounded tiny arm — are documented
    * there. */
  private[graft] def fuzzyLevenshteinPairsDf(names: DataFrame,
      maxDist: Int): DataFrame =
    FuzzyJoin.editDistancePairs(names, "key", "name", maxDist)

  /** Fuzzy entity linkage over a synthesized noisy contact corpus: the
    * customer phone book plus a deterministic one-character-deletion
    * "typo alias" for every 20th customer (alias keys offset by 10⁷ —
    * far above any replica's key range), joined at edit distance ≤ 1
    * through the [[FuzzyJoin]] kernel. The second production caller
    * the kernel promotion asked for, on a corpus PassJoin is strong
    * at: random digit strings have no corpus-wide hot segments (unlike
    * `Customer#…` names, whose constant first half would funnel every
    * name pair through one slot-0 signature — the q240-class hot-key
    * cliff the kernel scaladoc warns about), so candidates track the
    * planted typo density and the output stays linear in the corpus.
    * maxDist = 1 also exercises the kernel's k = 2 segment split,
    * which q59 (maxDist = 2, k = 3) never touches. Oracle: the same
    * corpus construction in SQL and a brute-force levenshtein join. */
  def fuzzyPhoneLinkage(s: SparkSession, d: String): DataFrame = {
    // the slim synthetic customer table carries no phone column, so the
    // phone book is synthesized from the key with integer arithmetic
    // (the Geo-coordinate / q113-URL pattern — bit-identical in any
    // engine): 15 chars `AA-BBB-CCC-DDDD`, unique per key below 10⁶
    // (first + last group reconstruct the key)
    val phone = expr(
      "concat_ws('-', lpad(CAST((c_custkey div 10000) % 100 AS STRING), 2, '0'), " +
        "lpad(CAST((c_custkey * 313) % 1000 AS STRING), 3, '0'), " +
        "lpad(CAST((c_custkey * 677) % 1000 AS STRING), 3, '0'), " +
        "lpad(CAST(c_custkey % 10000 AS STRING), 4, '0'))")
    val c = Tables.customer(s, d).select(col("c_custkey"),
      phone.as("phone"))
    val base = c.select(col("c_custkey").as("key"), col("phone").as("name"))
    // deletion position from the key (1-based char (key % 12) + 1):
    // deterministic, engine-agnostic integer arithmetic
    val dirty = c.filter(col("c_custkey") % 20 === 0)
      .select((col("c_custkey") + lit(10000000L)).as("key"),
        expr("concat(substr(phone, 1, CAST(c_custkey % 12 AS INT)), " +
          "substr(phone, CAST(c_custkey % 12 + 2 AS INT)))").as("name"))
    FuzzyJoin.editDistancePairs(base.unionByName(dirty), "key", "name", 1)
  }

  // ------------------------------------------------------------------ SCD2

  /** Declarative SCD2 versioning over a change stream: each change row
    * becomes a version valid [its ts, next change's ts) per key; the open
    * version has null valid_to. One window pass. */
  private def scd2Build(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from_ms"), col("event_id"))
    changes.withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(w))
      .withColumn("is_current", col("valid_to_ms").isNull)
  }

  /** SCD2 dimension maintenance, the INCREMENTAL way a warehouse applies
    * it: history built from changes up to a cutoff, then a late batch of
    * updates merged in — untouched keys' history is carried over
    * verbatim (anti join), affected keys are re-versioned from their
    * existing rows plus the updates (semi join + union + re-window). The
    * oracle is the FULL declarative recompute over all changes: the query
    * hash-matching it proves incremental merge == batch recompute, the
    * invariant that makes incremental maintenance trustworthy at 100 TB
    * (where re-versioning only affected keys is the difference between
    * touching gigabytes and touching everything). */
  def scd2Merge(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val changes = events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_millis(col("ts")).as("valid_from_ms"),
        col("event_id"), round(col("value"), 2).as("attr_value"))
    // deterministic cutoff at 80% of the observed time span; an empty
    // change stream has no cutoff and no history — just the (empty) build
    val bounds = changes.agg(min("valid_from_ms"), max("valid_from_ms")).head()
    if (bounds.isNullAt(0)) return scd2Build(changes)
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val cut = mn + (mx - mn) * 4 / 5
    val hist = scd2Build(changes.filter(col("valid_from_ms") <= cut))
    val updates = changes.filter(col("valid_from_ms") > cut)

    val affected = updates.select("user_id").distinct()
    val untouched = hist.join(affected, Seq("user_id"), "left_anti")
    val reVersioned = scd2Build(
      hist.join(affected, Seq("user_id"), "left_semi")
        .select(col("user_id"), col("valid_from_ms"), col("event_id"),
          col("attr_value"))
        .unionByName(updates))
    untouched.unionByName(reVersioned)
  }

  // ------------------------------------------- sweep-line interval overlap

  /** Interval concurrency by sweep line: each purchase event opens a
    * 1-hour interval; for every interval start, how many intervals cover
    * it. The naive formulation is a quadratic range self-join (which IS
    * the oracle, computed independently by DuckDB); the engine runs the
    * O(n log n) sweep — ±1 deltas, collapsed per timestamp, prefix-summed.
    * The prefix sum is the textbook two-level scan, not one global-order
    * window: per-day in-bucket running sums parallelize across
    * partitions, and only the per-day TOTALS (a few thousand rows at any
    * scale) pass through the single-partition running-total window. */
  def intervalConcurrency(s: SparkSession, d: String,
      lenMs: Long = 3600000L): DataFrame =
    intervalConcurrencyDf(events(s, d), lenMs)

  /** Same, over any events-shaped frame — shared with the scale probe so
    * the probe measures the production path. */
  def intervalConcurrencyDf(ev: DataFrame, lenMs: Long = 3600000L)
      : DataFrame = {
    val iv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_millis(col("ts")).as("s"))
      .withColumn("e", col("s") + lenMs)
    val deltas = iv.select(col("s").as("t"), lit(1L).as("delta"))
      .unionByName(iv.select(col("e").as("t"), lit(-1L).as("delta")))
      .groupBy(col("t")).agg(sum(col("delta")).as("delta"))
      .withColumn("bucket", floor(col("t") / 86400000L))
    val inBucket = Window.partitionBy(col("bucket")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val overBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketTotals = deltas.groupBy(col("bucket"))
      .agg(sum(col("delta")).as("btot"))
      .withColumn("offset", coalesce(sum(col("btot")).over(overBuckets),
        lit(0L)))
      .select(col("bucket"), col("offset"))
    val conc = deltas
      .withColumn("prefix", sum(col("delta")).over(inBucket))
      .join(broadcast(bucketTotals), Seq("bucket"))
      .select(col("t"), (col("prefix") + col("offset")).as("concurrency"))
    iv.join(conc, iv("s") === conc("t"))
      .select(col("event_id"), col("s").as("start_ms"),
        col("concurrency").cast("int").as("n_overlap"))
  }

  // ------------------------------------------------------------- skyline

  /** 2D skyline (Pareto front) of orders under (earlier date, lower
    * price): an order survives iff no other order is ≤ on both axes and
    * strictly better on one. The oracle is the quadratic NOT EXISTS; the
    * engine reduces per-date to the min price (same-date domination),
    * then one running-min window over the per-DATE table — thousands of
    * rows regardless of order count, so the unpartitioned window is on
    * the reduced axis, never the data. Exact ties on both axes are
    * mutually non-dominating and all kept, via the final semi join. */
  def skyline(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_custkey") % 5 === 0)
      .select(col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("price"))
    val perDate = o.groupBy(col("o_orderdate"))
      .agg(min(col("price")).as("minp"))
    val w = Window.orderBy(col("o_orderdate"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = perDate.withColumn("rmin", min(col("minp")).over(w))
      .filter(col("rmin").isNull || col("minp") < col("rmin"))
      .select(col("o_orderdate"), col("minp").as("price"))
    o.join(sky, Seq("o_orderdate", "price"), "left_semi")
      .select(col("o_orderkey"), col("o_orderdate"), col("price"))
  }

  // ------------------------------------------- deterministic weighted sample

  /** Weighted Bernoulli sampling with NO RNG: each order is included with
    * probability proportional to its price, decided by comparing a
    * keyed hash (first 8 md5 hex chars of the key — a uniform draw that
    * any engine reproduces bit-exactly) against the weight mapped to the
    * same 8-hex scale. Fully deterministic ⇒ repeatable samples across
    * runs, engines, and partitionings — the property production sampling
    * pipelines need for incremental reprocessing (re-running a shard
    * yields the same sample, so downstream caches stay valid). Pure map
    * work after one broadcast scalar; the fixed-width lowercase-hex
    * comparison IS the numeric comparison. */
  def weightedSample(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    // the global max comes from parquet footer statistics (exact zone
    // maps — a metadata read, no scan job), falling back to a ONE-row
    // driver-side aggregate if any row group lacks stats. Folding the
    // scalar into the scan as a literal keeps the sample a single
    // map-only stage — no broadcast exchange, no join, nothing between
    // the scan and the filter at any data size
    val mx = ParquetStats
      .doubleMax(s, s"$d/orders.parquet", "o_totalprice")
      .orElse(Option(o.agg(max(col("o_totalprice"))).head
        .getAs[java.lang.Double](0)).map(_.doubleValue))
      .getOrElse(1.0) // empty input: no rows to scale, any value works
    o.withColumn("p", col("o_totalprice") / lit(mx))
      .withColumn("h",
        substring(md5(col("o_orderkey").cast("string")), 1, 8))
      .withColumn("thresh", lower(lpad(hex(
        least(floor(col("p") * lit(4294967296.0)), lit(4294967295.0))
          .cast("bigint")), 8, "0")))
      .filter(col("h") < col("thresh"))
      .select(col("o_orderkey"), round(col("p"), 6).as("p"))
  }

  /** Deterministic stratified language rebalancing — the data-mixture
    * step of a multilingual training pipeline: downsample every
    * language to the SMALLEST language's size (rate_l = min_count /
    * count_l), so the surviving mixture is uniform across languages
    * (the corpus is en-heavy by ~3×). Selection reuses
    * [[weightedSample]]'s RNG-free draw: a per-row md5 over
    * (doc_id, lang) compared against the rate mapped to the same
    * 8-hex scale, so the sample is reproducible across runs, engines
    * and partitionings, and re-running one shard yields the same rows
    * (incremental reprocessing stays consistent). The rates come from
    * a languages-sized aggregate (tiny, broadcast); the scan itself is
    * map-only — at 100 TB this is one pass, no shuffle of data rows.
    * Rates are IEEE divisions of exact counts, bit-identical in any
    * engine — no rounding anywhere before the hex threshold. */
  def mixtureRebalance(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_l"))
    val minc = counts.agg(min(col("n_l")).as("minc"))
    val rates = counts.crossJoin(broadcast(minc))
      .select(col("lang"),
        (col("minc").cast("double") / col("n_l")).as("rate"))
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("h", substring(
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("lang"))), 1, 8))
      .withColumn("thresh", lower(lpad(hex(
        least(floor(col("rate") * lit(4294967296.0)),
          lit(4294967295.0)).cast("bigint")), 8, "0")))
      // rate ≥ 1 means "keep everything" — without the bypass, a doc
      // in the smallest language whose md5 prefix is exactly ffffffff
      // would be dropped by the strict compare (a 2⁻³² flake)
      .filter(col("rate") >= 1.0 || col("h") < col("thresh"))
      .select(col("doc_id"), col("lang"))
  }

  /** Train-once half of the frozen-rate rebalance: per-language keep
    * rates (smallest-language parity, the q253 rule) as a driver map —
    * |langs|-bounded collect by construction. */
  def mixtureRates(docs: DataFrame): Map[String, Double] = {
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) Map.empty
    else {
      val minc = counts.values.min.toDouble
      counts.map { case (l, n) => l -> minc / n }
    }
  }

  /** Score-anything half of [[mixtureRebalance]]: the SAME RNG-free
    * md5 draw against a FROZEN rate table entering as a map literal —
    * a stateless scan projection with no corpus aggregate, so the SAME
    * call rebalances a STREAMING frame with no state store (the q257
    * dsirApply / q268 driftApply architecture: estimate rates once on a
    * reference corpus, sample a live stream against them forever). A
    * language absent from the frozen table keeps nothing (rate 0) —
    * fail-closed, matching how a frozen sampling plan treats a slice it
    * never budgeted. Selection is bit-identical to [[mixtureRebalance]]
    * under the same rates (spec-pinned), so re-running any shard —
    * batch or stream — keeps exactly the same rows. */
  def rebalanceApplyDf(docs: DataFrame, rates: Map[String, Double])
      : DataFrame = {
    val keys = rates.keys.toSeq.sorted
    val m = map_from_arrays(
      array(keys.map(lit): _*),
      array(keys.map(k => lit(rates(k))): _*))
    docs
      .withColumn("rate", coalesce(element_at(m, col("lang")), lit(0.0)))
      .withColumn("h", substring(
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("lang"))), 1, 8))
      .withColumn("thresh", lower(lpad(hex(
        least(floor(col("rate") * lit(4294967296.0)),
          lit(4294967295.0)).cast("bigint")), 8, "0")))
      .filter(col("rate") >= 1.0 || col("h") < col("thresh"))
      .select(docs.columns.map(col): _*) // drawn rows, caller's schema
  }

  /** Temperature-smoothed mixture planning with epoch accounting — the
    * run-planning step before any multilingual/multi-source training
    * job: exponent-smoothed sampling shares p_l ∝ n_l^α with α = 0.3
    * (the XLM-R / mBERT smoothing that up-weights low-resource slices
    * without letting them dominate), a token budget T = 4× the corpus
    * (a multi-epoch run), and per-language epoch counts
    * epochs_l = p_l·T / n_l — flagging languages pushed past 4 epochs,
    * the repetition-harm threshold of Muennighoff et al. 2023 ("Scaling
    * Data-Constrained Language Models": value decays rapidly after ~4
    * repeats). This is the planner whose output q253's rebalance and
    * q258's packing consume.
    *
    * Determinism discipline: token counts are exact integers; the
    * budget is an exact integer ×4; pow/division evaluate on exact
    * longs and shares RE-QUANTIZE to 4 dp before every downstream use
    * (the q165 per-round rule), so target/epoch arithmetic sees
    * bit-identical inputs on both engines; the >4 flag compares the
    * ROUNDED epochs value.
    *
    * Scale shape: one per-(lang) token-count aggregate (partial-
    * aggregated, |langs| rows out), a |langs|-row cross join against
    * the one-row total — the whole plan after the scan is metadata-
    * sized. Output grain is |langs|. */
  def mixturePlanner(s: SparkSession, d: String): DataFrame =
    mixturePlannerDf(Tables.documents(s, d)
      .select(col("lang"), col("text")))

  /** [[mixturePlanner]] over an arbitrary (lang, text) frame. */
  def mixturePlannerDf(docs: DataFrame): DataFrame = {
    val tl = docs
      .select(col("lang"),
        size(expr("filter(split(lower(text), ' '), x -> x != '')"))
          .cast("long").as("n"))
      .groupBy(col("lang")).agg(sum(col("n")).as("n_tokens"))
    val tot = tl.agg(sum(col("n_tokens")).as("nn"),
      sum(pow(col("n_tokens").cast("double"), lit(0.3))).as("sp"))
    tl.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_tokens"), (col("nn") * 4).as("budget"),
        round(pow(col("n_tokens").cast("double"), lit(0.3)) / col("sp"), 4)
          .as("share"))
      .select(col("lang"), col("n_tokens"), col("share"),
        round(col("share") * col("budget"), 2).as("target_tokens"),
        round(col("share") * col("budget") / col("n_tokens"), 4)
          .as("epochs"))
      .withColumn("over_four_epochs", col("epochs") > 4.0)
  }

  /** End-to-end corpus curation — the composed form of the curation
    * family, run as ONE query: quality gate (Gopher top-2-gram flag ∥
    * duplicate-token fraction > 0.7 ∥ length < 10, all integer
    * arithmetic — q255's signals) → canonical exact dedup (sorted
    * distinct lower-token set, keep-lowest-id — q25's key) → language
    * mixture rebalance to the smallest surviving language (q253's
    * RNG-free md5 draw). Output is the per-language funnel:
    * raw → quality → unique → kept doc counts plus kept token mass —
    * what a pipeline owner actually monitors.
    *
    * Each stage reuses a gate-proven discipline; the composition adds
    * no new cross-engine hazard (every filter and key is integer/string
    * arithmetic; the single double — the rebalance rate — flows through
    * the q253 idiom unchanged). Scale shape: the signals pass is q255's
    * scan; dedup is one content-keyed shuffle; the rate table is a
    * languages-sized broadcast; the funnel is four partial-aggregated
    * rollups over progressively smaller frames. No pair joins anywhere
    * — the near-dup arm of a production pipeline (LSH, q47) is kept a
    * separate stage precisely because its cost profile differs. */
  def curationPipeline(s: SparkSession, d: String): DataFrame =
    curationPipelineDf(documents(s, d)
      .select(col("doc_id"), col("lang"), col("text")))

  def curationPipelineDf(docs: DataFrame): DataFrame = {
    val n = docs.sparkSession.sessionState.conf.numShufflePartitions
    // Per-doc signals: ONE in-row projection (repetitionSignalsDf),
    // evaluated AFTER an explicit width-pinned exchange and
    // materialized through a narrow checkpoint. Each piece is load-
    // bearing, established by the round-10 ×64 attribution ladder
    // (NOTES_r10): the old aggregate-form signals were ~50 s of the
    // 39.8 s isolated total (token-grain shuffles dominated the whole
    // pipeline); the in-row form is interpreted HOF work whose
    // parallelism tracks SCAN partitions unless exchanged first (the
    // replica parquet reads as 2 splits — the projection re-serializes
    // without the exchange); the explicit count pins the width because
    // AQE coalesces count-less repartitions by SIZE, and this stage is
    // compute-bound, not size-bound; and the checkpoint (narrow:
    // doc_id + four longs + lang) is ALSO the pushdown barrier — the
    // quality filter would otherwise be substituted through the
    // projection and re-evaluate the signal expression against the
    // un-exchanged scan.
    val sig = graft.operators.TextQueries.flattenSignals(
      graft.operators.TextQueries.repetitionSignalsRawDf(
        docs.select(col("doc_id"), col("text"))
          .repartition(n, col("doc_id")))
        .localCheckpoint()) // the pushdown barrier — see raw scaladoc
      .select(col("doc_id"), col("n_tok"), col("n_distinct"),
        col("flagged"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .localCheckpoint()
    val qual = sig
      .filter(col("n_tok") >= 10 && !col("flagged") &&
        !((col("n_tok") - col("n_distinct")) * 10 > col("n_tok") * 7))
      .select(col("doc_id"), col("lang"), col("n_tok"))
    // canonical-dedup winners, own branch: canon computes from a
    // RE-READ of the pruned (doc_id, text) columns (q218's lesson:
    // re-reading pruned parquet beats pinning a corpus-sized frame —
    // the first-shipped form carried canon, a string as large as the
    // text, through the checkpoint), behind the same width-pinned
    // exchange (the canon sort/distinct is interpreted per-doc work
    // too), joined to the survivor ids, flowing straight into its one
    // content-keyed shuffle without ever being materialized.
    val keepIds = docs.select(col("doc_id"), col("text"))
      .repartition(n, col("doc_id"))
      .join(qual.select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id"),
        concat_ws(" ", array_sort(array_distinct(
          expr("filter(split(lower(text), ' '), x -> x != '')"))))
          .as("canon"))
      .groupBy(col("canon"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val uniq = qual.join(keepIds, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tok"))
      .localCheckpoint() // rate table + draw + rollup
    val cnts = uniq.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val minc = cnts.agg(min(col("n_l")).as("minc"))
    val rates = cnts.crossJoin(broadcast(minc))
      .select(col("lang"),
        (col("minc").cast("double") / col("n_l")).as("rate"))
    val kept = uniq.join(broadcast(rates), Seq("lang"))
      .withColumn("h", substring(
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("lang"))), 1, 8))
      .withColumn("thresh", lower(lpad(hex(
        least(floor(col("rate") * lit(4294967296.0)),
          lit(4294967295.0)).cast("bigint")), 8, "0")))
      .filter(col("rate") >= 1.0 || col("h") < col("thresh"))
    // LEFT joins from the raw per-language counts: a language with zero
    // survivors at any stage (every doc fails quality, or the draw kept
    // none) must show 0 in the funnel report — the most interesting row
    // for a pipeline owner — not silently disappear (it would under
    // inner joins). The oracle mirrors the left joins + coalesce.
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
      .join(qual.groupBy(col("lang")).agg(count(lit(1)).as("n_quality")),
        Seq("lang"), "left_outer")
      .join(uniq.groupBy(col("lang")).agg(count(lit(1)).as("n_unique")),
        Seq("lang"), "left_outer")
      .join(kept.groupBy(col("lang")).agg(count(lit(1)).as("n_kept"),
        sum(col("n_tok")).as("tok_kept")), Seq("lang"), "left_outer")
      .select(col("lang"), col("n_raw"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("tok_kept"), lit(0L)).as("tok_kept"))
  }

  /** Quality-filter ablation census — the filter-tuning report behind
    * q259's gate: every document is scored against ALL THREE quality
    * rules independently (Gopher top-2-gram repetition, duplicate-token
    * fraction > 0.7, length < 10 tokens) and the corpus rolls up by
    * (lang, failure mask). A pipeline owner reads the mask census to
    * answer the questions a composed pass-fail funnel cannot: which
    * rule dominates drops in each language, how much drop mass is
    * attributable to exactly one rule (cheap to relax), and how much is
    * multi-rule (robustly bad). Unlike the funnel, NO doc is excluded
    * up front — sub-2-token docs (no bigrams) carry
    * fail_repetition = false and classify by the other rules, so the
    * mask counts partition the raw corpus exactly.
    *
    * All rule compares are the funnel's own integer arithmetic — the
    * census provably describes the same gate it ablates. Scale shape:
    * two per-doc count aggregates (token grain bounded by doc length,
    * partial-aggregated) and one |langs|·2³-grain rollup; no joins
    * besides the doc-keyed signal merge, no windows. */
  def filterAblation(s: SparkSession, d: String): DataFrame =
    filterAblationDf(documents(s, d)
      .select(col("doc_id"), col("lang"), col("text")))

  /** [[filterAblation]] over an arbitrary (doc_id, lang, text) frame.
    *
    * Single-pass form: every per-doc signal computes IN-ROW with array
    * HOFs — n_tok/n_distinct from array sizes, the dominant-bigram
    * count as a run-length fold over the SORTED bigram array (the max
    * run of a sorted multiset IS the max multiplicity) — so the whole
    * census is one scan projection plus the |langs|·2³-grain rollup.
    * The first-shipped form shuffled the corpus at token grain twice
    * (per-doc token and bigram count aggregates); at ×16 that was
    * 9.7 s vs ~2 s for this shape, and at 100 TB the difference is two
    * full-corpus exchanges. Rule arithmetic is unchanged — the same
    * integer compares over the same exact counts, so the output (and
    * the census == funnel consistency the spec pins) is identical. */
  def filterAblationDf(docs: DataFrame): DataFrame = {
    val sig = docs
      .select(col("lang"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
      .select(col("lang"),
        size(col("w")).cast("long").as("n_tok"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        expr(
          // max multiplicity of any bigram: longest equal-run of the
          // sorted bigram array; null-safe <=> keeps the first element
          // starting its own run. The size guard matters: sequence(0,
          // size-2) DESCENDS for sub-2-token docs and element_at(w, 0)
          // would throw under ANSI
          """IF(size(w) >= 2, aggregate(
            |  array_sort(transform(sequence(0, size(w) - 2), i ->
            |    concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))),
            |  named_struct('prev', cast(null as string),
            |               'run', bigint(0), 'mx', bigint(0)),
            |  (acc, x) -> named_struct(
            |    'prev', x,
            |    'run', IF(acc.prev <=> x, acc.run + 1, bigint(1)),
            |    'mx', greatest(acc.mx,
            |      IF(acc.prev <=> x, acc.run + 1, bigint(1)))),
            |  acc -> acc.mx), bigint(0))""".stripMargin).as("max_bg"))
    sig
      .select(col("lang"), col("n_tok").as("nt"),
        (col("n_tok") >= 2 &&
          col("max_bg") * 100 > (col("n_tok") - 1) * 18)
          .as("fail_repetition"),
        (col("n_tok") >= 1 &&
          (col("n_tok") - col("n_distinct")) * 10 > col("n_tok") * 7)
          .as("fail_dupfrac"),
        (col("n_tok") < 10).as("fail_short"))
      .groupBy(col("lang"), col("fail_repetition"), col("fail_dupfrac"),
        col("fail_short"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
  }

  /** Leakage-safe train/val/test split — the eval-hygiene primitive of
    * a training pipeline: the split is a PURE FUNCTION of the GROUP key
    * (user), so every event of a user lands in the same split by
    * construction and train/eval can never share a user. The 80/10/10
    * assignment reuses the RNG-free md5 draw ([[weightedSample]]'s
    * 8-hex scale): reproducible across runs, engines, partitionings,
    * and INCREMENTAL — tomorrow's events of a known user join the same
    * split without consulting any state. Because the split needs no
    * per-user table, there is NO JOIN: it evaluates inline in the event
    * scan, and the whole query is one map + one partial-aggregated
    * rollup. Emits per-split user/event/value rolls plus the
    * no-leakage invariant (splits partition the user universe) as a
    * driver-hashable boolean. */
  def leakageSafeSplit(s: SparkSession, d: String): DataFrame = {
    // fixed-width lowercase hex compares numerically as a string:
    // cccccccc = 0.8·2³², e6666666 ≈ 0.9·2³²
    val h = substring(md5(concat(lit("split:"), col("user_id"))), 1, 8)
    val split = when(h < lit("cccccccc"), "train")
      .when(h < lit("e6666666"), "val")
      .otherwise("test")
    val perSplit = events(s, d)
      .select(split.as("split"), col("user_id"),
        // 2dp-quantize BEFORE the sum and accumulate in DECIMAL:
        // a raw double sum is accumulation-order-dependent across
        // engines, the exact hazard the hash gate exists to catch
        round(col("value"), 2).cast("decimal(18,2)").as("v"))
      .groupBy(col("split"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        round(sum(col("v")).cast("double"), 2).as("total_value"))
    val total = events(s, d)
      .agg(count_distinct(col("user_id")).as("n_all"))
    perSplit.crossJoin(broadcast(total))
      .select(col("split"), col("n_users"), col("n_events"),
        col("total_value"),
        (sum(col("n_users")).over() === col("n_all")).as("no_leakage"))
  }

  // --------------------------------------------------- ordered string agg

  /** LISTAGG / string_agg with a DETERMINISTIC element order: collect_list
    * order is partition-dependent in a distributed engine, so the
    * elements are sorted before joining (zero-padded keys keep the string
    * sort numeric). The cross-engine hash match is only possible because
    * of that explicit ordering — the unordered form isn't a well-defined
    * query. */
  def orderedListAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_custkey") % 500 === 0)
      .groupBy(col("o_custkey"))
      .agg(
        array_join(array_sort(collect_list(
          lpad(col("o_orderkey").cast("string"), 12, "0"))), ",")
          .as("order_keys"),
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        count(lit(1)).as("n"))

  /** TIME-interval RANGE frames (q88's value-range frames on the time
    * axis): per-user trailing-7-day and forward-24-hour windows over
    * event timestamps — the "activity in the last N days as of each
    * event" shape. One window pass per frame direction; peers are
    * determined by timestamp arithmetic, not row position, so ties and
    * irregular sampling behave correctly by construction. */
  def timeRangeFrames(s: SparkSession, d: String): DataFrame = {
    val trail = "PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW"
    val fwd = "PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN CURRENT ROW AND INTERVAL 24 HOURS FOLLOWING"
    events(s, d).filter(col("user_id") % 25 === 0)
      .selectExpr("event_id", "user_id", "unix_millis(ts) AS ts_ms",
        s"count(1) OVER ($trail) AS n_7d",
        s"round(sum(value) OVER ($trail), 2) AS sum_7d",
        s"count(1) OVER ($fwd) AS n_next24h")
  }

  /** FILTER-clause aggregates: per-group conditional aggregation without
    * self-joins or CASE pyramids — each FILTER predicate gates its one
    * aggregate inside the same single pass. */
  def filterClauseAggs(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_fc_orders")
    s.sql("""
      SELECT o_orderpriority,
             count(*) AS n,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
             round(coalesce(sum(o_totalprice)
               FILTER (WHERE o_totalprice > 150000), 0.0), 2) AS big_total,
             round(avg(o_totalprice)
               FILTER (WHERE o_orderdate >= TIMESTAMP '1995-01-01'), 4)
               AS recent_avg
      FROM graft_fc_orders GROUP BY o_orderpriority""")
  }

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys join
    * each other instead of vanishing — the semantics dimension tables
    * with "unknown" buckets need. Hash-joinable like a plain equi key
    * (null is just one more bucket value), unlike a general non-equi
    * condition. */
  def nullSafeJoin(s: SparkSession, d: String): DataFrame = {
    def side(m: Int, alias: String) = orders(s, d)
      .filter(col("o_custkey") % m === 0)
      .select(when(col("o_orderkey") % 97 === 0, lit(null))
        .otherwise(col("o_orderkey") % 50).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as(alias))
    val l = side(3, "nl")
    val r = side(5, "nr")
    l.join(r, l("k") <=> r("k"))
      .select(l("k").as("k"), col("nl"), col("nr"))
  }

  /** Higher-order-function battery: lambda expressions over array columns
    * (transform/filter/exists/forall/aggregate/zip_with) — all evaluated
    * per row inside the scan projection, zero shuffles, no UDFs. These are
    * the per-document primitives a corpus pipeline composes (token
    * re-writes, predicate scans, fold-style stats) without ever exploding
    * the arrays into rows. */
  def hofBattery(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_toks"),
        concat_ws(",", transform(col("toks"), t => upper(t))).as("caps"),
        size(filter(col("toks"), t => length(t) > 5)).as("n_long"),
        exists(col("toks"), t => length(t) > 7).as("has_long"),
        forall(col("toks"), t => t === lower(t)).as("all_lower"),
        aggregate(col("toks"), lit(0),
          (acc, t) => acc + length(t)).as("total_chars"),
        // zip_with pairs each token with its own length-as-string; the
        // oracle reproduces the VALUE with a plain per-element transform
        try_element_at(
          zip_with(col("toks"),
            transform(col("toks"), t => length(t).cast("string")),
            (a, b) => concat(a, lit(":"), b)), lit(1)).as("first_pair"))

  /** Central-moment battery: exact interpolated median plus population
    * skewness and excess kurtosis per group. Spark computes these in ONE
    * streaming pass via co-moment recurrences (partial-aggregatable, no
    * second scan); the oracle reproduces the same population definitions
    * (g1 = m3/m2^1.5, g2 = m4/m2^2 − 3) with an explicit two-pass
    * mean-then-moments formulation — a hash match proves the streaming
    * recurrence agrees with the textbook definition at 6 decimals. */
  def momentsBattery(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(median(col("o_totalprice")), 2).as("med"),
        round(skewness(col("o_totalprice")), 6).as("skew"),
        round(kurtosis(col("o_totalprice")), 6).as("kurt"))

  /** Bitwise aggregate battery: bit_and / bit_or / bit_xor over a derived
    * key — the aggregates behind bitmap-style rollups (permission masks,
    * feature flags, bloom-ish unions) — plus scalar bitwise ops in the
    * scan projection. All partial-aggregatable single-pass built-ins. */
  def bitwiseAggs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderpriority"),
        (col("o_orderkey") % 65536).bitwiseOR(lit(1)).as("k"))
      .groupBy(col("o_orderpriority"))
      .agg(bit_and(col("k")).as("ba"),
        bit_or(col("k")).as("bo"),
        bit_xor(col("k")).as("bx"),
        count(lit(1)).as("n"))

  /** Recursive CTE (WITH RECURSIVE, Spark 4's UnionLoop operator): walk
    * each customer's order chain — first order by date, then repeatedly
    * the next order — accumulating a running total along the path. The
    * chain edges come from a lead() window (acyclic by construction, so
    * UNION ALL recursion terminates at the longest per-customer chain);
    * the oracle is the IDENTICAL recursive SQL in DuckDB. The sequential
    * fold order is the chain order in both engines, so the float running
    * total is bit-stable cross-engine. */
  def recursiveChain(s: SparkSession, d: String): DataFrame = {
    // loop-invariant hoisting: the chain-edge relation (a window over
    // orders) is referenced by EVERY UnionLoop iteration — materialize it
    // once (localCheckpoint) instead of letting each round recompute the
    // scan + window (measured 4.4s → ~1s at sf0.1)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val ch = orders(s, d).filter(col("o_custkey") % 20 === 0)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        row_number().over(w).as("rn"))
      .localCheckpoint()
    ch.createOrReplaceTempView("graft_rc_ch")
    // size-gated broadcast of the chain-edge relation (round 14): every
    // UnionLoop iteration joins the frontier against ch, and with a
    // checkpointed (stats-free) relation the planner sort-merge-joins —
    // re-shuffling ch once per recursion depth (~40 iterations here:
    // the longest per-customer chain). While ch fits, broadcast it so
    // each step is map-side; a corpus whose sampled chain table
    // outgrows the limit falls back to the shuffled join. The count is
    // a cached-block read off the checkpoint.
    val hint =
      if (ch.count() <= 5000000L) "/*+ BROADCAST(c) */ " else ""
    s.sql(s"""
      WITH RECURSIVE
      ch AS (SELECT * FROM graft_rc_ch),
      walk AS (
        SELECT o_custkey, o_orderkey, next_key,
               1 AS step, o_totalprice AS run_total
        FROM ch WHERE rn = 1
        UNION ALL
        SELECT $hint c.o_custkey, c.o_orderkey, c.next_key,
               w.step + 1 AS step, w.run_total + c.o_totalprice AS run_total
        FROM walk w JOIN ch c ON c.o_orderkey = w.next_key
      )
      SELECT o_custkey, o_orderkey, CAST(step AS INT) AS step,
             round(run_total, 2) AS run_total
      FROM walk""")
  }

  /** Categorical-association battery: the event_type × day-of-week
    * contingency table with per-cell chi-square contributions and PMI.
    * One groupBy over the fact stream; both marginals re-aggregate from
    * the 35-row joint table (never a second corpus scan) and broadcast
    * back. The scale shape: contingency analysis over 100 TB is ONE
    * partial-aggregated shuffle of |X|·|Y| cells. */
  def chiSquare(s: SparkSession, d: String): DataFrame = {
    val joint = events(s, d)
      .select(col("event_type"), dayofweek(col("ts")).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("obs"))
    val rowM = joint.groupBy(col("event_type")).agg(sum(col("obs")).as("rn"))
    val colM = joint.groupBy(col("dow")).agg(sum(col("obs")).as("cn"))
    val tot = joint.agg(sum(col("obs")).as("n"))
    // counts go through double BEFORE multiplying: at 100 TB cell×total
    // products overflow int64, and the oracle mirrors the same float path
    joint.join(broadcast(rowM), "event_type")
      .join(broadcast(colM), "dow")
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        col("rn").cast("double") * col("cn") / col("n"))
      .select(col("event_type"), col("dow"), col("obs"),
        round(col("expected"), 4).as("expected"),
        round(pow(col("obs") - col("expected"), 2) / col("expected"), 6)
          .as("chi2_term"),
        round(log2(col("obs").cast("double") * col("n") /
          (col("rn").cast("double") * col("cn"))), 6).as("pmi"))
  }

  /** Median-absolute-deviation outlier screen per group: med, MAD, and
    * the count outside med ± 3·1.4826·MAD (the normal-consistent robust
    * z-score). Two exact-percentile passes (median, then median of
    * |x−med|), stats broadcast — the robust analog of q123's
    * mean/stddev screen, which a single wild value can't poison. */
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    val med = lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
    val mad = lineitem(s, d)
      .join(broadcast(med), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(first(col("med")).as("med"),
        expr("percentile(abs(l_extendedprice - med), 0.5)").as("mad"),
        count(lit(1)).as("n"))
    lineitem(s, d)
      .join(broadcast(mad.select(col("l_returnflag"), col("med"),
        col("mad"))), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(round(first(col("med")), 2).as("med"),
        round(first(col("mad")), 2).as("mad"),
        sum(when(abs(col("l_extendedprice") - col("med")) >
          col("mad") * (3 * 1.4826), 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n"))
  }

  /** Relational division: customers whose orders span EVERY order
    * priority (the "suppliers who stock all parts" classic). The
    * scalable form is count-distinct-equals-universe — one aggregation,
    * universe size broadcast — rather than the textbook double NOT
    * EXISTS, which plans as a nested correlated anti join. The oracle
    * runs the SAME count form in DuckDB (q53 already pins correlated
    * de-correlation; this pins the division rewrite). */
  def relationalDivision(s: SparkSession, d: String): DataFrame = {
    val universe = orders(s, d)
      .agg(count_distinct(col("o_orderpriority")).as("u"))
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count_distinct(col("o_orderpriority")).as("np"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(universe))
      .filter(col("np") === col("u"))
      .select(col("o_custkey"), col("n_orders"))
  }

  /** EXACT distinct-user counts per segment via BITMAP aggregation: each
    * user sets one bit in a 64-bit chunk keyed by user_id div 64; chunks
    * bit_or-combine (associative ⇒ full map-side partial aggregation),
    * and popcounts sum per segment. Two cheap aggregations replace a
    * shuffle-heavy count_distinct over raw IDs: the shuffled volume is
    * the BITMAP (one long per 64-id block per segment), not the ID
    * stream — the roaring-bitmap idea in plain SQL types. Exact, unlike
    * the HLL path (q48/q116). */
  def bitmapDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        expr("user_id div 64").as("chunk"),
        expr("shiftleft(1L, CAST(user_id % 64 AS INT))").as("m"))
      .groupBy(col("event_type"), col("chunk"))
      .agg(expr("bit_or(m)").as("bm"))
      .groupBy(col("event_type"))
      .agg(sum(bit_count(col("bm"))).as("n_users"))

  /** Two-way additive seasonal decomposition of the event value series:
    * expected(hour-of-day h, day-of-week w) = global + (hod_h − global) +
    * (dow_w − global); residual = value − expected. Three broadcast-sized
    * aggregate tables (24 + 7 + 1 rows) from ONE scan each of the fact
    * column, joined back map-side — the seasonal-adjustment prefilter a
    * metrics pipeline runs before anomaly detection, with no per-row
    * window anywhere. */
  def seasonalDecompose(s: SparkSession, d: String): DataFrame = {
    val base = events(s, d)
      .select(col("event_id"), col("value"),
        hour(col("ts")).as("hod"), dayofweek(col("ts")).as("dow"))
    val hodM = base.groupBy(col("hod")).agg(avg(col("value")).as("hm"))
    val dowM = base.groupBy(col("dow")).agg(avg(col("value")).as("wm"))
    val g = base.agg(avg(col("value")).as("gm"))
    base.filter(col("event_id") % 13 === 0)
      .join(broadcast(hodM), "hod")
      .join(broadcast(dowM), "dow")
      .crossJoin(broadcast(g))
      .select(col("event_id"), col("hod"), col("dow"),
        round(col("hm") + col("wm") - col("gm"), 4).as("expected"),
        round(col("value") - (col("hm") + col("wm") - col("gm")), 4)
          .as("residual"))
  }

  /** Time-constrained funnel: first view → first click within 24 h of
    * that view → first purchase within 24 h of that click, per user.
    * Computed in ONE pass: each user's events collapse to an ordered
    * array and a lambda `aggregate` runs the 3-state machine over it —
    * one shuffle, one scan, state O(1) per user. The oracle computes the
    * same stages as three join+min passes (the formulation that rescans
    * the fact table per stage), so the hash match proves the state
    * machine against the declarative form. q66 is the unconstrained
    * ordered funnel; the deadline arithmetic is what that can't say. */
  def timedFunnel(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("event_type")).as("e"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .withColumn("st", expr(
        """aggregate(evs,
             named_struct('v', CAST(NULL AS TIMESTAMP),
                          'c', CAST(NULL AS TIMESTAMP),
                          'p', CAST(NULL AS TIMESTAMP)),
             (s, e) -> named_struct(
               'v', if(s.v IS NULL AND e.event_type = 'view', e.ts, s.v),
               'c', if(s.c IS NULL AND s.v IS NOT NULL
                       AND e.event_type = 'click' AND e.ts > s.v
                       AND e.ts <= s.v + INTERVAL 24 HOURS, e.ts, s.c),
               'p', if(s.p IS NULL AND s.c IS NOT NULL
                       AND e.event_type = 'purchase' AND e.ts > s.c
                       AND e.ts <= s.c + INTERVAL 24 HOURS, e.ts, s.p)))"""))
      .filter(col("st.v").isNotNull)
      .select(col("user_id"), unix_micros(col("st.v")).as("v_us"),
        unix_micros(col("st.c")).as("c_us"),
        unix_micros(col("st.p")).as("p_us"))

  /** Gaps-and-islands: per-user consecutive-day activity streaks via the
    * date − row_number() trick (consecutive days share an anchor date),
    * then one aggregation over (user, island). Two window passes on the
    * same partition key = one shuffle; a streak of any length costs the
    * same as a gap. Emits per user: active days, island count, longest
    * streak. */
  def activityStreaks(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("anchor",
        date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"))
  }

  /** Positional window-function battery — nth_value, first/last_value
    * with explicit full frames, IGNORE NULLS navigation, and
    * default-bearing lag/lead (the navigation surface q50's running/
    * moving battery doesn't touch). All functions share one partition
    * key and ordering, so Catalyst folds them into a single Window
    * operator: one shuffle, one sort. */
  def nthValueBattery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    orders(s, d)
      .filter(col("o_custkey") % 40 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        round(nth_value(col("o_totalprice"), 2).over(w), 2).as("nv2"),
        round(first(when(col("o_orderkey") % 3 =!= 0, col("o_totalprice")),
          ignoreNulls = true).over(w), 2).as("fv_nn"),
        round(last(col("o_totalprice")).over(full), 2).as("lv"),
        round(lag(col("o_totalprice"), 1, -1.0).over(w), 2).as("lag_def"),
        round(lead(col("o_totalprice"), 2, -1.0).over(w), 2).as("lead_def"))
  }

  /** Rolling 7-day active users (WAU) per day, EXACT. The scalable shape
    * explodes each (user, active-day) into the ≤7 window-days it
    * contributes to and runs ONE distinct-count aggregation — shuffle
    * volume 7×|user-days|, no per-day range self-join (which re-scans
    * the activity table once per window position), no giant window
    * state. Days past the observed max are clipped so every reported
    * window is fully inside the data. */
  def rollingWau(s: SparkSession, d: String): DataFrame = {
    val userDays = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val maxDay = userDays.agg(max(col("day")).as("mx"))
    userDays
      .select(col("user_id"),
        explode(expr("sequence(0, 6)")).as("i"), col("day"))
      .select(col("user_id"), expr("date_add(day, i)").as("day"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("mx"))
      .groupBy(col("day"))
      .agg(count_distinct(col("user_id")).as("wau"))
  }

  /** Incremental aggregate maintenance: a per-(day, status) pre-aggregate
    * state is built from all-but-the-last-day, the last day MERGES in as
    * a delta (sums add, counts add — the algebraic-aggregate property),
    * and the final per-status totals read ONLY the state table. At 100 TB
    * this is the difference between scanning yesterday's delta and
    * re-scanning all of history; the oracle recomputes from scratch, so
    * the hash match proves merge == recompute. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .select(col("o_orderstatus").as("st"),
        to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
    val lastDay = o.agg(max(col("day"))).head().getDate(0)
    def preAgg(df: DataFrame): DataFrame =
      df.groupBy(col("st"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tot"))
    val state = preAgg(o.filter(col("day") < lit(lastDay)))
    val delta = preAgg(o.filter(col("day") === lit(lastDay)))
    // merge = outer-union + re-combine on the state's own grain
    val merged = state.unionByName(delta)
      .groupBy(col("st"), col("day"))
      .agg(sum(col("n")).as("n"), sum(col("tot")).as("tot"))
    merged.groupBy(col("st"))
      .agg(sum(col("n")).as("n_orders"),
        round(sum(col("tot")), 2).as("total"))
      .withColumnRenamed("st", "o_orderstatus")
  }

  /** The q110 chain walk re-planned as Wyllie LIST RANKING (pointer
    * doubling): every element tracks (prev, step, acc); each round jumps
    * prev ← prev(prev) while folding the skipped element's rank and sum in
    * — O(log chain-length) self-join rounds instead of the recursive
    * CTE's O(chain-length) frontier rounds, which is the difference
    * between 6 shuffles and 26 (and between feasible and not on
    * million-element chains). Accumulation is DECIMAL(18,2): exact and
    * associative, so the doubling tree produces bit-identical totals to
    * the oracle's sequential recursive walk — float doubles would drift
    * in the reassociation. Output = q110's, proving the re-plan. */
  def pointerDoubling(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    var st = orders(s, d).filter(col("o_custkey") % 20 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev"),
        lit(1L).as("step"),
        col("o_totalprice").cast("decimal(18,2)").as("acc"))
      .localCheckpoint()
    var remaining = st.filter(col("prev").isNotNull).count()
    while (remaining > 0) {
      val b = st.select(col("o_orderkey").as("b_key"),
        col("prev").as("b_prev"), col("step").as("b_step"),
        col("acc").as("b_acc"))
      val obs = new org.apache.spark.sql.Observation()
      st = st.join(b, st("prev") === b("b_key"), "left_outer")
        .select(col("o_custkey"), col("o_orderkey"),
          when(col("prev").isNull, lit(null)).otherwise(col("b_prev"))
            .as("prev"),
          (col("step") + coalesce(col("b_step"), lit(0L))).as("step"),
          (col("acc") + coalesce(col("b_acc"),
            lit(0).cast("decimal(18,2)"))).as("acc"))
        .observe(obs, count(col("prev")).as("remaining"))
        .localCheckpoint()
      remaining = obs.get("remaining").asInstanceOf[Long]
    }
    st.select(col("o_custkey"), col("o_orderkey"),
      col("step").cast("int").as("step"),
      round(col("acc").cast("double"), 2).as("run_total"))
  }

  /** URL parsing battery: host/path/query-param extraction with the
    * native parse_url expression over synthesized-but-realistic URLs (the
    * C4-style per-document URL normalization a corpus pipeline runs before
    * domain-level filtering/dedup). The oracle reproduces the values with
    * plain regexes — a hash match pins parse_url's component semantics. */
  def urlExtract(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"),
        concat(lit("https://"), lower(col("c_mktsegment")),
          lit(".example.com/user/"), col("c_custkey"),
          lit("?ref="), col("c_nationkey")).as("url"))
      .select(col("c_custkey"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))

  /** Error-safe evaluation battery: try_divide / try_cast /
    * try_element_at return NULL where the ANSI-strict forms would raise
    * (division by zero, bad casts, out-of-bounds subscripts) — the
    * contract batch pipelines over dirty data need: one malformed row
    * must not kill a 100 TB job. */
  def tryBattery(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_custkey") % 20 === 0)
      .select(col("o_orderkey"),
        round(try_divide(col("o_totalprice"),
          col("o_custkey") % 5), 4).as("per_bucket"),
        expr("try_cast(o_orderstatus AS INT)").as("bad_int"),
        expr("try_cast(substr(o_orderpriority, 1, 1) AS INT)")
          .as("prio_num"),
        try_element_at(split(col("o_orderpriority"), "-"), lit(5))
          .as("missing_part"))

  /** explode_outer: row-preserving array explosion — documents whose
    * filter yields an EMPTY array survive with a NULL token instead of
    * vanishing (the difference between "no long words" and "document
    * lost"). Oracle: LEFT JOIN LATERAL unnest. */
  def explodeOuter(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode_outer(filter(col("toks"), t => length(t) > 9)).as("tok"))

  /** Mergeable HLL sketches as FIRST-CLASS VALUES (Apache DataSketches via
    * Spark's hll_sketch_agg family): one pass builds a per-status sketch,
    * hll_union_agg merges the STORED sketches into the global estimate
    * without touching the raw data again. This is the warehouse pattern
    * for distinct counts at 100 TB: per-partition sketches persist as
    * bytes; any rollup (day→month→all) is sketch-union, never a rescan.
    * No DuckDB oracle (sketch estimates are implementation-defined);
    * the spec pins estimates within 2% of exact on this data. */
  def hllUnion(s: SparkSession, d: String): DataFrame = {
    val perStatus = orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val per = perStatus.select(col("o_orderstatus").as("scope"),
      hll_sketch_estimate(col("sk")).as("est_custkeys"))
    val global = perStatus
      .agg(hll_union_agg(col("sk")).as("u"))
      .select(lit("ALL").as("scope"),
        hll_sketch_estimate(col("u")).as("est_custkeys"))
    per.unionByName(global)
  }

  /** Driver-checkable form of [[hllUnion]]: per scope, the exact distinct
    * count (oracle-reproducible) and the sketch-vs-exact error bound
    * collapsed to a boolean — Datasketches HLL at lgK=12 has σ≈1.6%, so
    * 5% is > 3σ and deterministic on fixed data. Upgrades q116 from
    * rows-only to a real driver gate: a broken union or estimate path
    * flips the boolean and fails the hash. */
  def hllUnionCheck(s: SparkSession, d: String): DataFrame = {
    // Two plain scans for the exact arms, on purpose. Both "one-pass"
    // rewrites were MEASURED SLOWER at sf0.1 (distinct+localCheckpoint
    // 0.71 s; ROLLUP+countDistinct 0.73 s; this form ≤0.5 s): the scan
    // is 2.7 MB, so extra exchanges/materialization cost more than the
    // re-read. At 100 TB the rollup form's single scan wins — swap to
    // `rollup(status).agg(countDistinct(custkey))` there.
    val o = orders(s, d)
    val exactPer = o.groupBy(col("o_orderstatus").as("scope"))
      .agg(countDistinct(col("o_custkey")).as("exact_custkeys"))
    val exactAll = o.agg(countDistinct(col("o_custkey"))
        .as("exact_custkeys"))
      .select(lit("ALL").as("scope"), col("exact_custkeys"))
    hllUnion(s, d)
      .join(exactPer.unionByName(exactAll), Seq("scope"))
      .select(col("scope"), col("exact_custkeys"),
        (abs(col("est_custkeys") - col("exact_custkeys")) <=
          col("exact_custkeys") * 0.05).as("est_ok"))
  }

  /** Time-series LINEAR interpolation (q85's gap fill carries the last
    * value forward; this draws the line between the surrounding
    * observations — the resampling rule metric pipelines actually want).
    * Same dense spine as q85; per-row work is four IGNORE-NULLS window
    * lookups (prev/next value and day) + closed-form interpolation, one
    * shuffle on the partition key. Leading/trailing gaps degrade to
    * back-/forward-fill. */
  def linearInterpolate(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events(s, d)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(round(sum(col("value")), 2).as("v"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"),
          expr("INTERVAL 1 DAY"))).as("day"))
    val j = spine.join(daily, Seq("user_id", "day"), "left")
    val back = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(0, Window.unboundedFollowing)
    val obsDay = when(col("v").isNotNull, col("day"))
    j.select(col("user_id"), col("day"), col("v"),
        last(col("v"), ignoreNulls = true).over(back).as("pv"),
        last(obsDay, ignoreNulls = true).over(back).as("pd"),
        first(col("v"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsDay, ignoreNulls = true).over(fwd).as("nd"))
      .select(col("user_id"), col("day"), col("v").isNotNull.as("obs"),
        round(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              datediff(col("day"), col("pd")) /
              datediff(col("nd"), col("pd")).cast("double")), 4)
          .as("interp"))
  }

  /** Snapshot reconciliation: diff two versions of a keyed table into
    * added / removed / changed / same classes with value drift — the
    * anti-entropy audit every periodically-rebuilt corpus needs ("what
    * did this rebuild actually change?"). One full outer join on the
    * key, classification from null-sides + value compares, aggregated
    * per class. The second snapshot is derived deterministically
    * (drops, mutations, additions) so both engines reconstruct it. */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val v1 = orders(s, d)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice"), 2).as("p1"),
        col("o_orderstatus").as("st1"))
    val base = orders(s, d)
    val v2 = base
      .filter(col("o_orderkey") % 97 =!= 0) // deletions
      .select(col("o_orderkey").as("k"),
        // ×2 is exact in binary; a fractional factor (1.1) lands values
        // on half-cent boundaries where the engines' round() disagrees
        when(col("o_orderkey") % 13 === 0,
          round(col("o_totalprice") * 2, 2))
          .otherwise(round(col("o_totalprice"), 2)).as("p2"),
        col("o_orderstatus").as("st2"))
      .unionByName(base.filter(col("o_orderkey") % 89 === 0) // additions
        .select((col("o_orderkey") + 10000000L).as("k"),
          round(col("o_totalprice"), 2).as("p2"),
          col("o_orderstatus").as("st2")))
    v1.join(v2, Seq("k"), "full_outer")
      .select(
        when(col("p1").isNull, "added")
          .when(col("p2").isNull, "removed")
          .when(col("p1") =!= col("p2") || col("st1") =!= col("st2"),
            "changed")
          .otherwise("same").as("diff_class"),
        coalesce(abs(col("p2") - col("p1")), lit(0.0)).as("delta"))
      .groupBy(col("diff_class"))
      .agg(count(lit(1)).as("n"), round(sum(col("delta")), 2).as("drift"))
  }

  /** Equi-DEPTH histogram (q57 is equi-width): ntile deciles over the
    * price distribution with per-bucket count/min/max. ntile itself is
    * never evaluated as a global window (that would single-partition
    * the whole table): the global rank comes from [[GlobalOrder]]'s
    * range-partitioned two-level prefix sum, and the decile is integer
    * arithmetic on (rank, n) reproducing SQL ntile semantics exactly —
    * deterministic because (price, orderkey) is a total order. */
  def equidepthHistogram(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
    val total = base.agg(count(lit(1)).as("__n"))
    GlobalOrder.rowNumber(base, "rn",
        col("o_totalprice"), col("o_orderkey"))
      .crossJoin(broadcast(total))
      .withColumn("bucket", GlobalOrder
        .ntileFromRowNumber(col("rn"), col("__n"), 10).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col("o_totalprice")), 2).as("lo"),
        round(max(col("o_totalprice")), 2).as("hi"))
  }

  /** Per-group z-score normalization (the feature-scaling pass of a
    * training-data pipeline): group stats once (partial-aggregated),
    * broadcast back, standardize in the scan projection — never a
    * per-row window over the full fact table. */
  def zscoreNormalize(s: SparkSession, d: String): DataFrame = {
    val stats = orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(avg(col("o_totalprice")).as("mu"),
        stddev_samp(col("o_totalprice")).as("sd"))
    orders(s, d)
      .filter(col("o_custkey") % 25 === 0)
      .join(broadcast(stats), Seq("o_orderstatus"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round((col("o_totalprice") - col("mu")) / col("sd"), 4).as("z"))
  }

  /** Content-addressing battery: md5 / sha2-256 digests and a composite
    * content address over document text — the identity layer of exact
    * dedup, caching, and provenance tracking in a corpus pipeline
    * (hash once at ingest, compare addresses forever after). All
    * codegen'd built-ins, pure scan projection. */
  def hashBattery(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("md5"),
        sha2(col("text").cast("binary"), 256).as("sha256"),
        concat(substring(sha2(col("text").cast("binary"), 256), 1, 16),
          lit("-"), length(col("text"))).as("content_addr"))

  /** Map-type battery: per-document word-count maps built with
    * map_from_entries, then consumed with size / try_element_at /
    * map_entries — the KEYED-VALUE column shape feature stores and
    * metadata columns use. Output flattens to deterministic strings so
    * the oracle (which computes the same facts relationally) can
    * hash-match without a cross-engine map encoding. */
  def mapBattery(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(col("text")))
          .as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("cnt"))))
        .as("m"))
      .select(col("doc_id"),
        size(col("m")).as("n_distinct_words"),
        try_element_at(col("m"), lit("the")).as("the_cnt"),
        concat_ws(",", transform(sort_array(map_entries(col("m"))),
          e => concat(e.getField("key"), lit(":"), e.getField("value"))))
          .as("entries"))

  /** PERCENTILE_DISC vs PERCENTILE_CONT (WITHIN GROUP ordered-set
    * aggregates): the discrete form returns an ACTUAL data value (the
    * first whose cume_dist ≥ p), the continuous form interpolates —
    * SLAs want disc, dashboards want cont, and conflating them is a
    * classic correctness bug this query pins cross-engine. */
  def percentileDisc(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("graft_pd_orders")
    s.sql("""
      SELECT o_orderstatus,
             round(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2) AS med_disc,
             round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 2) AS med_cont,
             round(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice), 2) AS p90_disc,
             count(*) AS n
      FROM graft_pd_orders GROUP BY o_orderstatus""")
  }

  /** EXACT grouped quantiles at sketch cost, with O(1) ROWS CENTRALIZED:
    * pass 1 builds a mergeable KLL summary per group (O(k log n) state,
    * one small buffer per group per mapper on the shuffle) plus the exact
    * count; then a short PROBE LOOP resolves each target order statistic
    * — value at rank j = the minimum data value w with count(v ≤ w) ≥
    * j+1 — from exact scan-side AGGREGATES only: per probe point m, the
    * loop reads count(v ≤ m), max(v ≤ m) and min(v > m). The sketch
    * supplies the first probe (within εn ranks w.h.p.), then outcomes
    * bracket the answer between a known-low probe's DATA successor
    * (min(v > m) — no data hides in between, so count is known exact up
    * to it) and a known-high data value (max(v ≤ m)); value-midpoint
    * bisection closes the bracket, and every probe SNAPS to real data
    * values so duplicates and gaps terminate it. Resolution rules are
    * exact, not probabilistic: count(≤ m) = j+1 ⟹ answer = max(v ≤ m);
    * a low probe's successor w with count(≤ w) ≥ j+1 ⟹ answer = w.
    *
    * This is how exact percentiles stay feasible at 100 TB: the full
    * sort never happens, and — unlike the earlier band-collect form,
    * which centralized ≈ 2εn rows per group (terabytes at petabyte
    * corpus sizes, through a single collect_list buffer) — the driver
    * only ever sees O(groups × quantiles) aggregate values per pass,
    * independent of n. Passes are O(1) expected (sketch-guided first
    * probe; each later pass halves the value bracket or advances to a
    * data successor). Oracle: DuckDB quantile_cont. */
  def sketchQuantiles(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{KllSketch, KllSummary}
    val qs = Array(0.1, 0.5, 0.9)
    val outCols = Array("p10", "p50", "p90")
    val k = 200
    val base = lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("v"))
      // width the probe scans to the full executor count — the parquet
      // read may land in a handful of input splits, and an N-pass loop
      // over an M-partition checkpoint runs at M-way parallelism
      .repartition(s.sparkContext.defaultParallelism)
      .localCheckpoint() // the sketch pass + every probe pass share it
    val outSchema = StructType(
      StructField("l_returnflag", StringType, nullable = true) +:
        outCols.map(c => StructField(c, DoubleType, nullable = true)) :+
        StructField("n", LongType, nullable = false))
    val sk = base.groupBy(col("l_returnflag"))
      .agg(KllSketch.kllSketch(col("v"), k).as("summary"),
        count(col("v")).as("n"))
      .collect()
    if (sk.isEmpty)
      return s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)

    final case class G(flag: String, vs: Array[Double], ws: Array[Long],
        n: Long)
    val groups = sk.map { r =>
      val items = r.getSeq[org.apache.spark.sql.Row](1)
      G(r.getString(0), items.map(_.getDouble(0)).toArray,
        items.map(_.getLong(1)).toArray, r.getLong(2))
    }
    val eps = 8.0 / k

    // a target whose bracket provably holds at most this many rows
    // (exact counts at both ends) finishes by collecting the band in
    // the next pass — the verdict-round budget that bounds what the
    // driver may ever centralize per target
    val BandBudget = 10000L
    // one probe state per (group, distinct target rank j); ≤ 6 per group
    final class T(val g: G, val j: Long) {
      var ans: Option[Double] = None
      var loProbe: Option[Double] = None // probe with count(≤) ≤ j
      var loNext: Option[Double] = None // min data value > loProbe
      var hi: Option[Double] = None // data value with count(≤) ≥ j+1
      var cLo = 0L // exact count(≤ loProbe)
      var cHi = 0L // exact count(≤ hi)
      var highTries = 0
      var lowTries = 0
      var bracketProbes = 0
      // the band (loProbe, hi] is provably ≤ BandBudget rows: one
      // collect finishes this target exactly
      def bandReady: Boolean = ans.isEmpty && loProbe.isDefined &&
        hi.isDefined && cHi - cLo <= BandBudget
      def sketchAt(rank: Double): Double =
        KllSummary.valueAtRank(g.vs, g.ws,
          math.max(0.0, math.min((g.n - 1).toDouble, rank)))
      // next probe points (ascending), empty once resolved. The FIRST
      // pass probes the target rank AND both sketch band edges in one
      // scan, so the bracket (and usually both sides of it) exists
      // after a single pass instead of three sequential ones.
      def probes: Seq[Double] = ans match {
        case Some(_) => Seq.empty
        case None if loProbe.isEmpty && hi.isEmpty && highTries == 0 &&
            lowTries == 0 =>
          highTries = 1; lowTries = 1 // sketch edges consumed here
          Seq(sketchAt(j - eps * g.n - 1), sketchAt(j.toDouble),
            sketchAt(j + eps * g.n + 1)).distinct.sorted
        case None =>
          if (hi.isEmpty) {
            highTries += 1
            Seq(if (highTries == 1) sketchAt(j + eps * g.n + 1)
            else Double.MaxValue)
          } else if (loNext.isEmpty) {
            lowTries += 1
            Seq(if (lowTries == 1) sketchAt(j - eps * g.n - 1)
            else -Double.MaxValue)
          } else {
            // bracket pass, three decisive points per scan:
            //  - loNext itself: count(≤ loNext) ≥ j+1 resolves to it
            //    (count below is the known cLo ≤ j);
            //  - the rank-INTERPOLATED point (secant on the exact
            //    bracket counts — locally-uniform values land within a
            //    few ranks; pure value-midpoint bisection needs
            //    log₂(εn) passes ≈ 17 full scans at ×16, measured
            //    63 s), with a midpoint fallback every third pass for
            //    guaranteed halving on exponential-gap layouts;
            //  - nextDown(hi): count(≤ it) ≤ j proves nothing sits
            //    between and resolves to hi, else snaps hi to its true
            //    data predecessor — the duplicate-run endgame closes in
            //    ONE pass instead of a per-distinct-value walk.
            val (a, b) = (loNext.get, hi.get)
            bracketProbes += 1
            val frac = (j + 1 - cLo).toDouble / (cHi - cLo).toDouble
            def at(f: Double): Double = {
              val v = a + (b - a) * f
              if (v > a && v < b) v else a / 2 + b / 2
            }
            val mid = a / 2 + b / 2
            val interps =
              if (bracketProbes % 3 == 0) Seq(mid)
              else Seq(at(frac / 2), at(frac), at(frac + (1 - frac) / 2))
            (Seq(a, math.nextDown(b)).filter(x => x >= a && x < b) ++
              interps.filter(x => x > a && x < b) match {
              case Nil => Seq(a)
              case xs => xs
            }).distinct.sorted
          }
      }
      def update(m: Double, cntLe: Long, maxLe: Option[Double],
          minGt: Option[Double]): Unit = if (ans.isEmpty) {
        if (cntLe >= j + 1) {
          // maxLe is a data value with the same count(≤) as m
          if (cntLe == j + 1) ans = maxLe // count(< it) ≤ j: mult ≥ 1
          // TIGHTEN-ONLY: several points probe per pass against the
          // state they were chosen from, so a later (larger) point's
          // outcome must never move hi back UP past a tighter one set
          // earlier in the same pass (that widening loop stalled the
          // ×16 run at 12 unresolved targets for 90 passes)
          else if (hi.isEmpty || maxLe.exists(_ < hi.get)) {
            hi = maxLe
            cHi = cntLe
            // the bracket closed onto the lo probe's data successor
            if (loNext.isDefined && hi == loNext) ans = hi
          }
        } else { // cntLe ≤ j: nothing in (m, minGt) — successor is exact
          if (loNext.isEmpty || minGt.exists(_ > loNext.get)) {
            loProbe = Some(m)
            loNext = minGt
            cLo = cntLe
            if (loNext.isDefined && hi.isDefined && loNext == hi) ans = hi
          }
        }
      }
    }
    val targets: Array[T] = groups.flatMap { g =>
      if (g.n == 0) Array.empty[T]
      else qs.flatMap { q =>
        val r = (g.n - 1) * q
        Seq(math.floor(r).toLong, math.ceil(r).toLong)
      }.distinct.map(j => new T(g, j))
    }

    import s.implicits._
    var pass = 0
    while (targets.exists(_.ans.isEmpty) && pass < 100) {
      pass += 1
      if (sys.env.contains("GRAFT_Q111_DEBUG"))
        System.err.println(s"[q111] pass $pass unresolved=" +
          targets.count(_.ans.isEmpty) + " t=" +
          (System.nanoTime / 1e9).toLong)
      val byFlag = targets.filter(_.ans.isEmpty).groupBy(_.g.flag)
      // band-mode targets (bracket provably ≤ BandBudget rows) collect
      // their band this pass; the rest contribute probe points,
      // captured ONCE (`probes` advances escalation counters, so it
      // must not be re-evaluated at update time). Pass 1 probes the
      // rank AND both sketch band edges together.
      val bandTs: Map[String, Array[T]] =
        byFlag.map { case (f, ts) => f -> ts.filter(_.bandReady) }
      val probePts: Map[String, Array[(Int, Double)]] =
        byFlag.map { case (f, ts) =>
          f -> ts.zipWithIndex.flatMap { case (t, ti) =>
            if (t.bandReady) Seq.empty[(Int, Double)]
            else t.probes.map(m => (ti, m))
          }
        }
      val slots = probePts.values.map(_.length).reduceOption(_ max _)
        .getOrElse(0)
      val bandSlots = bandTs.values.map(_.length).reduceOption(_ max _)
        .getOrElse(0)
      // probe points and band bounds enter as LITERAL case-when columns
      // keyed by the group value — no per-pass DataFrame build,
      // broadcast, or join: a pass is one groupBy-aggregate over the
      // checkpoint
      def mExpr(i: Int): Column =
        probePts.foldLeft(lit(null).cast("double"): Column) {
          case (e, (f, pts)) =>
            if (i < pts.length)
              when(col("l_returnflag") === lit(f), lit(pts(i)._2))
                .otherwise(e)
            else e
        }
      def bandCond(b: Int): Column =
        bandTs.foldLeft(lit(false): Column) { case (e, (f, ts)) =>
          if (b < ts.length)
            when(col("l_returnflag") === lit(f),
              col("v") > lit(ts(b).loProbe.get) &&
                col("v") <= lit(ts(b).hi.get)).otherwise(e)
          else e
        }
      val aggExprs = (0 until slots).flatMap { i =>
        val m = mExpr(i)
        Seq(
          sum(when(col("v") <= m, 1L).otherwise(0L)).as(s"cnt$i"),
          max(when(col("v") <= m, col("v"))).as(s"ml$i"),
          min(when(col("v") > m, col("v"))).as(s"mg$i"))
      } ++ (0 until bandSlots).map { b =>
        sort_array(collect_list(when(bandCond(b), col("v"))))
          .as(s"band$b")
      }
      val res = base
        .groupBy(col("l_returnflag"))
        .agg(aggExprs.head, aggExprs.tail: _*)
        .collect()
        .map(r => r.getString(0) -> r).toMap
      byFlag.foreach { case (flag, ts) =>
        val r = res(flag)
        probePts(flag).zipWithIndex.foreach { case ((ti, m), i) =>
          val cnt = r.getLong(1 + 3 * i)
          val ml = if (r.isNullAt(2 + 3 * i)) None
            else Some(r.getDouble(2 + 3 * i))
          val mg = if (r.isNullAt(3 + 3 * i)) None
            else Some(r.getDouble(3 + 3 * i))
          ts(ti).update(m, cnt, ml, mg)
        }
        bandTs(flag).zipWithIndex.foreach { case (t, b) =>
          val band = r.getSeq[Double](1 + 3 * slots + b)
          // exact by construction: ranks cLo..cHi−1 live in the band
          val off = (t.j - t.cLo).toInt
          if (off >= 0 && off < band.size) t.ans = Some(band(off))
        }
      }
    }
    if (targets.exists(_.ans.isEmpty))
      // unreachable unless bisection failed to converge in 100 passes:
      // exact percentile aggregate as the unconditional fallback
      return base.groupBy(col("l_returnflag"))
        .agg(round(expr("percentile(v, 0.1)"), 2).as("p10"),
          round(expr("percentile(v, 0.5)"), 2).as("p50"),
          round(expr("percentile(v, 0.9)"), 2).as("p90"),
          count(col("v")).as("n"))

    // same rounding rule as Spark's/DuckDB's round(): HALF_UP, not
    // rint's half-even
    def r2d(v: Double): Double =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byKey = targets.map(t => (t.g.flag, t.j) -> t.ans.get).toMap
    val rows = groups.toSeq.map { g =>
      if (g.n == 0) // all-null group: DuckDB quantile_cont(empty) = NULL
        (g.flag, None: Option[Double], None: Option[Double],
          None: Option[Double], g.n)
      else {
        val v = qs.map { q =>
          val r = (g.n - 1) * q
          val j0 = math.floor(r).toLong
          val j1 = math.ceil(r).toLong
          val (v0, v1) = (byKey((g.flag, j0)), byKey((g.flag, j1)))
          Some(r2d(v0 + (r - j0) * (v1 - v0))): Option[Double]
        }
        (g.flag, v(0), v(1), v(2), g.n)
      }
    }
    rows.toDF(("l_returnflag" +: outCols :+ "n"): _*)
  }

  /** VARIANT-type battery: build nested JSON from document columns,
    * parse to Spark 4's VARIANT, and extract typed fields back —
    * object navigation, array indexing, a missing path (null, not error)
    * and an ill-typed access under try_variant_get (null, not error).
    * The oracle is the IDENTITY on the source columns: if the
    * construct→parse→navigate→cast round trip altered anything, the
    * hash compare catches it. VARIANT is the semi-structured scale
    * path — the binary encoding is navigated without re-parsing text
    * per access, unlike the get_json_object string path (q36). */
  def variantBattery(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), parse_json(to_json(struct(
        col("doc_id").as("id"),
        struct(col("lang"), col("n_chars").as("n")).as("meta"),
        array(col("source"), col("lang")).as("tags")))).as("v"))
      .select(col("doc_id"),
        expr("variant_get(v, '$.id', 'bigint')").as("vid"),
        expr("variant_get(v, '$.meta.lang', 'string')").as("vlang"),
        expr("variant_get(v, '$.meta.n', 'bigint')").as("vn"),
        expr("variant_get(v, '$.tags[0]', 'string')").as("vtag0"),
        expr("try_variant_get(v, '$.missing', 'bigint')").as("vmissing"),
        expr("try_variant_get(v, '$.meta.lang', 'bigint')").as("vbad"))

  /** Typed order row for the Dataset[T] surface (q163). */
  final case class TypedOrder(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)

  /** Typed Dataset pipeline: the case-class-Encoder surface (SURVEY
    * §1.5's "Dataset[T] where type safety helps") driven as a contract
    * query — as[TypedOrder], a typed filter, groupByKey on a derived
    * key, and mapGroups computing per-group stats in plain Scala. The
    * oracle is the equivalent SQL aggregation: typed lambdas are opaque
    * to Catalyst (no pushdown inside mapGroups — which is exactly why
    * the REST of this engine is DataFrame-first), so the hash match
    * certifies the Encoder round trip, not plan quality. Sums run in
    * cents (exact longs) so Scala's fold order can't drift from SQL's. */
  def typedPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .as[TypedOrder]
      .filter((o: TypedOrder) => o.o_custkey % 10 == 0)
      .groupByKey(o => (o.o_orderstatus, o.o_custkey % 3))
      .mapGroups { (key: (String, Long), rows: Iterator[TypedOrder]) =>
        val (status, bucket) = key
        var n = 0L
        var cents = 0L
        var maxKey = Long.MinValue
        rows.foreach { o =>
          n += 1
          cents += math.round(o.o_totalprice * 100)
          if (o.o_orderkey > maxKey) maxKey = o.o_orderkey
        }
        (status, bucket, n, cents / 100.0, maxKey)
      }
      .toDF("o_orderstatus", "bucket", "n", "total", "max_key")
      .withColumn("total", round(col("total"), 2))
  }

  /** Several COUNT(DISTINCT …) over DIFFERENT columns in one aggregation
    * — Spark plans this with an Expand (one replicated row-set per
    * distinct column, null-padded) feeding a single aggregate, instead
    * of N self-joined single-distinct queries; the plan audit pins the
    * Expand. The mixed plain aggregates ride the same pass. */
  def multiDistinct(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_users"),
        count_distinct(to_date(col("ts"))).as("n_days"),
        count_distinct(expr("CAST(get_json_object(props, '$.k') AS INT)"))
          .as("n_keys"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))

  /** GROUP BY ALL / ORDER BY ALL — the exact same SQL TEXT runs on Spark
    * 4 and DuckDB (the dialect nicety both engines adopted): grouping
    * keys inferred from the non-aggregate select items, ordering over
    * the full select list. The oracle IS this query string. */
  val GroupByAllSql: String =
    "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
      "round(sum(l_quantity), 2) AS sum_qty, " +
      "round(min(l_extendedprice), 2) AS min_price " +
      "FROM lineitem GROUP BY ALL ORDER BY ALL"

  def groupByAll(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(GroupByAllSql)
  }

  /** XML battery — Spark 4's built-in XML surface (the spark-xml merge):
    * construct nested XML from document columns with to_xml, parse it
    * back with from_xml against an explicit schema, extract typed
    * fields, and exercise a missing element (null, not error). Identity
    * oracle, same contract as the VARIANT battery (q126): a hash match
    * proves the construct→parse→navigate round trip. */
  def xmlBattery(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), expr(
        "to_xml(named_struct('id', doc_id, 'meta', " +
          "named_struct('lang', lang, 'n', n_chars)))").as("x"))
      .select(col("doc_id"), expr(
        "from_xml(x, 'id BIGINT, meta STRUCT<lang: STRING, n: BIGINT>, " +
          "absent STRING')").as("v"))
      .select(col("doc_id"), col("v.id").as("vid"),
        col("v.meta.lang").as("vlang"), col("v.meta.n").as("vn"),
        col("v.absent").as("vmissing"))

  /** Robust (median/IQR) and min-max scaling per group — q123's z-score
    * with rank statistics instead of moments, which is what survives
    * heavy-tailed columns. Group stats are ONE exact-percentile
    * aggregate broadcast back over the row stream: no per-row window,
    * no second shuffle of the fact table. */
  def robustScale(s: SparkSession, d: String): DataFrame = {
    val stats = lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("med"),
        expr("percentile(l_extendedprice, 0.25)").as("q1"),
        expr("percentile(l_extendedprice, 0.75)").as("q3"),
        min(col("l_extendedprice")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
    lineitem(s, d)
      .filter(col("l_orderkey") % 101 === 0)
      .join(broadcast(stats), Seq("l_returnflag"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round((col("l_extendedprice") - col("med")) / (col("q3") - col("q1")),
          4).as("robust"),
        round((col("l_extendedprice") - col("mn")) / (col("mx") - col("mn")),
          4).as("minmax"))
  }

  /** Ordered event-sequence pattern matching (the MATCH_RECOGNIZE shape):
    * each user's event history collapses to an ordered type-initial
    * string, and a regex counts non-overlapping view→click*→purchase
    * runs. One shuffle (groupBy user); the collect_list is bounded by
    * per-user event counts, and sort_array on (ts, id) structs makes the
    * sequence deterministic without a window pass. */
  def sequencePattern(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch")).as("e"))
      .groupBy(col("user_id"))
      .agg(concat_ws("", transform(sort_array(collect_list(col("e"))),
        e => e.getField("ch"))).as("seq"))
      .select(col("user_id"), length(col("seq")).as("seq_len"),
        size(regexp_extract_all(col("seq"), lit("vc*p"), lit(0)))
          .as("n_funnels"))

  /** Running COUNT(DISTINCT) per user over event time. Spark rejects
    * DISTINCT window aggregates outright; the scalable rewrite marks each
    * row's FIRST occurrence of its (user, type) with one window, then
    * running-sums the marks with another on the same partition key — two
    * window passes over one shuffle, identical semantics. The oracle runs
    * DuckDB's native count(DISTINCT …) OVER, so the hash match proves the
    * rewrite, not just arithmetic. */
  def runningDistinct(s: SparkSession, d: String): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .filter(col("user_id") % 7 === 0)
      .select(col("event_id"), col("user_id"), col("ts"),
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L)
          .as("first_seen"))
      .select(col("event_id"), col("user_id"),
        sum(col("first_seen")).over(wRun).as("running_distinct"))
  }

  /** Timezone battery: UTC instants → wall time, UTC offset, local hour
    * and local date in three zones (DST zone, half-hour-offset zone,
    * fixed-offset zone). The per-row day shift spreads January events
    * across the whole of 2024 so BOTH American DST transitions are in the
    * data — the oracle runs on an independent tz database (ICU vs the
    * JDK's tzdb), so a hash match certifies the transition handling, not
    * just the arithmetic. Wall times are emitted as strings: parquet
    * TIMESTAMP_NTZ vs DuckDB TIMESTAMP physical encodings would otherwise
    * make the compare about storage, not semantics. */
  def timezoneBattery(s: SparkSession, d: String): DataFrame = {
    def wall(ts: Column, tz: String): Column = from_utc_timestamp(ts, tz)
    events(s, d)
      .filter(col("event_id") % 17 === 0)
      .withColumn("ts2",
        expr("timestampadd(DAY, CAST(event_id % 330 AS INT), ts)"))
      .select(col("event_id"),
        date_format(wall(col("ts2"), "America/New_York"),
          "yyyy-MM-dd HH:mm:ss").as("ny_wall"),
        ((unix_timestamp(wall(col("ts2"), "America/New_York")) -
          unix_timestamp(col("ts2"))) / 60).cast("int").as("ny_off_min"),
        hour(wall(col("ts2"), "Asia/Kolkata")).as("kolkata_hour"),
        date_format(wall(col("ts2"), "Asia/Tokyo"), "yyyy-MM-dd")
          .as("tokyo_date"))
  }

  /** Weighted quantiles (quantity-weighted price percentiles): the
    * smallest value whose cumulative weight reaches the target fraction.
    * Weights pre-aggregate per (group, value) — the window then runs over
    * distinct values, not raw rows — and the running sum is SEQUENTIAL in
    * value order in both engines, so the float cumulative weights are
    * bit-identical cross-engine (the total re-derives from the running
    * max, never from an order-unstable global sum). */
  def weightedQuantiles(s: SparkSession, d: String): DataFrame = {
    val wc = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wt = Window.partitionBy(col("g"))
    val c = lineitem(s, d)
      .groupBy(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      .agg(sum(col("l_quantity")).as("w"))
      .select(col("g"), col("v"), sum(col("w")).over(wc).as("cw"))
      .withColumn("tw", max(col("cw")).over(wt))
    c.groupBy(col("g"))
      .agg(
        round(min(when(col("cw") >= col("tw") * 0.25, col("v"))), 2)
          .as("wp25"),
        round(min(when(col("cw") >= col("tw") * 0.5, col("v"))), 2)
          .as("wp50"),
        round(min(when(col("cw") >= col("tw") * 0.75, col("v"))), 2)
          .as("wp75"))
      .withColumnRenamed("g", "l_returnflag")
  }

  /** Point-in-interval join as a BINNED EQUI-JOIN — the large×large
    * range-join strategy for when neither side broadcasts (q52 covers the
    * broadcast case): each interval replicates to the grid cells it spans
    * (bounded here by the hour grid — an interval covers ≤ 9 cells), each
    * point maps to its one cell, and the join becomes a plain shuffled
    * equi-join on the cell id that Catalyst hash-partitions like any
    * other key. Cell membership IS containment (cells enumerate exactly
    * [lo, hi)), so no residual predicate remains. Unmatched points
    * survive via the left join (count of a nullable side column).
    * PlanAuditSpec pins the shape: no nested-loop join. */
  def binnedRangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        expr("unix_millis(ts) div 3600000").as("st"),
        (expr("unix_millis(ts) div 3600000") + lit(1L) +
          expr("CAST(floor(value) AS BIGINT) div 60")).as("en"))
    val binned = ev.filter(col("event_type") === "view")
      .select(col("st").as("lo"), col("en").as("hi"))
      .select(explode(sequence(col("lo"), col("hi") - 1)).as("bin"),
        col("lo"))
    val pts = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("st").as("p"))
    pts.join(binned, pts("p") === binned("bin"), "left_outer")
      .groupBy(col("event_id"))
      .agg(count(col("lo")).as("n_overlap"))
  }

  /** Global sequential row numbers WITHOUT a single-partition sort — the
    * DataFrame form of zipWithIndex, and the q64 prefix-sum trick
    * generalized from token budgets to ranks: range-repartition on the
    * key (global order ACROSS partitions), rank locally per partition,
    * then add broadcast partition offsets (one tiny ≤#partitions-row
    * cumulative sum). A bare `row_number() OVER (ORDER BY …)` collapses
    * to ONE partition — the classic scale cliff this shape removes. The
    * result is the exact global rank regardless of where the (sampled,
    * run-varying) range boundaries land, because ranks only depend on the
    * total order of the distinct keys. */
  def globalRowNumber(s: SparkSession, d: String): DataFrame =
    GlobalOrder.rowNumber(orders(s, d).select(col("o_orderkey")),
        "rn", col("o_orderkey"))
      .select(col("o_orderkey"), col("rn"))

  /** First-order Markov transition matrix over per-user event sequences —
    * the sequence-statistics prep under next-event models and funnel
    * diagnostics: one lead() window per user (deterministic (ts, event_id)
    * order), then transition counts and row-normalized probabilities.
    * The probability divides by a per-state total joined back from a
    * second tiny aggregate (states × states table — always broadcastable)
    * rather than a window over the full stream. */
  def markovTransitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ts_ms"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("event_type"))
      .agg(sum(col("n")).as("tot"))
    trans.join(broadcast(totals), Seq("event_type"))
      .select(col("event_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
  }

  /** Dense-vector function battery over the embedding column (the scalar
    * micro-ops under every ANN/clustering path, each mirrored by a DuckDB
    * list function): L2 norm, element sum/max (index-order folds, so the
    * doubles are bit-identical cross-engine), first-occurrence argmax
    * index, and the first component after L2 normalization. */
  def vectorBattery(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") % 3 === 0)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
      .select(col("vec_id"),
        round(sqrt(expr(
          "aggregate(transform(e, x -> x * x), 0.0D, (s, x) -> s + x)")), 6)
          .as("l2"),
        round(expr("aggregate(e, 0.0D, (s, x) -> s + x)"), 6).as("sum_el"),
        round(array_max(col("e")), 6).as("max_el"),
        array_position(col("e"), array_max(col("e"))).as("argmax_idx"),
        round(element_at(col("e"), 1) /
          sqrt(expr(
            "aggregate(transform(e, x -> x * x), 0.0D, (s, x) -> s + x)")), 6)
          .as("unit_first"))

  /** Deterministic k-fold assignment (train/eval splitting without RNG
    * state): the fold is a pure function of the doc id via the md5-hex
    * idiom (q63/q101's draw, reduced to a 16-way character bucket mod
    * k), so any engine — and any re-run — assigns identically, and every
    * doc lands in EXACTLY one fold by construction. Reports per-fold
    * doc/token mass and the per-source spread the stratification check
    * cares about. */
  def foldAssignment(s: SparkSession, d: String, k: Int = 4): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"),
        size(expr("filter(split(text, ' '), x -> x != '')"))
          .cast("long").as("toks"))
      .withColumn("fold",
        ((expr("locate(substring(md5(CAST(doc_id AS STRING)), 1, 1), " +
          "'0123456789abcdef')") - 1) % k).cast("int"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
        countDistinct(col("source")).as("n_sources"))

  /** Lag-k autocorrelation of the daily value series — the seasonality
    * diagnostic (q141 decomposes; this measures): the series aggregates
    * to CENTS (order-independent integer sums — a plain double sum per
    * day would be engine-order-dependent), lag alignment is an exact
    * date self-join, and the corr aggregate rounds to 6 (q93's stats
    * precedent). The daily table is tiny at any corpus scale (one row
    * per day), so the per-lag joins are broadcast territory. */
  def autocorrelation(s: SparkSession, d: String,
      lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("ts").cast("date").as("day"))
      .agg((sum(round(col("value") * 100).cast("long")).cast("double") / 100)
        .as("v"))
      .localCheckpoint()
    lags.map { k =>
      daily.as("a")
        .join(daily.as("b"), expr(s"date_add(a.day, $k) = b.day"))
        .agg(count(lit(1)).as("n"),
          round(corr(col("a.v"), col("b.v")), 6).as("r"))
        .select(lit(k).as("lag"), col("n"), col("r"))
    }.reduce(_ unionByName _)
  }

  /** Exact k-per-group reservoir sampling through the bounded
    * [[graft.functions.AggregateKernels.topKByScore]] heap: the "random"
    * order is the deterministic md5-hex draw (q63/q101's idiom), so the
    * sample is reproducible AND oracle-checkable, while the kernel keeps
    * ≤ k entries per group per mapper — no per-group sort, no ranking
    * window, which is the shape that survives groups of any size. The
    * heap ranks (score desc, id asc); negating the hash value makes that
    * exactly the oracle's (hex asc, doc_id asc). */
  def reservoirSample(s: SparkSession, d: String, k: Int = 5): DataFrame =
    documents(s, d)
      .select(col("source"), col("doc_id"),
        expr("conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)")
          .cast("long").as("hv"))
      .groupBy(col("source"))
      .agg(graft.functions.AggregateKernels.topKByScore(
        -col("hv").cast("double"), col("doc_id"), k).as("sample"))
      .select(col("source"), posexplode(col("sample")))
      .select(col("source"), col("col.id").as("doc_id"),
        (col("pos") + 1).cast("int").as("rk"))

  /** Linear-regression aggregate battery (regr_count/avgx/avgy/r2 and the
    * moment sums), per order status — completing q93's stats surface with
    * the regr_* family both engines implement natively. The moment sums
    * accumulate with single-pass cancellation, so they are scaled down
    * and rounded coarsely enough that cross-engine summation-order noise
    * (bounded by n·ε·Σ|terms|) sits orders of magnitude below the
    * rounding step. */
  def regressionBattery(s: SparkSession, d: String): DataFrame = {
    val y = col("o_totalprice")
    val x = col("o_custkey")
    orders(s, d).groupBy(col("o_orderstatus"))
      .agg(
        regr_count(y, x).as("n"),
        round(regr_avgx(y, x), 4).as("avgx"),
        round(regr_avgy(y, x), 2).as("avgy"),
        round(regr_r2(y, x), 6).as("r2"),
        round(regr_sxx(y, x) / 1e9, 4).as("sxx_b"),
        round(regr_syy(y, x) / 1e12, 4).as("syy_t"),
        round(regr_sxy(y, x) / 1e9, 4).as("sxy_b"))
  }

  /** Jaro-Winkler fuzzy name join through the native [[JaroWinkler]]
    * codegen expression (Spark ships levenshtein — q59 — but no JW; the
    * oracle side runs DuckDB's INDEPENDENT implementation, so the hash
    * match pins the algorithm, not just the plumbing). Sampled key
    * ranges keep the cross join bounded; at scale this kernel sits
    * behind a blocking key (q134's prefix filter / q59's length band),
    * not a bare cross join. */
  def jaroWinklerJoin(s: SparkSession, d: String): DataFrame = {
    // Scale-capped samples (the q139/q271 fixed-panel rule): fixed
    // moduli make BOTH sides grow linearly and the pair join quadratic
    // — 52 M string comparisons at ×16, unbounded beyond. The moduli
    // now scale with the exact table count so each side caps at ~600 /
    // ~400 rows; at every committed test scale (n ≤ 20 000) they
    // evaluate to the original 37 / 53, so recorded results are
    // unchanged. Both engines derive the same moduli from count(*).
    val n = part(s, d).count()
    val ma = math.max(37L, (n + 599L) / 600L)
    val mb = math.max(53L, (n + 399L) / 400L)
    val a = part(s, d).filter(col("p_partkey") % ma === 0)
      .select(col("p_partkey").as("ka"), col("p_name").as("na"))
    val b = part(s, d).filter(col("p_partkey") % mb === 0)
      .select(col("p_partkey").as("kb"), col("p_name").as("nb"))
    a.join(broadcast(b), col("ka") < col("kb"))
      .select(col("ka"), col("kb"),
        round(graft.functions.StringSimilarityExpressions
          .jaroWinkler(col("na"), col("nb")), 5).as("sim"))
      .filter(col("sim") >= 0.85)
  }

  // ---------------------------------------------------- Allen's intervals

  /** The 13-relation Allen interval-algebra classifier as ONE CASE text,
    * evaluated verbatim by both engines (q160's one-text-two-engines
    * pattern): order matters — the equality relations are tested before
    * the strict ones they border, so the branches are mutually exclusive
    * by construction. */
  val AllenCaseSql: String =
    "CASE WHEN sa = sb AND ea = eb THEN 'equals' " +
      "WHEN ea < sb THEN 'before' " +
      "WHEN sa > eb THEN 'after' " +
      "WHEN ea = sb THEN 'meets' " +
      "WHEN sa = eb THEN 'met_by' " +
      "WHEN sa = sb AND ea < eb THEN 'starts' " +
      "WHEN sa = sb THEN 'started_by' " +
      "WHEN ea = eb AND sa > sb THEN 'finishes' " +
      "WHEN ea = eb THEN 'finished_by' " +
      "WHEN sa > sb AND ea < eb THEN 'during' " +
      "WHEN sa < sb AND ea > eb THEN 'contains' " +
      "WHEN sa < sb AND ea < eb THEN 'overlaps' " +
      "ELSE 'overlapped_by' END"

  /** Allen interval-algebra census over per-user event intervals on an
    * HOUR grid: [hour(ts), hour(ts) + 1 + value/60h) — the coarse grid is
    * what makes the boundary relations (meets/starts/finishes/equals)
    * actually occur; on raw millisecond endpoints the census collapses to
    * before/after/overlaps. Every (even-id, odd-id) same-user pair is
    * classified into exactly one of the 13 relations — the even/odd split
    * yields pairs on BOTH sides of each other in time (event ids
    * correlate with time, so `ida < idb` pairing would never produce the
    * six inverse relations). The pair join is PER-USER (equi-join on
    * user_id), so the quadratic blowup is bounded by the busiest user,
    * not the table — the standard way interval pair analytics stay
    * feasible at scale (q99's sweep line is the global-count sibling;
    * this is the pair-classification one). Casts are floor-explicit:
    * DuckDB CAST(double AS BIGINT) rounds where Spark truncates. */
  def allenIntervals(s: SparkSession, d: String): DataFrame = {
    val iv = graft.operators.Tables.events(s, d)
      .filter(col("user_id") % 5 === 0)
      .select(col("event_id"), col("user_id"),
        expr("unix_millis(ts) div 3600000").as("st"),
        (expr("unix_millis(ts) div 3600000") + lit(1L) +
          expr("CAST(floor(value) AS BIGINT) div 60")).as("en"))
    val a = iv.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("st").as("sa"), col("en").as("ea"))
    val b = iv.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("st").as("sb"), col("en").as("eb"))
    a.join(b, Seq("user_id"))
      .select(expr(AllenCaseSql).as("rel"))
      .groupBy(col("rel"))
      .agg(count(lit(1)).as("n"))
  }
}
