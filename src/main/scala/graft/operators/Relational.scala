package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's operator inventory (SURVEY §2, S1/T1–T4/F1–F2/A1/P1/K1)
  * re-expressed in generic relational form over the oracle tables, plus the
  * relational breadth a real engine needs (joins, group-by, windows, set ops,
  * top-k) — every one a declarative DataFrame plan so Catalyst gets pushdown,
  * pruning, partial aggregation and join-strategy selection for free.
  *
  * Scale notes are attached per query: which side broadcasts, where the
  * shuffle lands, what AQE re-plans.
  */
object Relational {
  import Tables._

  /** S1/P1: scan with projection — column pruning must reach the parquet
    * reader (ReadSchema carries only 2 of 11 columns). */
  def scanProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))

  /** F1: equality filter (delivered-branch analog). Predicate pushes into
    * the parquet scan (PushedFilters: EqualTo). */
  def filterEq(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  /** F2: complement filter (other-status analog) — together with
    * [[filterEq]] a disjoint two-way split of the parent. */
  def filterNeq(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") =!= "F")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  /** A1: global count — partial per-partition counts + single final merge,
    * the same combiner-lifted shape Beam runs. */
  def countGlobal(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(count(lit(1)).as("cnt"))

  /** T1+T2+T3+T4: the cleaning chain as expressions over a string column —
    * strip one trailing colon, lowercase, delete [?%&], add constant. All
    * four fuse into one codegen stage over the scan. */
  def cleanChain(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
      col("p_partkey"),
      regexp_replace(
        lower(regexp_replace(col("p_name"), ":$", "")), "[?%&]", "")
        .as("cleaned_name"),
      lit("1").as("new_col"))

  /** P1: projection / schema-ify with explicit aliasing + string casts (the
    * reference's all-STRING output contract). */
  def projectSchema(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey").cast("string").as("order_id"),
      col("o_custkey").cast("string").as("customer_id"),
      col("o_orderstatus").as("status"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))

  /** Split + A1 counts: per-status record counts (the delivered/other count
    * pair generalized). One shuffle on a low-cardinality key; partial
    * aggregation makes the shuffle tiny regardless of input size. */
  def splitCounts(s: SparkSession, d: String): DataFrame =
    orders(s, d).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

  /** K1: day-partitioned sink analog — per-day row counts, i.e. exactly the
    * partition manifest a day-partitioned append produces. */
  def partitionCounts(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))

  /** Group-by aggregation (TPC-H Q1 shape): wide partial aggregation, tiny
    * shuffle. Doubles rounded so the oracle hash is stable across engines. */
  def aggGroupBy(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))

  /** Broadcast hash join: customer is the small dim side — broadcast() keeps
    * the 100 TB fact side shuffle-free. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(broadcast(customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))

  /** Large-large join: lineitem ⋈ orders on the order key — a genuine
    * shuffle join; AQE handles skew/coalescing. Aggregated output keeps the
    * oracle compare small. */
  def joinLarge(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))

  /** Multi-way join through the dimension chain with two broadcasts:
    * supplier ⋈ nation ⋈ region, then the fact side joins once. */
  def joinMultiway(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
        count(lit(1)).as("n"))

  /** Left-anti join (NOT EXISTS): customers with no high-value orders.
    * Broadcast the distinct key set when it fits; otherwise shuffle-anti. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** Left-semi join (EXISTS): parts that appear in any lineitem. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))

  /** Window function: top-3 orders per customer by price (rank with full
    * deterministic tie-break). One shuffle on the partition key; at scale
    * this is the canonical skew candidate — AQE + key salting if a customer
    * is hot. */
  def topKPerKey(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("rk"))
  }

  /** Distinct (exact dedup on key columns) + distinct count. */
  def distinctKeys(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** Sort + limit (global top-k): AQE turns this into TakeOrderedAndProject —
    * no full sort materialization. Deterministic total order. */
  def orderByLimit(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))

  /** Set op: union of two branch selections then grouped — exercises
    * UNION ALL + re-aggregation. */
  def unionAgg(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val hi = o.filter(col("o_totalprice") > 200000)
      .select(col("o_orderstatus"), lit("hi").as("band"))
    val lo = o.filter(col("o_totalprice") <= 200000)
      .select(col("o_orderstatus"), lit("lo").as("band"))
    hi.unionAll(lo).groupBy(col("o_orderstatus"), col("band"))
      .agg(count(lit(1)).as("n"))
  }

  /** Event-time tumbling-window aggregation (batch form of the streaming
    * windowed agg): per-hour event counts + value sums. */
  def eventsWindowed(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(
        col("ts").cast("date").as("day"),
        hour(col("ts")).as("hr"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))

  /** As-of join (point-in-time lookup): for each error event, the latest
    * purchase of the same user at-or-before it. Expressed as the union-
    * window composition — one shuffle on the key, running max over event
    * time — rather than a pairwise time-range join: O(n log n) per key vs
    * O(n·m), and it survives any skew AQE can't fix because there is no
    * join fan-out at all. Millisecond timestamps for cross-engine hashing. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"),
      when(col("event_type") === "purchase", 1).otherwise(0).as("is_p"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("is_p").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    ev
      .withColumn("last_purchase_ms",
        max(when(col("is_p") === 1, col("ts_ms"))).over(w))
      .withColumn("n_purchases_before",
        sum(col("is_p")).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("last_purchase_ms"), col("n_purchases_before"))
  }

  /** As-of join on the NATIVE operator (graft.plans.AsOfJoinExec): each
    * click event picks up the most recent view event of the same user
    * at-or-before it. Same distribution/ordering contract as a sort-merge
    * join (hash on user, sort by (user, time)), then a single O(|L|+|R|)
    * merge pass per partition with one buffered row — no time-range
    * fan-out. The view side is first collapsed to one row per (user, ts)
    * so tie-breaks are engine-independent; oracle is DuckDB's built-in
    * ASOF LEFT JOIN. */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(round(max(col("value")), 2).as("view_value"))
    graft.plans.AsOf.join(clicks, views, Seq("user_id"),
      "ts_ms", "ts_ms", rightSuffix = "_v")
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("ts_ms_v").as("view_ms"), col("view_value_v").as("view_value"))
  }

  /** q74's as-of join with a 1-hour TOLERANCE (pandas merge_asof's
    * `tolerance`): a nearest view older than the bound null-extends
    * instead of matching — stale state must not stitch onto an event.
    * Inside the exec this is one long comparison against the buffered
    * candidate; the oracle expresses it as the plain ASOF join with the
    * too-far matches nulled out after the fact. */
  def asofJoinTolerance(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(round(max(col("value")), 2).as("view_value"))
    graft.plans.AsOf.join(clicks, views, Seq("user_id"),
      "ts_ms", "ts_ms", rightSuffix = "_v",
      toleranceUnits = Some(3600L * 1000))
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("ts_ms_v").as("view_ms"), col("view_value_v").as("view_value"))
  }

  /** The q74 as-of join driven END-TO-END THROUGH SQL: temp views + the
    * `asof_join(...)` table-valued function (GraftExtensions), which the
    * injected resolution rule rewrites into the same AsOfJoinPlan /
    * AsOfJoinExec chain the DataFrame API builds. Hash-matching q74's
    * DuckDB ASOF oracle proves the SQL surface is semantics-preserving. */
  def asofJoinSql(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"), col("value"))
    ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
      .createOrReplaceTempView("graft_asof_clicks")
    ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(round(max(col("value")), 2).as("view_value"))
      .createOrReplaceTempView("graft_asof_views")
    s.sql("""
      SELECT event_id, user_id, ts_ms,
             ts_ms_r AS view_ms, view_value_r AS view_value
      FROM asof_join('graft_asof_clicks', 'graft_asof_views',
                     'user_id', 'ts_ms', 'ts_ms', 'backward')""")
  }

  /** FORWARD as-of on the native operator: each error event picks up the
    * next purchase of the same user at-or-after it (time-to-recovery
    * shape). Same merge operator as q74 running in forward mode — no
    * buffered row at all: the cursor's head row serves all left rows it
    * is eligible for. */
  def asofJoinForward(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ms")).distinct()
    graft.plans.AsOf.join(errors, purchases, Seq("user_id"),
      "ts_ms", "ts_ms", rightSuffix = "_p", forward = true)
      .select(col("event_id"), col("user_id"), col("ts_ms"),
        col("ts_ms_p").as("next_purchase_ms"),
        (col("ts_ms_p") - col("ts_ms")).as("gap_ms"))
  }

  /** Rollup aggregation (hierarchical subtotals): status × priority with
    * per-status and grand totals — Catalyst expands to a single Expand +
    * one aggregation, not one scan per level. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("revenue"))

  /** Semi-structured extraction: pull a typed value out of the JSON props
    * column and aggregate — the schema-on-read path for event payloads. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))

  /** Packed-list explosion (the reference's `items` field generalized,
    * SURVEY §2.3): explode a delimited string column to per-element rows
    * and aggregate element frequencies. */
  def explodeItems(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** Set ops: customers with orders in BOTH halves of the price range
    * (INTERSECT) — planned as a semi-join pair, no materialized distinct. */
  def intersectKeys(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      .intersect(
        o.filter(col("o_totalprice") <= 150000).select(col("o_custkey")))
  }

  /** Set ops: customer keys appearing only above the price split (EXCEPT). */
  def exceptKeys(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      .except(
        o.filter(col("o_totalprice") <= 150000).select(col("o_custkey")))
  }

  /** Predicate battery: LIKE, IN, BETWEEN, IS NULL handling, CASE — the
    * scalar-predicate surface the reference never needed but a complete
    * engine must push down / evaluate correctly. */
  def predicates(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .filter(col("p_name").like("%al%") &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
        col("p_size").between(5, 40) &&
        col("p_retailprice").isNotNull)
      .select(col("p_partkey"), col("p_brand"),
        when(col("p_size") < 20, lit("small")).otherwise(lit("large"))
          .as("size_band"))

  /** Pivot-style conditional aggregation: order counts per status spread
    * across priority columns — one pass, FILTER-style aggregates (portable
    * to any SQL engine, unlike engine-specific PIVOT syntax). */
  def pivotAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"),
        count(when(col("o_orderpriority") === "2-HIGH", 1)).as("n_high"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("n_other"))

  /** Exact interpolated percentiles (quartiles of order value). At 100 TB
    * the drop-in is approx_percentile (t-digest, fixed memory, no sort);
    * exact is used here because the oracle compares values. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d).agg(
      round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
      round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
      round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"),
      round(max(col("o_totalprice")), 2).as("p100"))

  /** Cube aggregation: all 2^k grouping combinations in one Expand pass. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  /** Skew-salted large join: the left (fact) side is salted into
    * `SaltBuckets` sub-keys and the right side replicated per salt, so one
    * hot join key spreads over `SaltBuckets` reducers. Semantically
    * transparent — the oracle is the plain join. (AQE's skew-join handles
    * moderate skew automatically; explicit salting is the belt-and-braces
    * form for pathological keys.) */
  val SaltBuckets = 8

  def saltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .withColumn("salt", pmod(xxhash64(col("l_linenumber")), lit(SaltBuckets)))
    val o = orders(s, d)
      .withColumn("salt", explode(sequence(lit(0L), lit(SaltBuckets - 1L))))
    li.join(o,
        li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
  }

  /** Hot-key-only salted join — the production shape of q41: detect keys
    * whose row count exceeds a threshold (one partial-aggregated pass),
    * salt ONLY those (cold keys join plainly, no replication), union the
    * two joins. Replication cost is paid for the skewed sliver instead of
    * the whole dim side. Oracle = the plain join, proving the rewrite
    * transparent. */
  def hotKeySaltedJoin(s: SparkSession, d: String, hotThreshold: Long = 5)
      : DataFrame = {
    val li = lineitem(s, d)
    val o = orders(s, d)
    val hotKeys = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > hotThreshold)
      .select(col("l_orderkey").as("hot_key"))

    val liTagged = li.join(broadcast(hotKeys),
      col("l_orderkey") === col("hot_key"), "left")
    val liHot = liTagged.filter(col("hot_key").isNotNull)
      .withColumn("salt", pmod(xxhash64(col("l_linenumber")), lit(SaltBuckets)))
    val liCold = liTagged.filter(col("hot_key").isNull).drop("hot_key")

    val oTagged = o.join(broadcast(hotKeys),
      col("o_orderkey") === col("hot_key"), "left")
    val oHot = oTagged.filter(col("hot_key").isNotNull)
      .withColumn("salt", explode(sequence(lit(0L), lit(SaltBuckets - 1L))))
    val oCold = oTagged.filter(col("hot_key").isNull).drop("hot_key")

    val hot = liHot.join(oHot,
      liHot("l_orderkey") === oHot("o_orderkey") &&
        liHot("salt") === oHot("salt"))
    val cold = liCold.join(oCold, col("l_orderkey") === col("o_orderkey"))

    hot.select(col("o_orderpriority"), col("l_extendedprice"))
      .unionAll(cold.select(col("o_orderpriority"), col("l_extendedprice")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))
  }

  /** TF-IDF featurization, fully relational: explode tokens, TF by
    * (doc, term), DF by term via a window over the pair frame, smooth-IDF.
    * Two shuffles ((doc,term) agg + term window); no ml.feature stage. */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextAnalysis
    val docs = documents(s, d)
    val pairs = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    val withDf = pairs.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("word"))))
    withDf.crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("word"), col("tf"),
        round(col("tf") *
          (log((col("nd") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 4)
          .as("tfidf"))
  }

  /** Exact distinct count (oracle-comparable). The approximate companion is
    * [[approxDistinctSketch]] — sketches aren't cross-engine comparable, so
    * the two are separate queries. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      count(lit(1)).as("cnt"))

  /** HLL++ distinct-count sketch alongside the exact value — the sketch is
    * the 100 TB answer (no shuffle of distinct values, fixed memory per
    * partition). The spec asserts the sketch is within 5% of exact. */
  def approxDistinctSketch(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts"))

  /** Driver-checkable form of [[approxDistinctSketch]]: the exact count
    * (oracle-reproducible) plus the error bound collapsed to a boolean.
    * The estimate itself cannot be hashed cross-engine (DuckDB has no
    * HLL++ with Spark's exact register layout), but the INVARIANT —
    * estimate within the configured 5% rsd of exact — is deterministic
    * on fixed data, so the driver gate now fails if the sketch path
    * breaks instead of recording rows-only. */
  def approxDistinctCheck(s: SparkSession, d: String): DataFrame =
    approxDistinctSketch(s, d).select(
      col("exact_parts"),
      (abs(col("approx_parts") - col("exact_parts")) <=
        col("exact_parts") * 0.05).as("within_5pct"))

  /** Runtime bloom filter made EXPLICIT: the dim side's key set is
    * sketched once (one small-side aggregate), and the probe runs as a
    * native codegen'd predicate ON THE FACT SCAN, before the shuffle —
    * rows that cannot join never enter the exchange. False positives are
    * removed by the exact semi join after; the oracle is the plain semi
    * join, so the hash match proves the pre-filter transparent. This is
    * the mechanism behind spark.sql.optimizer.runtime.bloomFilter, built
    * from the public pieces (util.sketch.BloomFilter + a custom
    * Expression) so the plan shows exactly where the pruning happens. At
    * 100 TB this is the difference between shuffling the full fact table
    * and shuffling the ~matching fraction. */
  def bloomPrunedJoin(s: SparkSession, d: String): DataFrame = {
    val dim = orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_custkey") % 7 === 0)
      .select(col("o_orderkey"))
    // empty dim ⇒ nothing can join (and BloomFilter.writeTo NPEs on a
    // never-written sketch): the always-false probe is the exact filter
    val nDim = dim.count()
    val probe =
      if (nDim == 0) lit(false)
      else {
        val bloom = dim.stat.bloomFilter("o_orderkey", math.max(nDim, 64), 0.01)
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos)
        graft.functions.BloomFilterExpressions
          .mightContainLong(col("l_orderkey"), bos.toByteArray)
      }
    val pruned = lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
      .filter(probe)
    pruned.join(dim, pruned("l_orderkey") === dim("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("qty"))
  }
}
