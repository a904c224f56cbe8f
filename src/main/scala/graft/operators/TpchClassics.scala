package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Faithful TPC-H classics over the driver's star schema — the standard
  * analytic shapes a user of ANY warehouse engine expects to run verbatim.
  * Q1 (pricing summary), Q3 (shipping priority; o_orderpriority stands in
  * for the absent o_shippriority), Q5 (local supplier volume). Each is the
  * canonical plan Spark should pick on a cluster: Q1 one partial+final
  * aggregation over the pruned scan; Q3 broadcast dim filters into a
  * fact-fact shuffle join + TakeOrdered; Q5 a broadcast dim chain with the
  * nation-colocation predicate applied at the join, not after. */
object TpchClassics {
  import Tables._

  import org.apache.spark.sql.Column

  /** Money columns go through DECIMAL(18,2) BEFORE arithmetic: decimal
    * sums are exact and associative, so partial-aggregation order (and
    * the oracle's different order) can't move a revenue total across a
    * half-cent rounding boundary — doubles did, by one cent, at sf0.01. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Σ price·(1−discount), exact; the scale-4 total is rounded to cents
    * IN DECIMAL (HALF_UP on the exact value) and only then widened to
    * double — rounding after a double cast turns exact .xx5 ties into
    * whatever the binary approximation fell on, and Spark and DuckDB
    * fall on different sides of it. */
  private def revenueSum: Column =
    sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
      .cast("decimal(38,2)").cast("double")

  /** Q1: pricing summary report. All eight aggregates in one pass;
    * shipdate predicate reaches the parquet scan. */
  def q1(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("decimal(38,2)")
          .cast("double").as("sum_base_price"),
        revenueSum.as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) *
          (lit(1) - dec(col("l_discount"))) *
          (lit(1) + dec(col("l_tax")))).cast("decimal(38,2)")
          .cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Q3: shipping priority — top 10 undelivered-revenue orders for one
    * market segment. The two dim filters broadcast; lineitem⋈orders is
    * the one real shuffle; the global top-10 is TakeOrderedAndProject,
    * never a full sort. */
  def q3(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1995-03-15").cast("timestamp")
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = orders(s, d).filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val l = lineitem(s, d).filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(revenueSum.as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  }

  /** Q4 (adapted): order-priority checking — orders counted when at
    * least one lineitem shipped after the order date (the reference
    * schema has no commitdate/receiptdate, so late-ship stands in). The
    * EXISTS plans as a left-semi join; lineitem projects only the two
    * columns the predicate needs. */
  def q4(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val l = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q10: returned-item reporting — top 20 customers by revenue lost to
    * returns in a quarter. One fact-fact shuffle; customer and nation
    * broadcast; TakeOrdered top-20 with a full deterministic tiebreak. */
  def q10(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val c = customer(s, d).select(col("c_custkey"), col("c_name"),
      col("c_acctbal"), col("c_nationkey"))
    val n = nation(s, d).select(col("n_nationkey"), col("n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(revenueSum.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q13: customer order-count distribution INCLUDING zero-order
    * customers — the left outer join is the whole point (an inner join
    * silently drops the largest bucket). */
  def q13(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_custkey"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Q18 (adapted): large-volume orders — orders whose total quantity
    * exceeds the threshold, with customer attribution. The HAVING
    * pre-filters ON THE AGGREGATE before the dim join, so only
    * qualifying orders join customer. */
  def q18(s: SparkSession, d: String, minQty: Double = 250): DataFrame = {
    val big = lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("total_qty"))
  }

  /** Q22 (adapted): global sales opportunity — customers above the
    * average positive account balance with NO orders, bucketed by a
    * key-derived "country code" (the schema has no c_phone). The scalar
    * average is an uncorrelated subquery (broadcast one row); the NOT
    * EXISTS is a left-anti join. */
  def q22(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        (col("c_custkey") % 7 + 10).cast("int").as("cntrycode"))
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("ab"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(orders(s, d).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
  }

  /** Q7 (adapted): volume shipping between two nations — revenue by
    * (supplier nation, customer nation, year) for one nation PAIR in
    * both directions. The disjunctive pair predicate sits INSIDE the
    * join of two broadcast nation maps; the year extraction groups the
    * one fact-fact shuffle's output. */
  def q7(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d).select(col("n_nationkey"), col("n_name"))
    val supN = supplier(s, d).join(broadcast(n),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = customer(s, d).join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_3" &&
        col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" &&
          col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenueSum.as("revenue"))
  }

  /** Q8 (adapted): market share — one nation's fraction of regional
    * revenue per order-year. The share is a conditional-sum ratio inside
    * ONE aggregation pass (no second scan, no self-join), in exact
    * decimal until the final division. */
  def q8(s: SparkSession, d: String): DataFrame = {
    val n = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val custN = customer(s, d).join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val vol = lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      .select(year(col("o_orderdate")).as("o_year"),
        (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("v"),
        col("n_name"))
    vol.groupBy(col("o_year"))
      .agg(
        sum(when(col("n_name") === "NATION_2", col("v"))
          .otherwise(lit(0).cast("decimal(18,4)"))).as("nv"),
        sum(col("v")).as("tv"))
      .select(col("o_year"),
        round(col("nv").cast("double") / col("tv").cast("double"), 6)
          .as("mkt_share"))
  }

  /** Q14 (adapted): promo revenue — the fraction of revenue from parts
    * whose name carries the "red" marker, one month. The LIKE classifies
    * inside the aggregation (conditional sum), part broadcasts. */
  def q14(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select(col("p_partkey"), col("p_name"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_name").contains("red"),
          dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") * 100.0 /
          sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double"), 6).as("promo_revenue"))
  }

  /** Q19 (adapted): discounted revenue under DISJUNCTIVE multi-range
    * predicates (OR of ANDs over brand-analog × quantity bands) — the
    * optimizer test is that the common l_partkey = p_partkey conjunct is
    * factored OUT of the OR into the join key, leaving the residual
    * disjunction as a post-join filter instead of a nested-loop. */
  def q19(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select(col("p_partkey"),
      (col("p_partkey") % 5).cast("int").as("brand"))
    lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey") &&
        ((col("brand") === 1 && col("l_quantity").between(1, 11)) ||
          (col("brand") === 2 && col("l_quantity").between(10, 20)) ||
          (col("brand") === 3 && col("l_quantity").between(20, 30))))
      .agg(revenueSum.as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** Q5: local supplier volume — revenue by nation for one region-year,
    * counting only lineitems whose supplier and customer share a nation.
    * region→nation→customer broadcast down the chain; the colocation
    * predicate (c_nationkey = s_nationkey) is part of the supplier JOIN
    * condition, so mismatched pairs never reach the aggregation. */
  def q5(s: SparkSession, d: String): DataFrame = {
    val y0 = lit("1996-01-01").cast("timestamp")
    val y1 = lit("1997-01-01").cast("timestamp")
    val n = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val c = customer(s, d).join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val o = orders(s, d)
      .filter(col("o_orderdate") >= y0 && col("o_orderdate") < y1)
      .select(col("o_orderkey"), col("o_custkey"))
    val sup = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenueSum.as("revenue"))
  }

  /** Q6: forecasting revenue change — the canonical full-pushdown query:
    * every predicate (shipdate year, discount band, quantity cap)
    * reaches the parquet scan, and the single global aggregate is one
    * partial+final pass over the pruned 3-column read. Revenue
    * accumulates in DECIMAL (exact, associative) and widens to double
    * once. */
  def q6(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      // NO scale-reduction cast before the double: Spark rounds decimal
      // ties HALF_UP, DuckDB HALF_EVEN — a half-cent tie (q236 hit one)
      // flips the last cent between engines. The scale-4 sum is exact;
      // its double cast is correctly rounded and identical everywhere.
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))

  /** Q15: top supplier by quarterly revenue. The revenue "view" is one
    * partial-aggregated rollup per supplier; the max-revenue filter
    * compares IN DECIMAL (exact), so the ties-included semantics of the
    * original query survive — a double comparison could drop or add a
    * tied supplier on summation-order noise. The 1-row max broadcasts. */
  def q15(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1) - dec(col("l_discount")))).as("tr"))
      .localCheckpoint() // max pass + the equality filter
    val mx = rev.agg(max(col("tr")).as("mx"))
    supplier(s, d)
      .join(rev, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(mx))
      .filter(col("tr") === col("mx"))
      // full-scale decimal → double (see q6's tie-rounding note)
      .select(col("s_suppkey"), col("s_name"),
        col("tr").cast("double").as("total_revenue"))
  }

  /** Q17 (adapted: brand filter only — the p_container column does not
    * exist in this schema): average yearly revenue lost if small-
    * quantity orders (below 20% of the part's average quantity) were
    * not taken. The correlated scalar subquery is decorrelated by hand
    * into a per-part aggregate joined back — the rewrite Catalyst
    * would have to find, stated directly. The threshold comparison is
    * sum/(5·cnt) on exact integers (0.2·avg with a single division);
    * revenue sums in DECIMAL. */
  def q17(s: SparkSession, d: String): DataFrame = {
    val lim = lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("sq"),
        count(lit(1)).as("cq"))
      .select(col("pk"),
        (col("sq") / (lit(5.0) * col("cq"))).as("lim"))
    val p = part(s, d).filter(col("p_brand") === "Brand#23")
      .select(col("p_partkey"))
    lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(lim, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("lim"))
      .agg((sum(dec(col("l_extendedprice"))).cast("decimal(38,2)")
        .cast("double") / 7.0).as("avg_yearly"))
  }

  /** Q9 (adapted: p_retailprice stands in for the absent
    * ps_supplycost — partsupp does not exist in this schema): product
    * type profit by supplier nation and order year, for parts whose
    * name carries the "blue" marker (this corpus's color vocabulary
    * has no "green"). The canonical 5-way star join:
    * part (filtered, broadcast), supplier→nation (broadcast chain),
    * orders joined on the fact key for the year. Profit stays in
    * DECIMAL through the aggregation (scale-4 exact; no scale-
    * reduction recast — see q6's tie-rounding note). */
  def q9(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).filter(col("p_name").contains("blue"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = supplier(s, d)
      .join(broadcast(nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val o = orders(s, d).select(col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"))
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - dec(col("l_discount"))) -
          dec(col("p_retailprice")) * dec(col("l_quantity")))
        .cast("double").as("sum_profit"))
  }

  /** The lineitem-derived SUPPLY CATALOG standing in for the absent
    * partsupp table (Q2/Q11/Q16/Q20 below): every (part, supplier) pair
    * that ever traded, with its minimum observed unit price in exact
    * integer cents — `div`, not `/`, so the "cost" is bit-stable. */
  private def supplyCatalog(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(expr(
        "cast(round(l_extendedprice * 100, 0) as bigint) " +
          "div cast(l_quantity as bigint)")).as("cost"))

  /** Q2 (adapted): minimum-cost supplier per part in a region, over the
    * lineitem-derived supply catalog. The correlated min subquery
    * decorrelates into a per-part MIN joined back on equality — exact
    * integer cents, so the tie semantics (ALL min-cost suppliers
    * return) are precise. Region chain and part filter broadcast. */
  def q2(s: SparkSession, d: String): DataFrame = {
    val rs = supplier(s, d)
      .join(broadcast(nation(s, d)
        .join(broadcast(region(s, d)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val p = part(s, d).filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_name"))
    val cand = supplyCatalog(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(rs), col("l_suppkey") === col("s_suppkey"))
    val mc = cand.groupBy(col("p_partkey").as("pk"))
      .agg(min(col("cost")).as("m"))
    cand.join(mc, col("p_partkey") === col("pk") &&
        col("cost") === col("m"))
      .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"), col("p_name"),
        (col("cost") / lit(100.0)).as("supply_cost"))
  }

  /** Q11 (adapted): important stock — parts whose traded value through
    * one nation's suppliers exceeds a fraction of that nation's total.
    * Values are exact cent longs; the single global total broadcasts;
    * the fraction compare is one IEEE multiply. */
  def q11(s: SparkSession, d: String, frac: Double = 0.001): DataFrame = {
    val sup = supplier(s, d)
      .join(broadcast(nation(s, d)
        .filter(col("n_name") === "NATION_9")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = lineitem(s, d)
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(expr("cast(round(l_extendedprice * 100, 0) as bigint)"))
        .as("val"))
    val tot = v.agg(sum(col("val")).as("tot"))
    v.crossJoin(broadcast(tot))
      .filter(col("val") > lit(frac) * col("tot"))
      .select(col("l_partkey"), (col("val") / lit(100.0)).as("value"))
  }

  /** Q12 (adapted): shipping-mode priority analysis. The schema has no
    * l_shipmode/commitdate/receiptdate; mode is key-derived (the q19/q22
    * idiom) and "late" is ship-after-order (the q4 stand-in). One
    * fact-fact join, counts conditional inside the aggregation. */
  def q12(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(year(col("l_shipdate")) === 1997 &&
        (col("l_suppkey") % 3).isin(0, 1))
      .select(col("l_orderkey"), col("l_shipdate"),
        when(col("l_suppkey") % 3 === 0, "MAIL").otherwise("SHIP")
          .as("shipmode"))
      .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .groupBy(col("shipmode"))
      .agg(count_if(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .as("high_line_count"),
        count_if(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .as("low_line_count"))

  /** Q16 (adapted): supplier counts per (brand, type, size) bucket over
    * the supply catalog, excluding one brand, one type class, and
    * "complaint" suppliers (negative balance stands in for the comment
    * filter). The exclusion is a broadcast anti-join; the count is a
    * distinct aggregate per bucket. */
  def q16(s: SparkSession, d: String): DataFrame = {
    val bad = supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val sp = lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
    sp.join(broadcast(part(s, d)
        .filter(col("p_brand") =!= "Brand#5" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 15, 25, 35, 45))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q20 (adapted): dominant suppliers of "red" parts in one nation —
    * suppliers who shipped more than half of a red part's 1997 volume
    * (availqty-vs-half-demand becomes a share-of-volume threshold on
    * exact integer quantities). Two partial-aggregated rollups, one
    * equality join between them, broadcast part filter and nation
    * chain, one distinct. */
  def q20(s: SparkSession, d: String): DataFrame = {
    val q97 = lineitem(s, d)
      .filter(year(col("l_shipdate")) === 1997)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
      .localCheckpoint() // per-pair rollup feeds both the total and join
    val qt = q97.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("q")).as("tot"))
    val rp = part(s, d).filter(col("p_name").contains("red"))
      .select(col("p_partkey"))
    val dom = q97.join(qt, col("l_partkey") === col("pk"))
      .filter(col("q") > lit(0.5) * col("tot"))
      .join(broadcast(rp), col("l_partkey") === col("p_partkey"))
      .select(col("l_suppkey")).distinct()
    dom.join(supplier(s, d)
        .join(broadcast(nation(s, d)
          .filter(col("n_name") === "NATION_9")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
  }

  /** Q21 (adapted): suppliers who kept orders waiting — for finished
    * orders, the supplier shipped late (ship-after-order stands in for
    * receipt-after-commit), ANOTHER supplier was on the order (semi
    * join), and NO other supplier was also late (anti join). The
    * EXISTS/NOT EXISTS pair is the whole point of Q21 and survives the
    * adaptation intact; both run as pair-level semi/anti joins with an
    * order-key equi component. */
  def q21(s: SparkSession, d: String): DataFrame = {
    val sl = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
      .localCheckpoint() // probe side of the EXISTS
    val late = lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .localCheckpoint() // reused: base, EXISTS probe, NOT EXISTS probe
    val hasOther = late.join(sl,
      col("l_orderkey") === col("ok") && col("l_suppkey") =!= col("sk"),
      "left_semi")
    val lateOther = late.select(col("l_orderkey").as("ok2"),
      col("l_suppkey").as("sk2"))
    val waits = hasOther.join(lateOther,
      col("l_orderkey") === col("ok2") &&
        col("l_suppkey") =!= col("sk2"), "left_anti")
    waits
      .join(broadcast(supplier(s, d)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }
}
