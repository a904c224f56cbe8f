package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business-analytics breadth wave: market-basket association rules,
  * RFM segmentation, quantile normalization, referential-integrity
  * auditing, and marketing attribution. Every query is oracle-checked
  * against DuckDB on identical SQL semantics; doubles are rounded on
  * both sides before compare. These are the warehouse-workload shapes a
  * production pipeline runs daily at full scale, so each one documents
  * its 100 TB plan (what shrinks first, what broadcasts, where the one
  * unavoidable shuffle sits). */
object Analytics {
  import Tables._

  /** Market-basket association rules over order contents: for every pair
    * of part brands co-purchased in one order, support / confidence /
    * lift. The plan shrinks FIRST (distinct (order, brand) pairs — a
    * fraction of lineitem), then self-joins on the order key, so the
    * quadratic blowup is per-order (orders hold a handful of brands) and
    * never global. Brand marginals and the order count are tiny
    * single-row/25-row aggregates — both broadcast. At 100 TB the
    * (order, brand) distinct is the only wide shuffle; the pair join
    * reuses its hash partitioning on l_orderkey. */
  def basketLift(s: SparkSession, d: String): DataFrame = {
    val ob = lineitem(s, d)
      .join(part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .localCheckpoint() // reused: marginals, order count, both join sides
    val nOrders = ob.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val brandCnt = ob.groupBy(col("p_brand")).agg(count(lit(1)).as("c"))
    val pairs = ob.select(col("l_orderkey"), col("p_brand").as("brand_a"))
      .join(ob.select(col("l_orderkey"), col("p_brand").as("brand_b")),
        Seq("l_orderkey"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
    pairs
      .join(broadcast(brandCnt.select(col("p_brand").as("brand_a"),
        col("c").as("ca"))), Seq("brand_a"))
      .join(broadcast(brandCnt.select(col("p_brand").as("brand_b"),
        col("c").as("cb"))), Seq("brand_b"))
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        round(col("n_ab") / col("n_orders"), 5).as("support"),
        round(col("n_ab") / col("ca"), 5).as("confidence"),
        round(col("n_ab") * col("n_orders") / (col("ca") * col("cb")), 5)
          .as("lift"))
  }

  /** RFM segmentation: per-customer recency / frequency / monetary from
    * the orders table, each quartiled with ntile(4), then segment-level
    * rollup. Monetary is rounded to cents BEFORE the ntile ordering so
    * both engines sort identical values; every ntile ordering carries the
    * customer key as tiebreaker, making tile assignment fully
    * deterministic. ntile needs a global sort of the CUSTOMER-level
    * rollup (not the raw orders) — at 100 TB that is ~hundreds of
    * millions of 4-column rows, a range-partitioned sort Spark handles;
    * if even that is too hot, the swap-in is approx-quantile cutoffs
    * joined as a broadcast, same downstream shape. */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
    val rfm = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("f"),
        round(sum(col("o_totalprice")), 2).as("m"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_order")).as("r"),
        col("f"), col("m"))
    val rq = ntile(4).over(Window.orderBy(col("r"), col("o_custkey")))
    val fq = ntile(4).over(
      Window.orderBy(col("f").desc, col("o_custkey")))
    val mq = ntile(4).over(
      Window.orderBy(col("m").desc, col("o_custkey")))
    rfm.select(col("r"), col("f"), col("m"),
        rq.as("r_q"), fq.as("f_q"), mq.as("m_q"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("m")), 2).as("avg_monetary"),
        round(avg(col("f")), 4).as("avg_frequency"))
  }

  /** Quantile normalization: map every account balance to its global
    * percent_rank (rank-based, so equal balances normalize identically —
    * no tiebreaker needed), then per-nation distribution summary of the
    * normalized values. The rank is one global sort of a 2-column
    * projection; the rollup reuses nothing wider. The cross-engine
    * contract is exact because percent_rank is pure rank arithmetic —
    * no float summation before the final rounded aggregates. */
  def quantileNormalize(s: SparkSession, d: String): DataFrame = {
    val pr = percent_rank().over(Window.orderBy(col("c_acctbal")))
    customer(s, d)
      .select(col("c_nationkey"), col("c_acctbal"))
      .withColumn("q", pr)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("q")), 5).as("avg_q"),
        round(min(col("q")), 5).as("min_q"),
        round(max(col("q")), 5).as("max_q"))
  }

  /** Referential-integrity audit: orphan counts for every foreign-key
    * edge in the schema, one row per edge, via LEFT ANTI joins. Parent
    * key sets project to a single column before joining — nation /
    * customer / part / supplier broadcast outright, and the two
    * lineitem edges against orders reuse one shuffle. This is the
    * data-quality gate a pipeline runs after every ingest; at 100 TB
    * each anti-join is a broadcast probe when the parent's KEY COLUMN
    * fits (a billion longs ≈ 8 GB — then it degrades to a shuffled
    * anti-join on exactly that edge, nothing else changes). */
  def fkAudit(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(ck))
        .join(broadcast(parent.select(col(pk)).distinct()),
          col(ck) === col(pk), "left_anti")
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphan")))
        .select(lit(name).as("edge"), col("n_child"), col("n_orphan"),
          round(col("n_orphan") * 100.0 / col("n_child"), 4)
            .as("orphan_pct"))
    }
    val li = lineitem(s, d)
    edge("lineitem.l_orderkey->orders", li, "l_orderkey",
        orders(s, d), "o_orderkey")
      .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
        part(s, d), "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
        supplier(s, d), "s_suppkey"))
      .unionAll(edge("orders.o_custkey->customer", orders(s, d),
        "o_custkey", customer(s, d), "c_custkey"))
      .unionAll(edge("customer.c_nationkey->nation", customer(s, d),
        "c_nationkey", nation(s, d), "n_nationkey"))
      .unionAll(edge("supplier.s_nationkey->nation", supplier(s, d),
        "s_nationkey", nation(s, d), "n_nationkey"))
  }

  /** Last-touch marketing attribution: every purchase event credits the
    * most recent PRECEDING non-purchase event of the same user ('direct'
    * if none), then channel-level rollup of purchase count, revenue and
    * reach. One window pass per user (ordered by ts with event_id
    * tiebreaker — the carry-forward is last(ignoreNulls) over an
    * unbounded-preceding frame, so a purchase row contributes null and
    * correctly skips itself), one aggregation after. At 100 TB this is
    * the canonical "one shuffle on user_id, then reduce" shape; the
    * rollup output is channel-cardinality tiny. */
  def lastTouchAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events(s, d)
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("channel"), lit("direct")).as("channel"),
        col("user_id"), col("value"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"),
        count_distinct(col("user_id")).as("n_users"))
  }
}
