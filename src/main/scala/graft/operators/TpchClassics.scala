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

  /** Q1: pricing summary report. All eight aggregates in one pass;
    * shipdate predicate reaches the parquet scan. */
  def q1(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 2).as("sum_charge"),
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
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)

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
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
        2).as("revenue"))
  }
}
