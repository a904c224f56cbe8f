package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Sanity checks per relational query on sf0.001 (the DuckDB hash-compare at
  * sf0.01 is the driver's gate; these are fast structural assertions). */
class RelationalSpec extends SparkTestBase {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns a non-degenerate result") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val n = df.count()
      assert(n >= 0, name)
      assert(df.columns.nonEmpty, name)
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("filter split is disjoint and covering") {
    val eq = Relational.filterEq(spark, sf0001).count()
    val neq = Relational.filterNeq(spark, sf0001).count()
    val all = Tables.orders(spark, sf0001).count()
    assert(eq + neq === all)
  }

  test("global count matches table size") {
    val cnt = Relational.countGlobal(spark, sf0001).head().getLong(0)
    assert(cnt === Tables.lineitem(spark, sf0001).count())
  }

  test("topk emits at most 3 rows per customer, ranks 1..3") {
    import org.apache.spark.sql.functions._
    val t = Relational.topKPerKey(spark, sf0001)
    val maxPer = t.groupBy(col("o_custkey")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxPer <= 3)
    assert(t.filter(col("rk") < 1 || col("rk") > 3).count() === 0)
  }

  test("broadcast join plan actually broadcasts the dim side") {
    val plan = Relational.joinBroadcast(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("scan-project plan prunes columns at the parquet reader") {
    val plan = Relational.scanProject(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("l_orderkey"))
    assert(!plan.contains("l_comment"))
    assert(!plan.contains("l_shipdate"))
  }

  test("filter pushes down to the scan") {
    val plan = Relational.filterEq(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_orderstatus"), plan.take(2000))
  }
}
