package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 (plus the BASELINE.json
  * extension surface) gets a `queries` entry; entries with a DuckDB-
  * expressible equivalent also get an `oracleSql` entry (hash-compared by the
  * driver at sf0.01). Column names/aliases are kept identical on both sides
  * — the compare sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast-join + aggregation through the dimension chain. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (Relational.scanProject(_, _)),
    "q02_filter_eq" -> (Relational.filterEq(_, _)),
    "q03_filter_neq" -> (Relational.filterNeq(_, _)),
    "q04_count_global" -> (Relational.countGlobal(_, _)),
    "q05_clean_chain" -> (Relational.cleanChain(_, _)),
    "q06_project_schema" -> (Relational.projectSchema(_, _)),
    "q07_split_counts" -> (Relational.splitCounts(_, _)),
    "q08_partition_counts" -> (Relational.partitionCounts(_, _)),
    "q09_agg_groupby" -> (Relational.aggGroupBy(_, _)),
    "q10_join_broadcast" -> (Relational.joinBroadcast(_, _)),
    "q11_join_large" -> (Relational.joinLarge(_, _)),
    "q12_join_multiway" -> (Relational.joinMultiway(_, _)),
    "q13_join_anti" -> (Relational.joinAnti(_, _)),
    "q14_join_semi" -> (Relational.joinSemi(_, _)),
    "q15_topk_per_key" -> (Relational.topKPerKey(_, _)),
    "q16_distinct" -> (Relational.distinctKeys(_, _)),
    "q17_orderby_limit" -> (Relational.orderByLimit(_, _)),
    "q18_union_agg" -> (Relational.unionAgg(_, _)),
    "q19_events_windowed" -> (Relational.eventsWindowed(_, _)),
    "q20_count_distinct" -> (Relational.approxDistinct(_, _)),
  )

  /** DuckDB equivalents, same column names (aliased identically on both
    * sides). Omitted where not SQL-expressible. */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_extendedprice FROM lineitem",
    "q02_filter_eq" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    "q03_filter_neq" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'F'",
    "q04_count_global" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q05_clean_chain" ->
      "SELECT p_partkey, regexp_replace(lower(regexp_replace(p_name, ':$', '')), '[?%&]', '', 'g') AS cleaned_name, '1' AS new_col FROM part",
    "q06_project_schema" ->
      "SELECT cast(o_orderkey AS varchar) AS order_id, cast(o_custkey AS varchar) AS customer_id, o_orderstatus AS status, strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM orders",
    "q07_split_counts" ->
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
    "q08_partition_counts" ->
      "SELECT cast(o_orderdate AS date) AS d, count(*) AS n FROM orders GROUP BY 1",
    "q09_agg_groupby" ->
      "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, round(sum(l_extendedprice), 2) AS sum_price, round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, round(avg(l_discount), 6) AS avg_disc, count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "q10_join_broadcast" ->
      "SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment",
    "q11_join_large" ->
      "SELECT o_orderstatus, count(*) AS n_items, round(sum(l_extendedprice), 2) AS total_price FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderstatus",
    "q12_join_multiway" ->
      "SELECT r_name, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name",
    "q13_join_anti" ->
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)",
    "q14_join_semi" ->
      "SELECT p_partkey, p_brand FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)",
    "q15_topk_per_key" ->
      "SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, cast(rk AS int) AS rk FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders) WHERE rk <= 3",
    "q16_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q17_orderby_limit" ->
      "SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25)",
    "q18_union_agg" ->
      "SELECT o_orderstatus, band, count(*) AS n FROM (SELECT o_orderstatus, 'hi' AS band FROM orders WHERE o_totalprice > 200000 UNION ALL SELECT o_orderstatus, 'lo' AS band FROM orders WHERE o_totalprice <= 200000) GROUP BY o_orderstatus, band",
    "q19_events_windowed" ->
      "SELECT cast(ts AS date) AS day, cast(hour(ts) AS int) AS hr, event_type, count(*) AS n, round(sum(value), 2) AS total_value FROM events GROUP BY 1, 2, 3",
    "q20_count_distinct" ->
      "SELECT count(DISTINCT l_partkey) AS exact_parts, count(*) AS cnt FROM lineitem",
  )
}
