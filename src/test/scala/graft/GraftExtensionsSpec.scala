package graft

/** SQL-surface spec: the extensions make the native expression callable from
  * spark.sql, and the catalog exposes every testdata table as a view.
  * (The shared test session is built with GraftExtensions — getOrCreate
  * reuses an existing session, so builder-time extensions must be on the
  * FIRST session a JVM creates; GraftSession does the same in production.) */
class GraftExtensionsSpec extends SparkTestBase {

  test("sorted_intersect_size is callable from SQL") {
    val n = spark.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      .head().getInt(0)
    assert(n === 2)
    val m = spark.sql(
      "SELECT sorted_intersect_size(array(1L,2L,3L), array(2L,3L,9L)) AS n")
      .head().getInt(0)
    assert(m === 2)
  }

  test("catalog views make every table SQL-queryable") {
    GraftCatalog.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      """SELECT count(*) FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
    val ev = spark.sql("SELECT max(ts) FROM events").head()
    assert(!ev.isNullAt(0))
    assert(GraftCatalog.TableNames.forall(spark.catalog.tableExists))
  }
}
