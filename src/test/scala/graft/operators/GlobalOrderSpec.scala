package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** GlobalOrder must reproduce the single-partition window results
  * exactly — the whole point is swapping the plan shape, not the
  * semantics. */
class GlobalOrderSpec extends SparkTestBase {

  test("rowNumber equals row_number over a global window") {
    val base = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_totalprice"))
    val expected = base.withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice"), col("o_orderkey"))).cast("long"))
      .select(col("o_orderkey"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = GlobalOrder.rowNumber(base, "rn",
        col("o_totalprice"), col("o_orderkey"))
      .select(col("o_orderkey"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("rowNumber over a DESC order equals the window row_number") {
    val base = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_acctbal"))
    val expected = base.withColumn("rn", row_number().over(
        Window.orderBy(col("c_acctbal").desc, col("c_custkey"))).cast("long"))
      .select(col("c_custkey"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = GlobalOrder.rowNumber(base, "rn",
        col("c_acctbal").desc, col("c_custkey"))
      .select(col("c_custkey"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
  }

  test("runningSums (two value columns) equals global cumulative windows") {
    val base = Tables.orders(spark, sf0001)
      .groupBy(col("o_totalprice").as("score"))
      .agg(count(lit(1)).as("n"),
        sum((col("o_custkey") % 2).cast("long")).as("p"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = base
      .withColumn("ca", sum(col("n")).over(w))
      .withColumn("cb", sum(col("p")).over(w))
      .select(col("score"), col("ca"), col("cb"))
      .collect().map(r => (r.getDouble(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val got = GlobalOrder.runningSums(base, Seq(col("score")),
        Seq("ca" -> col("n"), "cb" -> col("p")))
      .select(col("score"), col("ca"), col("cb"))
      .collect().map(r => (r.getDouble(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === expected)
  }

  test("ntileFromRowNumber matches SQL ntile for ragged n") {
    for (n <- Seq(7L, 10L, 23L, 40L); k <- Seq(4, 10)) {
      import spark.implicits._
      val df = (1L to n).toDF("rn")
      val got = df.select(col("rn"),
          GlobalOrder.ntileFromRowNumber(col("rn"), lit(n), k).as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val exp = df.select(col("rn"), ntile(k).over(
          Window.orderBy(col("rn"))).cast("long").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === exp, s"n=$n k=$k")
    }
  }
}
