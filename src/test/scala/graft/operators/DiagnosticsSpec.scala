package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DiagnosticsSpec extends SparkTestBase {
  import spark.implicits._

  test("key skew profile surfaces the hot key and its ratio") {
    val df = (Seq.fill(100)(7L) ++ (0L until 50L)).toDF("k")
    val r = Diagnostics.keySkew(df, "k").head()
    assert(r.getAs[Long]("max_n") === 101) // 7L appears 100 + 1 times
    assert(r.getAs[Seq[String]]("top_keys").head === "7")
    assert(r.getAs[Double]("skew_ratio") >= 50.0)
    assert(r.getAs[Long]("n_keys") === 50)
  }

  test("key skew audit: a hot key past 1/32 of rows fires the salting " +
      "flag; balanced keys don't; top-8 share and ratio reconcile") {
    val dir = java.nio.file.Files.createTempDirectory("skewaudit").toString
    // events: user 7 owns 200 of 1000+200 rows (> 1/32) → flag fires
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (Seq.fill(200)(7L) ++ (1000L until 2000L))
      .map(u => (u, ts, "click", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // lineitem/orders: perfectly balanced → no flag
    (0L until 960L).map(k => (k % 96, k))
      .toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (0L until 960L).map(k => (k % 96, k))
      .toDF("o_custkey", "o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Diagnostics.keySkewAudit(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val ev = out("events.user_id")
    assert(ev.getAs[Boolean]("needs_salting"),
      "200 of 1200 rows on one key must flag at 32-way fair share")
    assert(ev.getAs[Long]("max_freq") === 200L &&
      ev.getAs[Long]("n_keys") === 1001L)
    // top-8 = the hot key (200) + seven singletons
    assert(ev.getAs[Double]("top8_share") ===
      math.rint(207.0 / 1200.0 * 1e6) / 1e6)
    assert(ev.getAs[Double]("skew_ratio") === 200.0) // median freq 1
    val li = out("lineitem.l_orderkey")
    assert(!li.getAs[Boolean]("needs_salting"))
    assert(li.getAs[Double]("skew_ratio") === 1.0)
  }

  test("broadcast advice: small dim yes, threshold respected") {
    val small = Tables.nation(spark, sf0001)
    val r = Diagnostics.broadcastAdvice(spark, small).head()
    assert(r.getAs[Boolean]("would_broadcast"))
    assert(BigInt(r.getAs[String]("estimated_bytes")) > 0)
  }

  test("broadcast advice survives the -1 disable idiom") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val r = Diagnostics.broadcastAdvice(spark, Tables.nation(spark, sf0001))
        .head()
      assert(!r.getAs[Boolean]("would_broadcast"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
