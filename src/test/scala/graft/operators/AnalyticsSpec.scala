package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant specs for the business-analytics wave (q186-q190). */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  test("basket lift: probability identities hold, one pair hand-checked") {
    val r = Analytics.basketLift(spark, sf0001).cache()
    assert(r.count() > 0)
    // support <= confidence (conf divides by the smaller marginal count)
    assert(r.filter($"support" > $"confidence" + 1e-9).count() === 0)
    assert(r.filter($"support" <= 0 || $"confidence" > 1.000001).count() === 0)
    // hand-recompute one pair from raw data
    val row = r.orderBy($"brand_a", $"brand_b").head()
    val a = row.getAs[String]("brand_a"); val b = row.getAs[String]("brand_b")
    val ob = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct().cache()
    val nOrders = ob.select($"l_orderkey").distinct().count()
    val ca = ob.filter($"p_brand" === a).count()
    val cb = ob.filter($"p_brand" === b).count()
    val nAb = ob.filter($"p_brand" === a).select($"l_orderkey")
      .intersect(ob.filter($"p_brand" === b).select($"l_orderkey")).count()
    assert(row.getAs[Long]("n_ab") === nAb)
    assert(math.abs(row.getAs[Double]("lift") -
      math.rint(nAb.toDouble * nOrders / (ca.toDouble * cb) * 1e5) / 1e5)
      < 1e-9)
    ob.unpersist(); r.unpersist()
  }

  test("rfm segments: tiles balanced, customers conserved") {
    val r = Analytics.rfmSegments(spark, sf0001).cache()
    val nCust = Tables.orders(spark, sf0001)
      .select($"o_custkey").distinct().count()
    assert(r.agg(sum($"n_customers")).head().getLong(0) === nCust)
    // each quartile of each dimension holds ~n/4 customers (ntile exact)
    for (dim <- Seq("r_q", "f_q", "m_q")) {
      val per = r.groupBy(col(dim)).agg(sum($"n_customers").as("n"))
        .as[(Int, Long)].collect().toMap
      assert(per.keySet === Set(1, 2, 3, 4), s"$dim tiles $per")
      assert(per.values.max - per.values.min <= 1, s"$dim skewed $per")
    }
    r.unpersist()
  }

  test("quantile normalize: ranks span [0,1], nations conserved") {
    val r = Analytics.quantileNormalize(spark, sf0001).cache()
    assert(r.filter($"min_q" < 0 || $"max_q" > 1).count() === 0)
    assert(r.agg(sum($"n")).head().getLong(0) ===
      Tables.customer(spark, sf0001).count())
    // global min/max of q are exactly 0 and 1
    assert(r.agg(min($"min_q"), max($"max_q")).head() ===
      org.apache.spark.sql.Row(0.0, 1.0))
    r.unpersist()
  }

  test("fk audit: six edges, counts reconcile, generated data is clean") {
    val r = Analytics.fkAudit(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
    assert(r.length === 6)
    assert(r.map(_._1).distinct.length === 6)
    val byEdge = r.map(t => t._1 -> t).toMap
    assert(byEdge("lineitem.l_orderkey->orders")._2 ===
      Tables.lineitem(spark, sf0001).count())
    // driver-generated data is referentially intact
    assert(r.forall(_._3 === 0L), s"orphans: ${r.filter(_._3 > 0).toSeq}")
    // ... and an injected orphan IS caught (sensitivity check on the shape)
    val li = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey").limit(1)
      .withColumn("l_orderkey", $"l_orderkey" * -1 - 1)
      .union(Tables.lineitem(spark, sf0001).select($"l_orderkey"))
    val orphans = li.join(
      Tables.orders(spark, sf0001).select($"o_orderkey"),
      $"l_orderkey" === $"o_orderkey", "left_anti").count()
    assert(orphans === 1L)
  }

  test("attribution: purchases conserved, channels only from event types") {
    val r = Analytics.lastTouchAttribution(spark, sf0001).cache()
    val ev = Tables.events(spark, sf0001).cache()
    val nPurch = ev.filter($"event_type" === "purchase").count()
    assert(r.agg(sum($"n_purchases")).head().getLong(0) === nPurch)
    val channels = r.select($"channel").as[String].collect().toSet
    assert(channels.subsetOf(
      Set("click", "view", "signup", "error", "direct")))
    assert(!channels.contains("purchase"))
    // hand-check one user sequentially
    val uid = ev.filter($"event_type" === "purchase")
      .select($"user_id").head().getLong(0)
    val seq = ev.filter($"user_id" === uid)
      .select($"ts", $"event_id", $"event_type")
      .orderBy($"ts", $"event_id")
      .as[(java.sql.Timestamp, Long, String)].collect()
    var lastNp: String = null
    val want = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    for ((_, _, et) <- seq)
      if (et == "purchase")
        want(if (lastNp == null) "direct" else lastNp) += 1
      else lastNp = et
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val got = ev.filter($"user_id" === uid)
      .withColumn("channel",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"channel", lit("direct")).as("ch"))
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(got === want.toMap, s"user $uid: $got vs $want")
    ev.unpersist(); r.unpersist()
  }
}
