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

  test("cusum window identity equals the sequential recurrence") {
    val daily = Tables.events(spark, sf0001)
      .groupBy($"user_id", $"ts".cast("date").as("day"))
      .agg(round(sum($"value"), 2).as("x")).cache()
    val st = daily.agg(round(avg($"x"), 6), round(stddev_pop($"x"), 6))
      .head()
    val (mu, sigma) = (st.getDouble(0), st.getDouble(1))
    // sequential S_i = max(0, S_{i-1} + (x_i - mu)) per user, in the
    // same exact-decimal arithmetic the query accumulates in
    val muD = BigDecimal(mu).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val thr = BigDecimal(4 * sigma)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val want = daily.orderBy($"user_id", $"day")
      .as[(Long, java.sql.Date, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
        var sCur = BigDecimal(0)
        rows.sortBy(_._2.toString).toSeq.flatMap { case (_, day, x) =>
          val xD = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          sCur = (sCur + (xD - muD)).max(BigDecimal(0))
          if (sCur > thr)
            Some((uid, day.toString,
              sCur.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          else None
        }
      }.toSet
    val got = Analytics.cusumDetect(spark, sf0001)
      .select($"user_id", $"day".cast("string"), $"cusum")
      .as[(Long, String, Double)].collect()
      .map(t => (t._1, t._2, t._3)).toSet
    assert(got.nonEmpty, "detector fired nowhere — threshold too high")
    assert(got === want,
      s"spark=${got.size} seq=${want.size} diff=${(got diff want).take(3)}")
    daily.unpersist()
  }

  test("kaplan-meier: survival monotone in [0,1], risk set telescopes") {
    val r = Analytics.kaplanMeier(spark, sf0001)
      .orderBy($"t").as[(Int, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    val nUsers = Tables.events(spark, sf0001)
      .select($"user_id").distinct().count()
    assert(r.head._2 === nUsers) // everyone at risk at t = min
    assert(r.forall(x => x._4 >= 0.0 && x._4 <= 1.0))
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4 + 1e-12, s"survival increased at t=${b._1}")
      assert(b._2 < a._2, s"risk set grew at t=${b._1}")
    case _ => }
    assert(r.forall(x => x._3 <= x._2)) // deaths never exceed at-risk
  }

  test("gini: bounded, one segment brute-forced") {
    val r = Analytics.giniSpend(spark, sf0001).cache()
    assert(r.filter($"gini" < 0 || $"gini" >= 1).count() === 0)
    val seg = r.orderBy($"c_mktsegment").head()
    val name = seg.getAs[String]("c_mktsegment")
    val xs = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment" === name)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("x"))
      .select($"o_custkey", $"x").as[(Long, Double)].collect()
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = xs.length
    val gini = 2.0 * xs.zipWithIndex.map { case (x, i) =>
      (i + 1) * x }.sum / (n * xs.sum) - (n + 1.0) / n
    assert(seg.getAs[Long]("n") === n)
    assert(math.abs(seg.getAs[Double]("gini") -
      math.rint(gini * 1e5) / 1e5) < 1e-9)
    r.unpersist()
  }

  test("benford: orders conserved, chi2 non-negative and finite") {
    val r = Analytics.benfordAudit(spark, sf0001).cache()
    val nOrders = Tables.orders(spark, sf0001)
      .filter($"o_totalprice" > 0).count()
    assert(r.agg(sum($"n_orders")).head().getLong(0) === nOrders)
    assert(r.filter($"chi2" < 0 || isnan($"chi2")).count() === 0)
    r.unpersist()
  }

  test("path trigrams: top-20 equals the unlimited recount") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val all = Tables.events(spark, sf0001)
      .select($"event_type".as("e1"),
        lead($"event_type", 1).over(w).as("e2"),
        lead($"event_type", 2).over(w).as("e3"))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .groupBy($"e1", $"e2", $"e3").agg(count(lit(1)).as("n"))
      .as[(String, String, String, Long)].collect()
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(20).toSet
    val got = Analytics.pathTrigrams(spark, sf0001)
      .as[(String, String, String, Long)].collect().toSet
    assert(got === all)
    // trigram mass conservation over the full (unlimited) counts
    val perUser = Tables.events(spark, sf0001)
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
      .select(sum(greatest($"c" - 2, lit(0L)))).head().getLong(0)
    assert(all.toSeq.map(_._4).sum <= perUser)
  }

  test("ab test: one row, users conserved, z recomputed by hand") {
    val row = Analytics.abTest(spark, sf0001).head()
    val pu = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(round(sum(when($"event_type" === "purchase", $"value")
        .otherwise(0.0)), 2).as("m"))
      .select($"user_id", $"m").as[(Long, Double)].collect()
    assert(row.getAs[Long]("n_a") + row.getAs[Long]("n_b") === pu.length)
    def stats(v: Array[Double]) = {
      val n = v.length; val mean = v.sum / n
      val se2 = v.map(x => (x - mean) * (x - mean)).sum / (n - 1) / n
      (n, mean, se2)
    }
    val (na, ma, sa) = stats(pu.filter(_._1 % 2 == 0).map(_._2))
    val (nb, mb, sb) = stats(pu.filter(_._1 % 2 == 1).map(_._2))
    assert(row.getAs[Long]("n_a") === na && row.getAs[Long]("n_b") === nb)
    val z = (mb - ma) / math.sqrt(sa + sb)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3,
      s"z ${row.getAs[Double]("z")} vs $z")
  }

  test("auc: matches brute-force average-rank computation") {
    val row = Analytics.aucRank(spark, sf0001).head()
    val scored = Tables.events(spark, sf0001)
      .select($"value", ($"event_type" === "purchase").cast("int"))
      .as[(Double, Int)].collect()
    // average ranks over the full sorted sample
    val sorted = scored.sortBy(_._1)
    val avgRank = new Array[Double](sorted.length)
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      val r = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      (i until j).foreach(k => avgRank(k) = r)
      i = j
    }
    val nPos = sorted.count(_._2 == 1)
    val nNeg = sorted.length - nPos
    val rPos = sorted.zip(avgRank).filter(_._1._2 == 1).map(_._2).sum
    val auc = (rPos - nPos * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg)
    assert(row.getAs[Long]("n_pos") === nPos.toLong)
    assert(row.getAs[Long]("n_neg") === nNeg.toLong)
    assert(math.abs(row.getAs[Double]("auc") - auc) < 1e-6)
    assert(row.getAs[Double]("auc") >= 0 && row.getAs[Double]("auc") <= 1)
  }

  test("ks test: D matches brute-force ECDF sup-distance") {
    val row = Analytics.ksTest(spark, sf0001).head()
    val ev = Tables.events(spark, sf0001)
      .select($"value", $"event_type" === "purchase")
      .as[(Double, Boolean)].collect()
    val a = ev.filter(_._2).map(_._1).sorted
    val b = ev.filterNot(_._2).map(_._1).sorted
    def ecdf(xs: Array[Double], x: Double): Double = {
      // rightmost index with value <= x, binary-search style via count
      var lo = 0; var hi = xs.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        if (xs(mid) <= x) lo = mid + 1 else hi = mid
      }
      lo.toDouble / xs.length
    }
    val grid = (a ++ b).distinct
    val d = grid.map(x => math.abs(ecdf(a, x) - ecdf(b, x))).max
    assert(row.getAs[Long]("n_a") === a.length.toLong)
    assert(row.getAs[Long]("n_b") === b.length.toLong)
    assert(math.abs(row.getAs[Double]("d") - d) < 1e-6)
    assert(row.getAs[Double]("p_approx") >= 0 &&
      row.getAs[Double]("p_approx") <= 2.0)
  }

  test("theil-sen: one segment brute-forced") {
    val r = Analytics.theilSen(spark, sf0001)
      .orderBy($"c_mktsegment").head()
    val name = r.getAs[String]("c_mktsegment")
    val daily = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment" === name)
      .groupBy(datediff($"o_orderdate".cast("date"), lit("1970-01-01"))
        .as("t"))
      .agg(round(sum($"o_totalprice"), 2).as("x"))
      .as[(Int, Double)].collect().sortBy(_._1)
    val slopes = (for {
      i <- daily.indices; j <- (i + 1) until daily.length
    } yield (daily(j)._2 - daily(i)._2).toDouble /
        (daily(j)._1 - daily(i)._1)).sorted
    def median(v: Seq[Double]) =
      if (v.length % 2 == 1) v(v.length / 2)
      else (v(v.length / 2 - 1) + v(v.length / 2)) / 2.0
    assert(r.getAs[Long]("n_days") === daily.length.toLong)
    assert(r.getAs[Long]("n_pairs") === slopes.length.toLong)
    assert(math.abs(r.getAs[Double]("slope") -
      math.rint(median(slopes) * 1e6) / 1e6) < 1e-9)
    val m = median(slopes)
    val residuals = daily.map { case (t, x) => x - m * t }.sorted.toSeq
    assert(math.abs(r.getAs[Double]("intercept") -
      math.rint(median(residuals) * 1e4) / 1e4) < 1e-9)
  }

  test("pareto: one segment brute-forced, k within bounds") {
    val all = Analytics.paretoCoverage(spark, sf0001).cache()
    assert(all.filter($"k_top" > $"n_customers" || $"k_top" < 1)
      .count() === 0)
    val r = all.orderBy($"c_mktsegment").head()
    val name = r.getAs[String]("c_mktsegment")
    val cents = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment" === name)
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice") * 100, 0).cast("long").as("cents"))
      .as[(Long, Long)].collect()
      .sortBy(t => (-t._2, t._1)).map(_._2)
    val total = cents.sum
    var cum = 0L; var k = 0
    while (k < cents.length && 10 * cum < 8 * total) {
      cum += cents(k); k += 1
    }
    assert(r.getAs[Long]("n_customers") === cents.length.toLong)
    assert(r.getAs[Long]("k_top") === k.toLong)
    all.unpersist()
  }

  test("mutual info: information inequalities hold, brute-forced") {
    val row = Analytics.mutualInfo(spark, sf0001).head()
    val cells = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderpriority")
      .agg(count(lit(1)).as("nij"))
      .as[(String, String, Long)].collect()
    val n = cells.map(_._3).sum.toDouble
    def h(groups: Map[_, Long]): Double =
      -groups.values.map(c => c / n * math.log(c / n)).sum
    val hx = h(cells.groupBy(_._1).map { case (k, v) =>
      (k, v.map(_._3).sum) })
    val hy = h(cells.groupBy(_._2).map { case (k, v) =>
      (k, v.map(_._3).sum) })
    val hxy = h(cells.map(c => ((c._1, c._2), c._3)).toMap)
    assert(row.getAs[Long]("n") === n.toLong)
    assert(math.abs(row.getAs[Double]("h_segment") - hx) < 1e-5)
    assert(math.abs(row.getAs[Double]("h_priority") - hy) < 1e-5)
    assert(math.abs(row.getAs[Double]("h_joint") - hxy) < 1e-5)
    val mi = row.getAs[Double]("mi")
    assert(mi >= -1e-6, "MI must be non-negative")
    assert(mi <= math.min(row.getAs[Double]("h_segment"),
      row.getAs[Double]("h_priority")) + 1e-6)
  }

  test("seat allocation: Hamilton method brute-forced, seats sum exact") {
    val rows = Analytics.seatAllocation(spark, sf0001)
      .orderBy($"c_mktsegment")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.map(_._4).sum === 10000L)
    val cents = rows.map(t => (t._1, t._2))
    val total = cents.map(_._2).sum
    val base = cents.map { case (seg, c) => (seg, 10000L * c / total,
      10000L * c % total) }
    val residual = 10000L - base.map(_._2).sum
    val winners = base.sortBy(t => (-t._3, t._1)).take(residual.toInt)
      .map(_._1).toSet
    val want = base.map { case (seg, b, _) =>
      (seg, b + (if (winners(seg)) 1L else 0L)) }.toMap
    rows.foreach(t => assert(t._4 === want(t._1),
      s"segment ${t._1}: got ${t._4} want ${want(t._1)}"))
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

  test("rank correlation: matches driver-side brute force") {
    val r = Analytics.rankCorrelation(spark, sf0001).cache()
    assert(r.filter($"value" < -1.0 || $"value" > 1.0).count() === 0)
    // Spearman brute force for one flag: average ranks, explicit sums
    val xy = Tables.lineitem(spark, sf0001)
      .filter($"l_returnflag" === "A")
      .select(round($"l_extendedprice" * 100, 0).cast("long"),
        $"l_quantity".cast("long"))
      .as[(Long, Long)].collect()
    def avgRanks(v: Array[Long]): Array[Double] = {
      val sorted = v.sorted
      val first = sorted.zipWithIndex.reverse.toMap // min index per value
      val cnt = v.groupBy(identity).map { case (k, a) => k -> a.length }
      v.map(x => first(x) + 1 + (cnt(x) - 1) / 2.0)
    }
    val ra = avgRanks(xy.map(_._1)); val rb = avgRanks(xy.map(_._2))
    val n = xy.length
    val mean = (n + 1) / 2.0
    val sxy = ra.zip(rb).map { case (a, b) => (a - mean) * (b - mean) }.sum
    val sxx = ra.map(a => (a - mean) * (a - mean)).sum
    val syy = rb.map(b => (b - mean) * (b - mean)).sum
    val want = math.rint(sxy / math.sqrt(sxx * syy) * 1e6) / 1e6
    val got = r.filter($"stat" === "spearman" && $"grp" === "A")
      .head().getAs[Double]("value")
    assert(math.abs(got - want) < 2e-6, s"spearman got $got want $want")
    // Kendall brute force over the nation points
    val pts = Tables.customer(spark, sf0001)
      .join(Tables.nation(spark, sf0001),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("x"),
        round(sum($"c_acctbal") * 100, 0).cast("long").as("y"))
      .as[(String, Long, Long)].collect()
    var c = 0L; var dd = 0L; var tx = 0L; var ty = 0L; var n0 = 0L
    for (i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1) {
      val (_, xa, ya) = pts(i); val (_, xb, yb) = pts(j)
      n0 += 1
      if (xa == xb) tx += 1
      if (ya == yb) ty += 1
      if ((xa < xb && ya < yb) || (xa > xb && ya > yb)) c += 1
      if ((xa < xb && ya > yb) || (xa > xb && ya < yb)) dd += 1
    }
    val wantK = math.rint((c - dd) /
      math.sqrt((n0 - tx).toDouble * (n0 - ty)) * 1e6) / 1e6
    val gotK = r.filter($"stat" === "kendall_tau_b")
      .head().getAs[Double]("value")
    assert(math.abs(gotK - wantK) < 2e-6, s"kendall got $gotK want $wantK")
    r.unpersist()
  }

  test("chunk dedup: kept chunks equal global distinct, brute-force match") {
    val q = TextQueries.chunkDedup(spark, sf0001).cache()
    // total kept across sources == number of DISTINCT chunk texts
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source", $"text")
      .as[(Long, String, String)].collect()
    val chunks = docs.flatMap { case (id, src, t) =>
      val toks = t.split(" ").filter(_.nonEmpty)
      toks.grouped(20).zipWithIndex.map { case (g, i) =>
        (id, src, i, g.mkString(" ")) }
    }
    val nDistinct = chunks.map(_._4).distinct.length
    assert(q.agg(sum($"n_kept")).head().getLong(0) === nDistinct)
    // brute-force per-source counts (first occurrence by doc_id, idx)
    val firstOf = chunks.groupBy(_._4).map { case (_, occ) =>
      occ.minBy(o => (o._1, o._3)) }.toSet
    val bySrc = chunks.groupBy(_._2)
    for (row <- q.collect()) {
      val src = row.getAs[String]("source")
      val all = bySrc(src)
      assert(row.getAs[Long]("n_chunks") === all.length.toLong)
      assert(row.getAs[Long]("n_kept") ===
        all.count(firstOf.contains).toLong)
      assert(row.getAs[Long]("n_docs") ===
        all.map(_._1).distinct.length.toLong)
    }
    q.unpersist()
  }

  test("fifo costing: conservation identity and one part sequential") {
    val q = Analytics.fifoCosting(spark, sf0001).cache()
    // interval-overlap identity: matched == min(supply, demand) per part
    val li = Tables.lineitem(spark, sf0001)
      .select($"l_partkey", $"l_orderkey", $"l_linenumber", $"l_shipdate",
        $"l_quantity".cast("long").as("qty"),
        round($"l_extendedprice" * 100, 0).cast("long").as("pc"))
      .as[(Long, Long, Int, java.sql.Timestamp, Long, Long)]
      .collect()
    val byPart = li.groupBy(_._1)
    for (row <- q.collect()) {
      val pk = row.getAs[Long]("l_partkey")
      val rows = byPart(pk).sortBy(r => (r._4.getTime, r._2, r._3))
      val rec = rows.filter(_._2 % 2 == 0)
      val iss = rows.filter(_._2 % 2 == 1)
      val supply = rec.map(_._5).sum; val demand = iss.map(_._5).sum
      assert(row.getAs[Long]("matched_qty") === math.min(supply, demand))
      // sequential FIFO walk: consume receipts in order against demand
      var remaining = demand
      var cogsMilli = 0L
      for ((_, _, _, _, q0, pc) <- rec if remaining > 0) {
        val take = math.min(q0, remaining)
        cogsMilli += take * pc * 1000 / q0
        remaining -= take
      }
      assert(math.abs(row.getAs[Double]("cogs") - cogsMilli / 100000.0)
        < 0.011, s"part $pk")
    }
    q.unpersist()
  }

  test("wilson ranking: hand-recomputed bounds, lower <= rate, rank order") {
    val got = Analytics.wilsonRanking(spark, sf0001).collect()
    assert(got.length > 0)
    got.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val pos = r.getAs[Long]("pos").toDouble
      val p = pos / n
      val z2 = 3.8416
      val lower = (p + z2 / (2 * n) - 1.96 *
        math.sqrt((p * (1.0 - p) + z2 / (4 * n)) / n)) / (1.0 + z2 / n)
      assert(math.abs(r.getAs[Double]("rate") -
        math.rint(p * 1e6) / 1e6) < 1e-9)
      assert(math.abs(r.getAs[Double]("wilson_lower") -
        math.rint(lower * 1e6) / 1e6) < 2e-6)
      assert(r.getAs[Double]("wilson_lower") <=
        r.getAs[Double]("rate") + 1e-9)
    }
    // ranks are a permutation ordered by the bound
    val byRank = got.sortBy(_.getAs[Int]("rk"))
    assert(byRank.map(_.getAs[Int]("rk")).toSeq === (1 to got.length))
    assert(byRank.map(_.getAs[Double]("wilson_lower")).sliding(2)
      .forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("bh fdr: full driver-side recompute of KS p-values and step-up") {
    val got = Analytics.bhFdr(spark, sf0001).collect()
      .map(r => (r.getAs[String]("n_name"), r))
      .toMap
    assert(got.nonEmpty)
    val rows = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001),
        $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf0001),
        $"c_nationkey" === $"n_nationkey")
      .filter(year($"o_orderdate").isin(1997, 1998))
      .select($"n_name", year($"o_orderdate").as("y"), $"o_totalprice")
      .as[(String, Int, Double)].collect()
    val pByNation = rows.groupBy(_._1).map { case (nn, rs) =>
      val byV = rs.groupBy(_._3).toSeq.sortBy(_._1)
      val ta = rs.count(_._2 == 1997).toLong
      val tb = rs.count(_._2 == 1998).toLong
      var ca = 0L; var cb = 0L; var dmax = 0.0
      byV.foreach { case (_, vs) =>
        ca += vs.count(_._2 == 1997); cb += vs.count(_._2 == 1998)
        val gap = math.abs(ca.toDouble / ta - cb.toDouble / tb)
        if (gap > dmax) dmax = gap
      }
      val p = math.min(1.0,
        2.0 * math.exp(-2.0 * dmax * dmax * (ta * tb / (ta + tb).toDouble)))
      nn -> (ta, tb, dmax, p)
    }
    val m = pByNation.size
    val ranked = pByNation.toSeq.sortBy { case (nn, (_, _, _, p)) => (p, nn) }
    var runMin = Double.MaxValue
    val adj = ranked.zipWithIndex.reverse.map { case ((nn, (_, _, _, p)), i) =>
      runMin = math.min(runMin, p * m / (i + 1))
      (nn, i + 1, p, math.min(1.0, runMin))
    }
    adj.foreach { case (nn, rk, p, padj) =>
      val r = got(nn)
      assert(r.getAs[Int]("rk") === rk, s"$nn rank")
      assert(math.abs(r.getAs[Double]("p_raw") -
        math.rint(p * 1e8) / 1e8) < 2e-8, s"$nn p_raw")
      assert(math.abs(r.getAs[Double]("p_adj") -
        math.rint(padj * 1e8) / 1e8) < 2e-8, s"$nn p_adj")
      assert(r.getAs[Boolean]("significant") === (padj <= 0.1), s"$nn sig")
    }
  }

  test("isotonic calibration: monotone fit matching a driver-side PAVA") {
    val got = Analytics.isotonicCalibration(spark, sf0001)
      .as[(Int, Int, Long, Long, Double, Double)].collect()
      .groupBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (model, rs) =>
      val sorted = rs.sortBy(_._2)
      // nondecreasing fitted rates
      assert(sorted.map(_._6).sliding(2)
        .forall(w => w.length < 2 || w(0) <= w(1)), s"model $model monotone")
      // driver-side PAVA on the same (pos, n) bins
      val stack = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      sorted.foreach { r =>
        var blk = (r._4, r._3, 1)
        while (stack.nonEmpty &&
            BigInt(blk._1) * stack.last._2 < BigInt(stack.last._1) * blk._2) {
          val t = stack.remove(stack.length - 1)
          blk = (t._1 + blk._1, t._2 + blk._2, t._3 + blk._3)
        }
        stack += blk
      }
      val want = stack.flatMap { case (p, n, c) =>
        Seq.fill(c)(math.rint(p.toDouble / n.toDouble * 1e6) / 1e6) }
      assert(sorted.map(_._6).toSeq === want.toSeq, s"model $model fit")
      // weighted mean conservation: sum n*fit == sum pos (PAVA invariant)
      val lhs = sorted.map(r => r._3 * r._6).sum
      assert(math.abs(lhs - sorted.map(_._4).sum) < 1.0, s"model $model mass")
    }
  }

  test("price-volume-mix: waterfall identity and one brand brute-forced") {
    val q = Analytics.priceVolumeMix(spark, sf0001).cache()
    assert(q.count() > 0)
    // new + lost + price + volume + mix must bridge rev1 → rev2 for
    // every brand (each effect rounded at 4dp, so tolerance is loose)
    q.collect().foreach { r =>
      val bridge = r.getAs[Double]("new_eff") + r.getAs[Double]("lost_eff") +
        r.getAs[Double]("price_eff") + r.getAs[Double]("volume_eff") +
        r.getAs[Double]("mix_eff")
      val delta = r.getAs[Double]("rev2") - r.getAs[Double]("rev1")
      assert(math.abs(bridge - delta) < 1e-2,
        s"brand ${r.getAs[String]("p_brand")}: bridge $bridge vs $delta")
    }
    // brute-force one brand from raw rows
    val brand = q.orderBy($"p_brand").head().getAs[String]("p_brand")
    val rows = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001).filter($"p_brand" === brand),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", year($"l_shipdate").as("y"),
        $"l_quantity", round($"l_extendedprice" * 100, 0).cast("long")
          .as("c"))
      .filter($"y".isin(1997, 1998))
      .as[(Long, Int, Double, Long)].collect()
    val byPart = rows.groupBy(_._1).map { case (pk, rs) =>
      val q1 = rs.filter(_._2 == 1997).map(_._3).sum
      val q2 = rs.filter(_._2 == 1998).map(_._3).sum
      val r1 = rs.filter(_._2 == 1997).map(_._4).sum
      val r2 = rs.filter(_._2 == 1998).map(_._4).sum
      (pk, q1, q2, r1, r2)
    }.toSeq
    val got = q.filter($"p_brand" === brand).head()
    assert(got.getAs[Double]("rev1") === byPart.map(_._4).sum / 100.0)
    assert(got.getAs[Double]("rev2") === byPart.map(_._5).sum / 100.0)
    val newE = byPart.filter(_._2 == 0).map(_._5).sum / 100.0
    val lostE = -byPart.filter(_._3 == 0).map(_._4).sum / 100.0
    assert(got.getAs[Double]("new_eff") === newE)
    assert(got.getAs[Double]("lost_eff") === lostE)
    val priceE = byPart.filter(p => p._2 > 0 && p._3 > 0).map { p =>
      p._3 * ((p._5 / 100.0) / p._3 - (p._4 / 100.0) / p._2)
    }.sum
    assert(math.abs(got.getAs[Double]("price_eff") - priceE) < 1e-3)
    q.unpersist()
  }

  test("psi drift: non-negative, zero on identical halves, one segment by hand") {
    val q = Analytics.psiDrift(spark, sf0001).cache()
    assert(q.count() > 0)
    assert(q.filter($"psi" < 0).count() === 0)
    // hand-recompute one segment with Laplace smoothing over 10 bins
    val row = q.orderBy($"seg").head()
    val seg = row.getAs[String]("seg")
    val vals = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001)
        .filter($"c_mktsegment" === seg),
        $"o_custkey" === $"c_custkey")
      .select(year($"o_orderdate").as("y"),
        round($"o_totalprice" * 100, 0).cast("long").as("cents"))
      .as[(Int, Long)].collect()
    def bin(c: Long): Int = math.min((c / 5000000L).toInt, 9)
    val base = vals.filter(_._1 <= 1997).map(v => bin(v._2))
    val curr = vals.filter(_._1 >= 1998).map(v => bin(v._2))
    val psi = (0 to 9).map { b =>
      val pa = (base.count(_ == b) + 1.0) / (base.length + 10)
      val pb = (curr.count(_ == b) + 1.0) / (curr.length + 10)
      (pa - pb) * math.log(pa / pb)
    }.sum
    assert(row.getAs[Long]("n_base") === base.length.toLong)
    assert(row.getAs[Long]("n_curr") === curr.length.toLong)
    assert(math.abs(row.getAs[Double]("psi") -
      math.rint(psi * 1e6) / 1e6) < 2e-6)
    q.unpersist()
  }
}
