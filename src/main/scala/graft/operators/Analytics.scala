package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * the orders table, each quartiled with ntile(4) SEMANTICS, then
    * segment-level rollup. Monetary is rounded to cents BEFORE the
    * ordering so both engines sort identical values; every ordering
    * carries the customer key as tiebreaker, making tile assignment
    * fully deterministic. No global window anywhere: each quartile
    * comes from a [[GlobalOrder]] range-partitioned global rank plus
    * exact integer ntile arithmetic — at 100 TB the customer rollup
    * stays spread across the cluster for all three ranking passes. */
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
    val total = rfm.agg(count(lit(1)).as("__n"))
    val ranked = GlobalOrder.rowNumber(
      GlobalOrder.rowNumber(
        GlobalOrder.rowNumber(rfm,
          "rn_r", col("r"), col("o_custkey")),
        "rn_f", col("f").desc, col("o_custkey")),
      "rn_m", col("m").desc, col("o_custkey"))
    def tile(rn: Column, n: Column): Column =
      GlobalOrder.ntileFromRowNumber(rn, n, 4).cast("int")
    ranked.crossJoin(broadcast(total))
      .select(col("r"), col("f"), col("m"),
        tile(col("rn_r"), col("__n")).as("r_q"),
        tile(col("rn_f"), col("__n")).as("f_q"),
        tile(col("rn_m"), col("__n")).as("m_q"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("m")), 2).as("avg_monetary"),
        round(avg(col("f")), 4).as("avg_frequency"))
  }

  /** Quantile normalization: map every account balance to its global
    * percent_rank (rank-based, so equal balances normalize identically —
    * no tiebreaker needed), then per-nation distribution summary of the
    * normalized values. percent_rank = (rank−1)/(n−1) is pure rank
    * arithmetic, and rank(v) = 1 + #{values < v}, so it reduces to the
    * DISTINCT-VALUE grid: per-balance counts, one [[GlobalOrder]]
    * running sum over the grid (range-partitioned — never a global
    * window over the customer table), then a hash join maps each
    * customer back to its q. Exact integer ranks before the one final
    * division; scale-safe because the ordered pass touches only
    * distinct balances. */
  def quantileNormalize(s: SparkSession, d: String): DataFrame = {
    // NULL balances are excluded EXPLICITLY: a quantile for "no value"
    // is undefined. (The pre-GlobalOrder percent_rank form silently
    // ranked nulls first; the grid equi-join silently dropped them —
    // either way nulls must not reach the CDF, so state it.)
    val c = customer(s, d)
      .select(col("c_nationkey"), col("c_acctbal"))
      .filter(col("c_acctbal").isNotNull)
    val grid = c.groupBy(col("c_acctbal")).agg(count(lit(1)).as("cnt"))
    val total = grid.agg(sum(col("cnt")).as("__n"))
    val q = GlobalOrder
      .runningSums(grid, Seq(col("c_acctbal")), Seq("cum" -> col("cnt")))
      .crossJoin(broadcast(total))
      .select(col("c_acctbal"),
        ((col("cum") - col("cnt")) / (col("__n") - 1)).as("q"))
    c.join(q, Seq("c_acctbal"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("q")), 5).as("avg_q"),
        round(min(col("q")), 5).as("min_q"),
        round(max(col("q")), 5).as("max_q"))
  }

  /** Referential-integrity audit: orphan counts for every foreign-key
    * edge in the schema, one row per edge. Each CHILD TABLE IS SCANNED
    * EXACTLY ONCE — all of its FK edges resolve in that single pass as
    * broadcast LEFT JOINs against deduped parent-key sets, with the
    * row count and every per-edge orphan count collected by one
    * conditional aggregate (lineitem: 3 probes, 1 scan). The per-edge
    * rows come from unpivoting the one-row aggregate, not re-scanning.
    * This is the data-quality gate a pipeline runs after every ingest;
    * at 100 TB each probe is a broadcast hash lookup while the parent's
    * KEY COLUMN fits (a billion longs ≈ 8 GB) — past that, the affected
    * edge degrades to a shuffled anti-join and the others keep the
    * single-scan shape. */
  def fkAudit(s: SparkSession, d: String): DataFrame = {
    /** One scan of `child`: broadcast-probe every (fk, parent) edge,
      * then unpivot the single aggregate row to one row per edge. */
    def audit(childName: String, child: DataFrame,
        edges: Seq[(String, String, DataFrame, String)]): DataFrame = {
      val probed = edges.foldLeft(child.select(
          edges.map(e => col(e._1)).distinct: _*)) {
        case (acc, (ck, _, parent, pk)) =>
          acc.join(broadcast(parent.select(col(pk)).distinct()),
            col(ck) === col(pk), "left_outer")
      }
      val aggs = count(lit(1)).as("n_child") +:
        edges.map { case (ck, _, _, pk) =>
          count_if(col(pk).isNull).as(s"orphan_$ck") }
      // one-row result, materialized once — the per-edge unpivot below
      // references it edges.size times and must not re-run the scan
      val one = probed.agg(aggs.head, aggs.tail: _*).localCheckpoint()
      edges.map { case (ck, parentName, _, _) =>
        one.select(
          lit(s"$childName.$ck->$parentName").as("edge"),
          col("n_child"), col(s"orphan_$ck").as("n_orphan"),
          round(col(s"orphan_$ck") * 100.0 / col("n_child"), 4)
            .as("orphan_pct"))
      }.reduce(_ unionAll _)
    }
    audit("lineitem", lineitem(s, d), Seq(
        ("l_orderkey", "orders", orders(s, d), "o_orderkey"),
        ("l_partkey", "part", part(s, d), "p_partkey"),
        ("l_suppkey", "supplier", supplier(s, d), "s_suppkey")))
      .unionAll(audit("orders", orders(s, d),
        Seq(("o_custkey", "customer", customer(s, d), "c_custkey"))))
      .unionAll(audit("customer", customer(s, d),
        Seq(("c_nationkey", "nation", nation(s, d), "n_nationkey"))))
      .unionAll(audit("supplier", supplier(s, d),
        Seq(("s_nationkey", "nation", nation(s, d), "n_nationkey"))))
  }

  /** CUSUM change detection over each user's daily event-value series.
    * The recurrence S_i = max(0, S_{i-1} + (x_i - target)) looks
    * inherently sequential, but it closes over prefix sums:
    * S_i = R_i - min(0, min_{j<=i} R_j) with R the running sum of
    * (x_i - target) — so the whole detector is TWO stacked window
    * passes on the same (user, day) ordering, one shuffle total, no
    * UDAF and no driver loop. Flags days where the statistic exceeds
    * 4·sigma of the daily deltas. The identical prefix-sum rewrite is
    * the oracle SQL — and the accumulation runs in exact DECIMAL
    * arithmetic (inputs quantized to 2dp/6dp first), because windowed
    * DOUBLE sums associate differently across engines and a 1e-10
    * disagreement that lands on a rounding midpoint flips the 4dp
    * output. Decimals make every prefix sum bit-identical. */
  def cusumDetect(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(round(sum(col("value")), 2).as("x"))
    val stats = daily.agg(round(avg(col("x")), 6).as("mu"),
      round(stddev_pop(col("x")), 6).as("sigma"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    daily.crossJoin(broadcast(stats))
      .withColumn("r", sum(col("x").cast("decimal(18,2)") -
        col("mu").cast("decimal(18,6)")).over(w))
      // CASE, not least()/greatest(): those promote max-precision
      // decimals to double in some engines; CASE and decimal
      // subtraction keep the exact type
      .withColumn("mr", min(col("r")).over(w))
      .withColumn("cusum",
        when(col("mr") < 0, col("r") - col("mr")).otherwise(col("r")))
      .filter(col("cusum") >
        round(lit(4) * col("sigma"), 6).cast("decimal(18,6)"))
      // round the DECIMAL (exact midpoints, HALF_UP both engines),
      // THEN cast — rounding after the lossy double cast diverges
      .select(col("user_id"), col("day"), round(col("x"), 2).as("x"),
        round(col("cusum"), 4).cast("double").as("cusum"))
  }

  /** Kaplan-Meier survival estimate of user lifetime (days from first
    * to last event; users still active on the global last day are
    * right-censored). The survival curve S(t) = prod_{u<=t}(1 - d_u/n_u)
    * is a product over ordered event times — rewritten as
    * exp(sum(ln(1 - d/n))) it becomes one window pass over the
    * per-duration death/at-risk table, which is at most a few thousand
    * rows after the per-user rollup (the only wide shuffle). Standard
    * epidemiology/churn shape, fully distributed. */
  def kaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val user = ev.groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("d0"),
        max(col("ts").cast("date")).as("d1"))
    val horizon = ev.agg(max(col("ts").cast("date")).as("hz"))
    val life = user.crossJoin(broadcast(horizon))
      .select(datediff(col("d1"), col("d0")).as("t"),
        (col("d1") < col("hz")).cast("int").as("died"))
    val byT = life.groupBy(col("t"))
      .agg(count(lit(1)).as("n_ending"), sum(col("died")).as("d"))
    val atRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn("n_risk",
        sum(col("n_ending")).over(atRisk) -
          coalesce(sum(col("n_ending")).over(
            Window.orderBy(col("t")).rowsBetween(
              Window.unboundedPreceding, -1)), lit(0L)))
      // greatest-guard: at the final time point d == n_risk and the
      // factor is exactly 0 — ln would be -inf (engine-dependent);
      // 1e-300 folds to surv = 0 at 5dp in both engines identically
      .withColumn("surv", exp(sum(
        log(greatest(lit(1.0) - col("d") / col("n_risk"),
          lit(1e-300)))).over(upTo)))
      .select(col("t"), col("n_risk"), col("d"),
        round(col("surv"), 5).as("surv"))
  }

  /** Gini coefficient + decile Lorenz points of customer spend, per
    * market segment — the standard inequality summary over a revenue
    * distribution. Uses the rank formulation
    * G = 2·sum(i·x_i)/(n·sum x) − (n+1)/n on spend ordered ascending
    * (customer-key tiebreak ⇒ identical ordering in both engines).
    * One shuffle to the per-customer rollup, one segment-partitioned
    * window pass for ranks and running shares. */
  def giniSpend(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("x"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("x"), col("o_custkey"))
    spend.withColumn("i", row_number().over(w))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("x")), 2).as("total_spend"),
        round((lit(2.0) * sum(col("i") * col("x")) /
          (count(lit(1)) * sum(col("x")))) -
          (count(lit(1)) + lit(1.0)) / count(lit(1)), 5).as("gini"))
  }

  /** Benford first-digit audit of order totals: observed digit mass vs
    * the log10(1+1/d) expectation and the chi-square distance, per
    * order priority. First digits come from pure integer/log arithmetic
    * (no string casts), the rollup is digit-cardinality tiny, and the
    * chi-square reduces 9 rows per group — an anomaly/fraud screen that
    * runs in one aggregation pass at any scale. */
  def benfordAudit(s: SparkSession, d: String): DataFrame = {
    val firstDigit = floor(col("o_totalprice") /
      pow(lit(10.0), floor(log10(col("o_totalprice"))))).cast("int")
    val byDigit = orders(s, d)
      .filter(col("o_totalprice") > 0)
      .groupBy(col("o_orderpriority"), firstDigit.as("digit"))
      .agg(count(lit(1)).as("n"))
    val wGrp = Window.partitionBy(col("o_orderpriority"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byDigit
      .withColumn("n_grp", sum(col("n")).over(wGrp))
      .withColumn("expected_p",
        log(10.0, lit(1.0) + lit(1.0) / col("digit")))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n_grp")).as("n_orders"),
        round(sum(pow(col("n") / col("n_grp") - col("expected_p"), 2) /
          col("expected_p")) * max(col("n_grp")), 4).as("chi2"))
  }

  /** Top user-journey trigrams: consecutive event-type triples per user
    * (ts + event-id ordered), global frequency ranked. Two lead()
    * columns in one window pass build the trigrams in place — no
    * self-joins — then one count rollup; ties rank deterministically by
    * the path string so the LIMIT is stable cross-engine. */
  def pathTrigrams(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(20)
  }

  /** A/B experiment readout: users hash-split 50/50 (deterministic —
    * pmod of the user key, the same assignment both engines compute),
    * per-user purchase value as the metric, Welch z-test on the
    * variant means. The whole test reduces to per-variant first/second
    * moments — one user-level rollup (the only wide shuffle), one
    * 2-row aggregate, driver-free arithmetic for the z statistic. */
  def abTest(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(round(sum(when(col("event_type") === "purchase",
        col("value")).otherwise(0.0)), 2).as("m"))
      .select(pmod(col("user_id"), lit(2)).cast("int").as("variant"),
        col("m"))
    val v = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), avg(col("m")).as("mean"),
        (var_samp(col("m")) / count(lit(1))).as("se2"))
      .localCheckpoint() // 2 rows, referenced by both variant branches
    val a = v.filter(col("variant") === 0)
      .select(col("n").as("n_a"), col("mean").as("mean_a"),
        col("se2").as("se2_a"))
    val b = v.filter(col("variant") === 1)
      .select(col("n").as("n_b"), col("mean").as("mean_b"),
        col("se2").as("se2_b"))
    a.crossJoin(b).select(
      col("n_a"), col("n_b"),
      round(col("mean_a"), 4).as("mean_a"),
      round(col("mean_b"), 4).as("mean_b"),
      round((col("mean_b") - col("mean_a")) /
        sqrt(col("se2_a") + col("se2_b")), 4).as("z"))
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

  /** Mann-Whitney U / ROC-AUC of event value as a purchase classifier,
    * ties handled by average ranks. The rank sum never ranks individual
    * rows: the stream first reduces to DISTINCT SCORES (count + positive
    * count per score), then ONE ordered pass over that reduced table
    * assigns each score block its average rank. All rank arithmetic is
    * kept in DOUBLED integers (2·avgrank = 2·cumprev + n + 1), so
    * U, AUC and the tie-corrected z-statistic derive from exact BIGINT
    * sums — bit-identical across engines, no float-associativity drift.
    * At 100 TB the ordered pass touches only distinct-value cardinality,
    * and even that pass is a [[GlobalOrder]] range-partitioned prefix
    * sum (continuous scores can make the grid approach row count, so it
    * must never collapse into one WindowExec partition); if the grid
    * itself explodes, bucket the scores first (rank statistics on
    * binned scores are the standard large-N approximation). */
  def aucRank(s: SparkSession, d: String): DataFrame =
    aucRankDf(events(s, d))

  /** [[aucRank]] on a caller-supplied events frame (needs `value`,
    * `event_type`) — ScaleProbe runs this production path on replicated
    * input to show the ordered pass touches the DISTINCT-SCORE grid,
    * not the row count. */
  def aucRankDf(ev: DataFrame): DataFrame = {
    val byScore = ev
      .select(col("value").as("score"),
        (col("event_type") === "purchase").cast("long").as("pos"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val agg = GlobalOrder
      .runningSums(byScore, Seq(col("score")), Seq("cum_incl" -> col("n")))
      .withColumn("cum_prev", col("cum_incl") - col("n"))
      .agg(sum(col("p")).as("n_pos"),
        (sum(col("n")) - sum(col("p"))).as("n_neg"),
        // sum of p · (2·avgrank) — exact integer rank mass
        sum(col("p") * (lit(2) * col("cum_prev") + col("n") + 1))
          .as("r2"),
        sum(col("n") * col("n") * col("n") - col("n")).as("ties"))
    agg.select(col("n_pos"), col("n_neg"),
      round((col("r2") - col("n_pos") * (col("n_pos") + 1)) /
        (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"),
      round(((col("r2") - col("n_pos") * (col("n_pos") + 1)) / lit(2.0) -
        col("n_pos") * col("n_neg") / lit(2.0)) /
        sqrt(col("n_pos") * col("n_neg") / lit(12.0) *
          ((col("n_pos") + col("n_neg") + 1) - col("ties") /
            ((col("n_pos") + col("n_neg")) *
             (col("n_pos") + col("n_neg") - 1.0)))), 4).as("z"))
  }

  /** Two-sample Kolmogorov-Smirnov test: purchase event values vs all
    * other event values. Both empirical CDFs evaluate on the same
    * distinct-score grid (per-score counts → one ordered cumulative
    * pass), and each CDF value is an exact integer ratio cum/total, so
    * the sup-distance is engine-exact before the final rounding. Output:
    * sample sizes, D, the scaled statistic and the asymptotic p-value
    * 2·exp(−2c²). Same scale shape as [[aucRank]]: the wide data
    * reduces to distinct values before any ordered pass, and the
    * ordered pass itself is a [[GlobalOrder]] range-partitioned prefix
    * sum with the grand totals crossed in from a broadcast one-row
    * aggregate — no WindowExec ever sees a single global partition. */
  def ksTest(s: SparkSession, d: String): DataFrame = {
    val byScore = events(s, d)
      .select(col("value").as("score"),
        (col("event_type") === "purchase").cast("long").as("isa"))
      .groupBy(col("score"))
      .agg(sum(col("isa")).as("na"),
        (count(lit(1)) - sum(col("isa"))).as("nb"))
    val totals = byScore
      .agg(sum(col("na")).as("tot_a"), sum(col("nb")).as("tot_b"))
    GlobalOrder
      .runningSums(byScore, Seq(col("score")),
        Seq("ca" -> col("na"), "cb" -> col("nb")))
      .crossJoin(broadcast(totals))
      .withColumn("gap", abs(
        col("ca") / col("tot_a") - col("cb") / col("tot_b")))
      .agg(max(col("tot_a")).as("n_a"), max(col("tot_b")).as("n_b"),
        max(col("gap")).as("d_raw"))
      .select(col("n_a"), col("n_b"), round(col("d_raw"), 6).as("d"),
        round(col("d_raw") * sqrt(col("n_a") * col("n_b") /
          (col("n_a") + col("n_b")).cast("double")), 4).as("ks_stat"),
        round(lit(2.0) * exp(lit(-2.0) * col("d_raw") * col("d_raw") *
          (col("n_a") * col("n_b") /
            (col("n_a") + col("n_b")).cast("double"))), 4)
          .as("p_approx"))
  }

  /** Theil-Sen robust trend of daily revenue per market segment: the
    * median of all pairwise slopes, plus the median-residual intercept.
    * The pairwise self-join is quadratic in CALENDAR DAYS, not rows —
    * the per-(segment, day) rollup happens first, so 100 TB of orders
    * still reduces to (segments × days) before the join, and the pair
    * count is bounded by the date range alone. Slopes are ratios of
    * 2dp-rounded revenues over integer day gaps (identical doubles both
    * engines), so the interpolated median matches exactly. */
  def theilSen(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
          .as("t"))
      .agg(round(sum(col("o_totalprice")), 2).as("x"))
      .localCheckpoint() // both sides of the pair join + residual pass
    val slopes = daily.select(col("c_mktsegment"), col("t").as("t1"),
        col("x").as("x1"))
      .join(daily.select(col("c_mktsegment"), col("t").as("t2"),
        col("x").as("x2")), Seq("c_mktsegment"))
      .filter(col("t1") < col("t2"))
      .select(col("c_mktsegment"),
        ((col("x2") - col("x1")) / (col("t2") - col("t1"))).as("slope"))
    val med = slopes.groupBy(col("c_mktsegment"))
      .agg(expr("percentile(slope, 0.5)").as("m"),
        count(lit(1)).as("n_pairs"))
    daily.join(broadcast(med), Seq("c_mktsegment"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_days"), max(col("n_pairs")).as("n_pairs"),
        round(max(col("m")), 6).as("slope"),
        round(expr("percentile(x - m * t, 0.5)"), 4).as("intercept"))
  }

  /** Pareto concentration: per market segment, the smallest number of
    * customers (spend-descending) covering 80% of segment revenue.
    * Spend quantizes to integer CENTS immediately, so the running
    * coverage test 10·cumprev < 8·total is pure BIGINT comparison —
    * no float threshold can flip a boundary customer. One rollup
    * shuffle, one segment-partitioned window pass. Headroom: bigint
    * cents cap at ~9·10^16 dollars per segment. */
  def paretoCoverage(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(round(sum(col("o_totalprice")) * 100, 0).cast("long")
        .as("cents"))
    val wPrev = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("c_mktsegment"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    spend
      .withColumn("cum_prev",
        coalesce(sum(col("cents")).over(wPrev), lit(0L)))
      .withColumn("total", sum(col("cents")).over(wAll))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum((lit(10) * col("cum_prev") < lit(8) * col("total"))
          .cast("long")).as("k_top"))
      .withColumn("pct_top",
        round(col("k_top") * 100.0 / col("n_customers"), 4))
  }

  /** Mutual information between market segment and order priority —
    * "does WHO you are predict HOW you order?" — from the exact
    * contingency table: MI = H(seg) + H(pri) − H(joint), entropies in
    * nats. Counts are exact bigints; each entropy sums at most
    * |segments|·|priorities| terms, so the doubles never see large-N
    * associativity. The contingency rollup is the only shuffle; at
    * 100 TB it reduces to a 25-cell table on the first pass. */
  def mutualInfo(s: SparkSession, d: String): DataFrame = {
    val joint = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("nij"))
      .localCheckpoint() // 25 rows: marginals + entropies reuse it
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wSeg = Window.partitionBy(col("c_mktsegment"))
    val wPri = Window.partitionBy(col("o_orderpriority"))
    joint
      .withColumn("n", sum(col("nij")).over(wAll))
      .withColumn("ni", sum(col("nij")).over(wSeg))
      .withColumn("nj", sum(col("nij")).over(wPri))
      .agg(max(col("n")).as("n"),
        // marginal entropies: each cell contributes its share of the
        // marginal term, nij/ni of pi·ln(pi) — sums to H exactly
        (-sum(col("nij") / col("n") * log(col("ni") / col("n"))))
          .as("hx"),
        (-sum(col("nij") / col("n") * log(col("nj") / col("n"))))
          .as("hy"),
        (-sum(col("nij") / col("n") * log(col("nij") / col("n"))))
          .as("hxy"))
      .select(col("n"), round(col("hx"), 6).as("h_segment"),
        round(col("hy"), 6).as("h_priority"),
        round(col("hxy"), 6).as("h_joint"),
        round(col("hx") + col("hy") - col("hxy"), 6).as("mi"))
  }

  /** Largest-remainder (Hamilton) apportionment: 10000 budget units
    * allocated across market segments proportional to revenue cents.
    * Quotas, floors and remainders are all BIGINT (10000·cents fits
    * comfortably; headroom ~9·10^14 revenue cents), the leftover seats
    * go to the largest fractional remainders with segment-name
    * tiebreak — a fully deterministic integer algorithm, so both
    * engines produce the identical seat vector and the sum-to-10000
    * invariant is structural. Segment cardinality is tiny; everything
    * after the one rollup shuffle is a 5-row computation. */
  def seatAllocation(s: SparkSession, d: String): DataFrame = {
    val cents = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")) * 100, 0).cast("long")
        .as("cents"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    cents
      .withColumn("total", sum(col("cents")).over(wAll))
      .withColumn("base", expr("(10000 * cents) div total"))
      .withColumn("rem", expr("(10000 * cents) % total"))
      .withColumn("residual", lit(10000) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(Window
        .orderBy(col("rem").desc, col("c_mktsegment"))))
      .select(col("c_mktsegment"), col("cents"),
        round(col("cents") * 100.0 / col("total"), 4).as("share_pct"),
        (col("base") + (col("rk") <= col("residual")).cast("long"))
          .as("seats"))
  }

  /** Rank-correlation battery: Spearman ρ per return flag over lineitem
    * (price vs quantity — l_quantity's 50 distinct values make ties the
    * NORM, exercising the average-rank convention) and Kendall τ-b over
    * the 25 nation-level (customer count, balance) points. Average ranks
    * are carried DOUBLED (2r = 2·rank + ties − 1, a pure integer whose
    * group mean is exactly n+1), so the deviation products are integers
    * summed in DECIMAL where reassociation is lossless: both engines
    * fold bit-identical values and only the final ρ division happens in
    * double, rounded to 6. The 2× scale cancels in the ratio.
    * Kendall counts concordant/discordant/tie pairs with an n²=300 pair
    * join (the 25-row aggregate broadcasts; at 100 TB this input is a
    * GROUPED aggregate of the big table, so the quadratic stage stays
    * constant-size). The lineitem ranking is the standard two-window
    * shape: one sort-based rank per axis, reusing the per-flag hash
    * partitioning. */
  def rankCorrelation(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_returnflag").as("g"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("x"),
      col("l_quantity").cast("long").as("y"))
    // doubled average rank 2r = 2·rank + ties − 1 is a pure BIGINT; the
    // group mean of 2r is exactly n+1 (average ranks preserve the rank
    // total), so deviations are integers and the 2× scale cancels in ρ.
    def rank2(v: String): Column =
      rank().over(Window.partitionBy(col("g")).orderBy(col(v)))
        .cast("long") * 2 +
        count(lit(1)).over(Window.partitionBy(col("g"), col(v))) - 1
    val ranked = li.select(col("g"),
        rank2("x").as("ra"), rank2("y").as("rb"),
        count(lit(1)).over(Window.partitionBy(col("g"))).as("n"))
      .select(col("g"),
        (col("ra") - col("n") - 1).cast("decimal(19,0)").as("dx"),
        (col("rb") - col("n") - 1).cast("decimal(19,0)").as("dy"))
    val spearman = ranked.groupBy(col("g"))
      .agg(sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .select(lit("spearman").as("stat"), col("g").as("grp"),
        round(col("sxy").cast("double") /
          (sqrt(col("sxx").cast("double")) *
            sqrt(col("syy").cast("double"))), 6).as("value"))
    // Kendall τ-b over nation-level points: all-integer pair census.
    val pts = customer(s, d)
      .join(broadcast(nation(s, d).select(col("n_nationkey"),
        col("n_name"))), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("x"),
        round(sum(col("c_acctbal")) * 100, 0).cast("long").as("y"))
    val p = pts.select(col("n_name").as("na"), col("x").as("xa"),
      col("y").as("ya"))
      .join(pts.select(col("n_name").as("nb"), col("x").as("xb"),
        col("y").as("yb")), col("na") < col("nb"))
    val kendall = p.agg(
        count_if(((col("xa") < col("xb")) && (col("ya") < col("yb"))) ||
          ((col("xa") > col("xb")) && (col("ya") > col("yb")))).as("c"),
        count_if(((col("xa") < col("xb")) && (col("ya") > col("yb"))) ||
          ((col("xa") > col("xb")) && (col("ya") < col("yb")))).as("dd"),
        count_if(col("xa") === col("xb")).as("tx"),
        count_if(col("ya") === col("yb")).as("ty"),
        count(lit(1)).as("n0"))
      .select(lit("kendall_tau_b").as("stat"), lit("nation").as("grp"),
        round((col("c") - col("dd")) /
          sqrt((col("n0") - col("tx")) * (col("n0") - col("ty"))), 6)
          .as("value"))
    spearman.unionByName(kendall)
  }

  /** FIFO inventory costing as a relational cumulative-interval join —
    * the classic "needs a sequential scan" workload turned distributed.
    * Receipts (even order keys) and issues (odd) per part each get
    * exclusive cumulative-quantity intervals [cum−qty, cum) ordered by
    * ship date; FIFO matching is then EXACTLY interval overlap, so the
    * whole allocation is one per-part equi-join with an overlap
    * predicate — no loop, no state. Quantities are integral (cast long)
    * so the cumulative sums are exact; allocated cost is
    * matched·price_cents·1000 div qty in integer milli-cents (floor
    * allocation, engine-identical truncation on non-negative values),
    * summed in long. At 100 TB the join key is the part key, so the
    * quadratic stage is bounded by per-part lot counts — the shuffle
    * partitions by part and AQE handles hot parts; nothing global is
    * ever materialized. */
  def fifoCosting(s: SparkSession, d: String): DataFrame =
    fifoCostingDf(lineitem(s, d))

  /** [[fifoCosting]] on a caller-supplied lineitem frame (needs
    * `l_partkey/l_orderkey/l_linenumber/l_shipdate/l_quantity/
    * l_extendedprice`) — ScaleProbe runs this production path on a
    * replicated input with a planted Zipfian hot-part head, turning
    * the scaladoc's "AQE handles hot parts" claim into a recorded
    * ×16/×64 receipt (round-13 verdict item 3). */
  def fifoCostingDf(liRaw: DataFrame): DataFrame = {
    val li = liRaw.select(col("l_partkey"), col("l_orderkey"),
      col("l_linenumber"), col("l_shipdate"),
      col("l_quantity").cast("long").as("qty"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("pc"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def side(mod: Int) = li.filter(col("l_orderkey") % 2 === mod)
      .select(col("l_partkey"), col("qty"), col("pc"),
        sum(col("qty")).over(w).as("hi"))
      .withColumn("lo", col("hi") - col("qty"))
    val r = side(0).select(col("l_partkey"), col("qty").as("rq"),
      col("pc"), col("lo").as("rlo"), col("hi").as("rhi"))
    val i = side(1).select(col("l_partkey"), col("lo").as("ilo"),
      col("hi").as("ihi"))
    r.join(i, Seq("l_partkey"))
      .filter(col("rlo") < col("ihi") && col("ilo") < col("rhi"))
      .select(col("l_partkey"),
        (least(col("rhi"), col("ihi")) -
          greatest(col("rlo"), col("ilo"))).as("m"),
        col("rq"), col("pc"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("m")).as("matched_qty"),
        round(sum(expr("m * pc * 1000 div rq")) / 100000.0, 2)
          .as("cogs"))
  }

  /** Incremental JOIN maintenance (delta algebra): with lineitem and
    * orders each split into a base and an insert batch, the maintained
    * aggregate folds the three delta joins ΔL⋈R₀ ∪ L₀⋈ΔR ∪ ΔL⋈ΔR into
    * the base aggregate instead of rejoining everything — the update
    * cost is |Δ|-proportional, which is THE point at 100 TB (q140's
    * incremental-agg idea lifted to binary joins). The query runs BOTH
    * paths and proves them identical in exact integers (cents-as-long
    * revenue, long counts) — `consistent` must be true on every row;
    * the oracle recomputes the same two paths, so a hash match pins the
    * delta algebra itself. */
  def joinIvm(s: SparkSession, d: String): DataFrame = {
    // NO localCheckpoint on either side (round 9): the ×64 run OOM'd
    // here — two corpus-sized pinned block sets (38M + 9.6M rows) sat
    // in the unified region while four concurrent shuffle joins bid
    // for execution memory ("unable to acquire 44 bytes"). Re-reading
    // the 3-column pruned parquet four times is the scale-correct
    // trade: at 100 TB a maintenance job reads base/delta from storage
    // with pushed projections — it never pins the corpus in memory.
    val li = lineitem(s, d).select(col("l_orderkey"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("cents"),
      (col("l_orderkey") % 10 === 0).as("dl"))
    val o = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"),
      (col("o_custkey") % 7 === 0).as("dr"))
    val l0 = li.filter(!col("dl")); val dL = li.filter(col("dl"))
    val r0 = o.filter(!col("dr")); val dR = o.filter(col("dr"))
    def agg(left: DataFrame, right: DataFrame, cnt: String,
        rev: String): DataFrame =
      left.join(right, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as(cnt), sum(col("cents")).as(rev))
    // full recompute vs base + the three delta joins — four SEPARATE
    // joins, so the equality is the delta-algebra identity, not a
    // partition-of-one-join triviality
    val full = agg(li, o, "n_full", "rev_full")
    val base = agg(l0, r0, "n0", "r0")
    val dLR0 = agg(dL, r0, "n1", "r1")
    val l0DR = agg(l0, dR, "n2", "r2")
    val dLDR = agg(dL, dR, "n3", "r3")
    val incr = base
      .join(dLR0, Seq("o_orderpriority"), "full_outer")
      .join(l0DR, Seq("o_orderpriority"), "full_outer")
      .join(dLDR, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)) +
          coalesce(col("n2"), lit(0L)) + coalesce(col("n3"), lit(0L)))
          .as("n_incr"),
        (coalesce(col("r0"), lit(0L)) + coalesce(col("r1"), lit(0L)) +
          coalesce(col("r2"), lit(0L)) + coalesce(col("r3"), lit(0L)))
          .as("rev_incr"))
    full.join(incr, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"), col("n_full"), col("rev_full"),
        col("n_incr"), col("rev_incr"),
        (col("n_full") === col("n_incr") &&
          col("rev_full") === col("rev_incr")).as("consistent"))
  }

  /** Wilson-score lower-bound ranking of per-brand return rates — the
    * statistically sound way to rank proportions with unequal sample
    * sizes (a 3/4 return rate must not outrank 290/1000; the plain
    * ratio does, the Wilson lower bound doesn't). All inputs are exact
    * integer counts; p̂ and the bound are a fixed chain of IEEE ops on
    * them — bit-identical cross-engine — and the ranking orders by the
    * ROUNDED bound with brand tie-break. One scan, one partial-agg
    * shuffle to 25 brand rows, window over 25 rows. */
  def wilsonRanking(s: SparkSession, d: String): DataFrame = {
    val z2 = lit(3.8416) // 1.96²: literal text mirrored in the oracle SQL
    val p = col("pos") / col("n")
    val lower = (p + z2 / (col("n") * 2) -
      lit(1.96) * sqrt((p * (lit(1.0) - p) + z2 / (col("n") * 4)) /
        col("n"))) / (lit(1.0) + z2 / col("n"))
    lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        count_if(col("l_returnflag") === "R").as("pos"))
      .select(col("p_brand"), col("n"), col("pos"),
        round(p, 6).as("rate"), round(lower, 6).as("wilson_lower"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("wilson_lower").desc, col("p_brand"))))
  }

  /** Isotonic calibration curve via the native PAVA aggregate
    * ([[graft.functions.IsotonicPava]]): per model (a deterministic
    * user split), event values bin into 20 fixed 25-unit buckets on
    * exact cents, outcome = purchase, and the nondecreasing fitted
    * rate per bin comes out of ONE aggregation whose shuffle carries
    * 2·20 longs per (group, mapper) — input-size-independent map-side
    * combine. The DuckDB oracle computes the same fit via the
    * QUADRATIC minimax formula max_{j≤i} min_{k≥i} avg(y[j..k]) —
    * a hash match proves the sequential pooling algorithm against an
    * algebraically different formulation (the q97-q100 pattern). Both
    * sides' fitted values are single divisions of identical exact
    * integers, so the compare is bit-exact. */
  def isotonicCalibration(s: SparkSession, d: String): DataFrame = {
    val binned = events(s, d).select(
      pmod(col("user_id"), lit(3)).cast("int").as("model"),
      least(floor(round(col("value") * 100, 0) / 2500), lit(19L))
        .cast("int").as("bin"),
      (col("event_type") === "purchase").cast("long").as("y"))
    binned.groupBy(col("model"))
      .agg(graft.functions.AggregateKernels
        .isotonicPava(col("bin"), col("y"), 20).as("fit"))
      .select(col("model"), explode(col("fit")).as("e"))
      .select(col("model"), col("e.bin").as("bin"), col("e.n").as("n"),
        col("e.pos").as("pos"),
        round(col("e.pos") / col("e.n"), 6).as("rate_raw"),
        round(col("e.rate_iso"), 6).as("rate_iso"))
  }

  /** Benjamini-Hochberg FDR correction over a family of per-nation
    * two-sample KS tests (1997 vs 1998 order-value distributions) —
    * the standard multiple-testing control when a pipeline runs one
    * drift test per segment. Per nation: ecdf-gap D from exact integer
    * cumulative counts (single divisions, bit-identical), asymptotic
    * p = min(1, 2·exp(−2·D²·nm/(n+m))); then the BH step-up is a
    * REVERSED running minimum of p·m/rank over the p-ascending order
    * (rank ties broken by nation name). Everything after the per-nation
    * reduction is a 25-row window pass. At 100 TB: the per-(nation,
    * value) pre-aggregation is the only wide shuffle; the KS scan per
    * nation is a window over value order, partition-parallel across
    * nations. */
  def bhFdr(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .filter(year(col("o_orderdate")).isin(1997, 1998))
      .groupBy(col("n_name"), col("o_totalprice").as("v"))
      .agg(count_if(year(col("o_orderdate")) === 1997).as("na"),
        count_if(year(col("o_orderdate")) === 1998).as("nb"))
    val wCum = Window.partitionBy(col("n_name")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("n_name"))
    val perNation = o
      .withColumn("ta", sum(col("na")).over(wAll))
      .withColumn("tb", sum(col("nb")).over(wAll))
      .withColumn("gap", abs(sum(col("na")).over(wCum) / col("ta") -
        sum(col("nb")).over(wCum) / col("tb")))
      .groupBy(col("n_name"))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        max(col("gap")).as("dr"))
      .withColumn("p", least(lit(1.0), lit(2.0) *
        exp(lit(-2.0) * col("dr") * col("dr") *
          (col("n_a") * col("n_b") /
            (col("n_a") + col("n_b")).cast("double")))))
    val m = count(lit(1)).over(Window.partitionBy())
    val wRank = Window.orderBy(col("p"), col("n_name"))
    val wStepUp = Window.orderBy(col("rk").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    perNation
      .withColumn("m", m)
      .withColumn("rk", row_number().over(wRank))
      .withColumn("p_adj", least(lit(1.0),
        min(col("p") * col("m") / col("rk")).over(wStepUp)))
      .select(col("n_name"), col("n_a"), col("n_b"),
        round(col("dr"), 6).as("d"), col("rk"),
        round(col("p"), 8).as("p_raw"),
        round(col("p_adj"), 8).as("p_adj"),
        (col("p_adj") <= 0.1).as("significant"))
  }

  /** Price-volume-mix bridge: decomposes per-brand revenue change from
    * ship-year 1997 to 1998 into new-part, lost-part, price, volume and
    * mix effects — the standard FP&A waterfall. Per-part unit prices are
    * single divisions of EXACT integers (cents-as-long revenue, integer
    * quantities summed in double where they are exact), so every
    * per-part effect term is a handful of bit-identical IEEE ops; the
    * per-brand reductions of those terms run in DECIMAL(30,12) where
    * reassociation is lossless (NOTES_r4's float-summation rule). The
    * identity new+lost+price+volume+mix = Δrevenue holds to rounding
    * and is asserted in the spec. At 100 TB: the year filter pushes to
    * the scan, the per-(part, year) rollup is the only wide shuffle
    * (partial-aggregated), part is a broadcast dim, and the brand-level
    * pass reduces parts→25 rows. */
  def priceVolumeMix(s: SparkSession, d: String): DataFrame = {
    val yr = year(col("l_shipdate"))
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val perPart = lineitem(s, d)
      .filter(yr.isin(1997, 1998))
      .groupBy(col("l_partkey"))
      .agg(
        sum(when(yr === 1997, col("l_quantity")).otherwise(0.0)).as("q1"),
        sum(when(yr === 1998, col("l_quantity")).otherwise(0.0)).as("q2"),
        sum(when(yr === 1997, cents).otherwise(0L)).as("r1"),
        sum(when(yr === 1998, cents).otherwise(0L)).as("r2"))
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val both = col("q1") > 0 && col("q2") > 0
    val p1 = (col("r1") / 100.0) / col("q1")
    val p2 = (col("r2") / 100.0) / col("q2")
    val dec = (c: Column) => c.cast("decimal(30,12)")
    // revenue columns stay UNROUNDED exact-cents/100 doubles (identical
    // bit patterns both engines); decimal-summed effects round IN
    // DECIMAL (half-up on exact digits — engine-identical), and only
    // the volume/mix pair rounds in double space
    val vol = when(col("q1b") > 0, (col("q2b") - col("q1b")) *
      ((col("r1b") / 100.0) / col("q1b"))).otherwise(lit(0.0))
    perPart.groupBy(col("p_brand"))
      .agg(
        (sum(col("r1")) / 100.0).as("rev1"),
        (sum(col("r2")) / 100.0).as("rev2"),
        (sum(when(col("q1") === 0, col("r2")).otherwise(0L)) / 100.0)
          .as("new_eff"),
        (-sum(when(col("q2") === 0, col("r1")).otherwise(0L)) / 100.0)
          .as("lost_eff"),
        sum(when(both, dec(col("q2") * (p2 - p1))).otherwise(dec(lit(0))))
          .as("price_dec"),
        sum(when(both, dec((col("q2") - col("q1")) * p1))
          .otherwise(dec(lit(0)))).cast("double").as("volmix"),
        sum(when(both, col("q1")).otherwise(0.0)).as("q1b"),
        sum(when(both, col("q2")).otherwise(0.0)).as("q2b"),
        sum(when(both, col("r1")).otherwise(0L)).as("r1b"))
      .select(col("p_brand"), col("rev1"), col("rev2"),
        col("new_eff"), col("lost_eff"),
        round(col("price_dec"), 4).cast("double").as("price_eff"),
        round(vol, 4).as("volume_eff"),
        round(col("volmix") - vol, 4).as("mix_eff"))
  }

  /** Population Stability Index — the standard model-monitoring drift
    * score — of the order-value distribution per market segment,
    * baseline (≤1997) vs current (≥1998). Values bin into ten fixed
    * 50k-wide buckets on EXACT cents (floor on an exact-integer ratio,
    * engine-identical), the bin universe is materialized with a
    * sequence so EMPTY bins contribute their Laplace-smoothed share
    * ((c+1)/(n+10) — PSI is undefined on zero cells), and
    * psi = Σ (p_b − p_c)·ln(p_b/p_c) rounded to 6 (each term is a
    * handful of IEEE ops on exact rationals; engines agree far below
    * the rounding). The whole query is two broadcast-joined aggregates
    * over one orders scan — at 100 TB it is scan-bound with a 5×10-cell
    * shuffle. */
  def psiDrift(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .join(broadcast(customer(s, d).select(col("c_custkey"),
        col("c_mktsegment").as("seg"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("seg"),
        (year(col("o_orderdate")) <= 1997).as("is_base"),
        least(floor(round(col("o_totalprice") * 100, 0) / 5000000)
          .cast("long"), lit(9L)).as("bin"))
    val counts = o.groupBy(col("seg"), col("bin"))
      .agg(count_if(col("is_base")).as("cb"),
        count_if(!col("is_base")).as("cc"))
    val universe = o.select(col("seg")).distinct()
      .select(col("seg"), explode(sequence(lit(0L), lit(9L))).as("bin"))
    val full = universe.join(counts, Seq("seg", "bin"), "left_outer")
      .select(col("seg"), col("bin"),
        coalesce(col("cb"), lit(0L)).as("cb"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    full.groupBy(col("seg"))
      .agg(sum(col("cb")).as("n_base"), sum(col("cc")).as("n_curr"))
      .join(full, Seq("seg"))
      .select(col("seg"), col("n_base"), col("n_curr"),
        (((col("cb") + 1) / (col("n_base") + 10) -
          (col("cc") + 1) / (col("n_curr") + 10)) *
          log(((col("cb") + 1) / (col("n_base") + 10)) /
            ((col("cc") + 1) / (col("n_curr") + 10)))).as("term"))
      .groupBy(col("seg"), col("n_base"), col("n_curr"))
      .agg(round(sum(col("term")), 6).as("psi"))
  }
}
