package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Feature-engineering / statistics wave (round 5): the transformations a
  * training-data pipeline applies between raw tables and model input —
  * the hashing trick, leakage-safe target encoding, WOE/IV scorecard
  * binning, a one-pass correlation matrix, a rank-sum hypothesis test and
  * offline changepoint detection. Every query follows the repo's exact-
  * arithmetic discipline: integer/decimal aggregates first, one fixed
  * IEEE chain on the reduced values second (bit-identical cross-engine),
  * rounding only at the output edge. Each documents its 100 TB plan.
  *
  * Reference scope: the reference pipeline stops at cleaned tables
  * (reference `code/beam.py:118-166` — filter/cast/split); these are the
  * downstream feature steps its BigQuery consumers would run next, kept
  * Spark-native here. */
object MLPrep {
  import Tables._

  /** Hashing-trick featurization (Weinberger et al. 2009): tokens hash
    * into a fixed 64-bucket space with a ±1 sign bit, so the feature
    * matrix has bounded width no matter how large the vocabulary grows —
    * THE property that matters at 100 TB, where a vocabulary join or
    * dictionary broadcast would be unbounded. Hash = leading 24 bits of
    * md5 (available and identical in every engine — Spark's murmur3
    * `hash()` is engine-private, so portable pipelines pin a portable
    * hash); sign = parity of the next 4 bits. One token explode (map-
    * side), one partial-aggregated shuffle keyed (doc, bucket); no UDFs,
    * everything whole-stage-codegen. */
  def featureHashing(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' '), x -> x <> '')"))
          .as("tok"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(tok), 1, 6), 16, 10) as bigint)")
          .as("h"),
        expr("cast(conv(substring(md5(tok), 7, 1), 16, 10) as bigint)")
          .as("sb"))
      .select(col("doc_id"), (col("h") % 64).as("bucket"),
        when(col("sb") % 2 === 0, lit(1L)).otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("sgn")).as("w"))

  /** Leakage-safe (K-fold out-of-fold) smoothed target encoding of
    * customer market segment against order fallthrough (status 'F'):
    * each fold's encoding uses only the OTHER folds' rows, blended
    * toward the out-of-fold global rate with strength m=10 — the
    * standard high-cardinality categorical encoder. The whole
    * computation reduces to one 25-row (segment × fold) count table;
    * out-of-fold counts are window subtractions on those 25 rows, so
    * at 100 TB the single wide shuffle is the partial-aggregated
    * (segment, fold) count and everything after is driver-trivial.
    * All rates are single divisions of exact longs; the blend is a
    * fixed IEEE chain — bit-identical cross-engine. */
  def targetEncoding(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        (col("o_orderkey") % 5).as("fold"),
        (col("o_orderstatus") === "F").cast("long").as("y"))
      .groupBy(col("seg"), col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
    val wSeg = Window.partitionBy(col("seg"))
    val wFold = Window.partitionBy(col("fold"))
    val wAll = Window.partitionBy()
    val nOf = sum(col("n")).over(wSeg) - col("n")
    val posOf = sum(col("pos")).over(wSeg) - col("pos")
    val gOf = (sum(col("pos")).over(wAll) - sum(col("pos")).over(wFold)) /
      (sum(col("n")).over(wAll) - sum(col("n")).over(wFold))
    base.select(col("seg"), col("fold"), nOf.as("n_of"), posOf.as("pos_of"),
      round((posOf + lit(10.0) * gOf) / (nOf + lit(10)), 6).as("enc"))
  }

  /** Weight-of-evidence / information-value scorecard binning: part size
    * binned by tens against lineitem return outcome. WOE_b =
    * ln((pos_b/pos_tot)/(neg_b/neg_tot)) with +0.5 Laplace smoothing,
    * IV = Σ_b (dp_b − dn_b)·WOE_b — the standard credit-scoring feature
    * screen. The scan reduces to 5 bin-count rows (partial-aggregated;
    * part is a broadcast dim), then windows over 5 rows; the IV
    * reassociation runs over 5 doubles (noise ~1e-17, output rounded at
    * 1e-6). */
  def woeIv(s: SparkSession, d: String): DataFrame = {
    val binned = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .select(floor(col("p_size") / 10).cast("int").as("bin"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      .groupBy(col("bin"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
    val wAll = Window.partitionBy()
    // two layers: dp/dn materialize first (a window result cannot feed
    // another window function in the same projection)
    val dists = binned.select(col("bin"), col("pos"), col("neg"),
      ((col("pos") + lit(0.5)) / sum(col("pos")).over(wAll)).as("dp"),
      ((col("neg") + lit(0.5)) / sum(col("neg")).over(wAll)).as("dn"))
    val woe = log(col("dp") / col("dn"))
    dists.select(col("bin"), col("pos"), col("neg"),
      round(woe, 6).as("woe"),
      round(sum((col("dp") - col("dn")) * woe).over(wAll), 6).as("iv"))
  }

  /** Pairwise Pearson correlation matrix over four lineitem measures in
    * ONE aggregation pass: all 4 sums, 4 sums-of-squares and 6 cross
    * moments are columns of a single partial-aggregated global agg (no
    * unpivot self-join — a pairwise join would rescan the fact table
    * C(k,2) times; this plan scans ONCE regardless of k and ships one
    * row). Measures are exact integers (dollars, cents-scaled discount/
    * tax), moments accumulate in DECIMAL(38,0) (lossless reassociation
    * — safe under any partitioning), and each correlation is a fixed
    * IEEE chain on the decimal-exact moments. The 1-row result unpivots
    * to 6 (feat_a, feat_b) rows driver-side. */
  def corrMatrix(s: SparkSession, d: String): DataFrame = {
    val feats = Seq(
      "qty" -> col("l_quantity").cast("long"),
      "price" -> round(col("l_extendedprice"), 0).cast("long"),
      "disc" -> round(col("l_discount") * 100, 0).cast("long"),
      "tax" -> round(col("l_tax") * 100, 0).cast("long"))
    val base = lineitem(s, d).select(
      feats.map { case (n, c) => c.as(n) }: _*)
    def dsum(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 0))).cast("double")
    val moments = base.agg(
      count(lit(1)).cast("double").as("n"),
      feats.map { case (nm, _) => dsum(col(nm)).as(s"s_$nm") } ++
        feats.map { case (nm, _) =>
          dsum(col(nm) * col(nm)).as(s"ss_$nm") } ++
        feats.combinations(2).map { case Seq((a, _), (b, _)) =>
          dsum(col(a) * col(b)).as(s"sp_${a}_$b") }.toSeq: _*)
    val pairs = feats.map(_._1).combinations(2).map { case Seq(a, b) =>
      struct(lit(a).as("feat_a"), lit(b).as("feat_b"),
        ((col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")) /
          sqrt((col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
            (col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))))
          .as("corr"))
    }.toSeq
    moments.select(col("n").cast("long").as("n"),
      explode(array(pairs: _*)).as("p"))
      .select(col("p.feat_a").as("feat_a"), col("p.feat_b").as("feat_b"),
        col("n"), round(col("p.corr"), 6).as("corr"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) two-sample test with full tie
    * correction: are returned ('R') and non-returned ('N') line items
    * drawn from the same quantity distribution? Quantities are small
    * integers, so ties dominate and the midrank/tie-corrected normal
    * approximation is the textbook form. EVERYTHING up to the final z
    * is exact integer arithmetic — midranks are rationals with
    * denominator 2, so the rank-sum is carried ×2 as a long
    * (`r1x2`) and U likewise — making the reduction bit-exact under any
    * partitioning; z is one fixed IEEE chain on those exact integers.
    * At 100 TB the plan reduces to one ~50-row per-value count table
    * (partial-aggregated), then windows over values. */
  def mannWhitney(s: SparkSession, d: String): DataFrame = {
    val counts = lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "N"))
      .select(col("l_quantity").cast("long").as("v"),
        (col("l_returnflag") === "R").cast("long").as("isR"))
      .groupBy(col("v"))
      .agg(sum(col("isR")).as("na"),
        (count(lit(1)) - sum(col("isR"))).as("nb"))
    val wCum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = col("na") + col("nb")
    val stats = counts
      .withColumn("below", coalesce(sum(col("na") + col("nb")).over(wCum),
        lit(0L)))
      .agg(sum(col("na")).as("n1"), sum(col("nb")).as("n2"),
        // Σ na_v · midrank_v, scaled ×2: midrank = below + (t+1)/2
        sum(col("na") * (lit(2) * col("below") + t + 1)).as("r1x2"),
        sum(t * t * t - t).as("tie"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val nn = n1 + n2
    val u1 = (col("r1x2") - col("n1") * (col("n1") + 1))
      .cast("double") / 2
    val sigma = sqrt(n1 * n2 / 12 *
      ((nn + 1) - col("tie").cast("double") / (nn * (nn - 1))))
    stats.select(col("n1"), col("n2"), u1.as("u1"),
      round((u1 - n1 * n2 / 2) / sigma, 6).as("z"))
  }

  /** Offline single-changepoint detection per customer segment: the
    * split day k minimizing total within-segment SSE of daily revenue
    * (binary-segmentation step 1, Scott-Knott style). Daily revenue
    * reduces to exact integer dollars per (segment, day) — the only
    * wide shuffle, partial-aggregated; prefix sums and the cost curve
    * are windows over ~365 rows per segment, partition-parallel across
    * segments. SSE via the prefix-sum identity ss − s²/k; the argmin is
    * a rank over (cost, k) on bit-identical doubles, day tie-broken. */
  def changepoint(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .join(broadcast(customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice"), 0).cast("long")).as("rev"))
    val wCum = Window.partitionBy(col("seg")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wSeg = Window.partitionBy(col("seg"))
    // rev² sums run in DECIMAL: daily revenue at the ×64 replica is
    // ~1e8 dollars, whose square (~1e16) overflows int64 within a
    // 365-day prefix sum (the ×64 bench caught exactly this — ANSI
    // ARITHMETIC_OVERFLOW). DECIMAL(15,0)² → DECIMAL(31,0), summed at
    // DECIMAL(38,0): exact for daily revenue up to 1e15, i.e. corpus
    // headroom far past 100 TB. DuckDB needs no mirror — its sum()
    // already returns HUGEINT — and the values stay exactly equal
    // integers on both engines before the one double cast.
    val revD = col("rev").cast("decimal(15,0)")
    val pre = daily
      .withColumn("k", count(lit(1)).over(
        Window.partitionBy(col("seg")).orderBy(col("day"))))
      .withColumn("s", sum(col("rev")).over(wCum))
      .withColumn("ss", sum(revD * revD).over(wCum))
      .withColumn("dn", count(lit(1)).over(wSeg))
      .withColumn("st", sum(col("rev")).over(wSeg))
      .withColumn("sst", sum(revD * revD).over(wSeg))
      .filter(col("k") < col("dn"))
    val k = col("k").cast("double")
    val rk = (col("dn") - col("k")).cast("double")
    val cost = (col("ss").cast("double") -
      col("s").cast("double") * col("s") / k) +
      ((col("sst") - col("ss")).cast("double") -
        (col("st") - col("s")).cast("double") * (col("st") - col("s")) / rk)
    val scored = pre.withColumn("cost", cost)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("seg")).orderBy(col("cost"), col("k"))))
      .filter(col("rn") === 1)
    // report the SCALE-FREE variance-reduction ratio, not the raw SSE:
    // the SSE magnitude (~1e13) sits below double ulp at 4 decimals, so
    // rounding it is engine-implementation noise; the ratio is O(1)
    val cost0 = col("sst").cast("double") -
      col("st").cast("double") * col("st") / col("dn").cast("double")
    scored.select(col("seg"), col("day").as("split_day"), col("k"),
      round(lit(1.0) - col("cost") / cost0, 6).as("var_red"),
      round((col("st") - col("s")).cast("double") / rk -
        col("s").cast("double") / k, 4).as("delta_mean"))
  }

  /** Hodges-Lehmann pseudo-median of returned-line quantities — the
    * robust location estimator behind the Wilcoxon test: the median of
    * all N(N+1)/2 Walsh averages (vᵢ+vⱼ)/2, i ≤ j. Materializing N²/2
    * pairs is impossible at scale; quantities are small integers, so the
    * computation COMPRESSES to value counts first (one tiny partial-agg
    * shuffle) and runs the pairing on the ~50-row count table with
    * multiplicities — the pair weights (cᵢ·cⱼ, or cᵢ(cᵢ+1)/2 on the
    * diagonal) reconstruct the full multiset exactly. Walsh values are
    * carried ×2 as integers; the lower median comes off a cumulative
    * weight scan, and the single /2.0 at the edge is exactly
    * representable (.0 or .5). Zero float risk end to end. */
  def hodgesLehmann(s: SparkSession, d: String): DataFrame = {
    val vc = lineitem(s, d).filter(col("l_returnflag") === "R")
      .groupBy(col("l_quantity").cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val a = vc.select(col("v").as("va"), col("c").as("ca"))
    val b = vc.select(col("v").as("vb"), col("c").as("cb"))
    val walsh = a.join(b, col("va") <= col("vb"))
      .select((col("va") + col("vb")).as("w2"),
        when(col("va") === col("vb"),
          expr("ca * (ca + 1) div 2"))
          .otherwise(col("ca") * col("cb")).as("wt"))
      .groupBy(col("w2")).agg(sum(col("wt")).as("wt"))
    val wCum = Window.orderBy(col("w2"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val ranked = walsh
      .withColumn("cum", sum(col("wt")).over(wCum))
      .withColumn("t", sum(col("wt")).over(wAll))
    ranked.filter(col("cum") >= expr("(t + 1) div 2"))
      .orderBy(col("w2")).limit(1)
      .select(col("t").as("n_walsh"), (col("w2") / lit(2.0)).as("hl"))
  }

  /** Expected calibration error of a deterministic scorer against the
    * purchase outcome — the standard reliability-diagram metric. The
    * "model" is a portable md5-derived confidence (16 bits of
    * md5(event_id) / 65536 — the repo's deterministic-sampling idiom,
    * identical in every engine), binned into 10 equal-width buckets.
    * Per-bin confidence sums the RAW 16-bit integers (exact longs) and
    * divides once, so conf/acc/gap are fixed IEEE chains on exact
    * integers; the ECE rollup is a window sum over 10 rows. One
    * partial-aggregated shuffle at any scale. */
  def calibrationError(s: SparkSession, d: String): DataFrame = {
    val scored = events(s, d).select(
      expr("cast(conv(substring(md5(cast(event_id as string)), 1, 4), " +
        "16, 10) as bigint)").as("c16"),
      (col("event_type") === "purchase").cast("long").as("y"))
      .select(col("c16"), col("y"),
        least(expr("c16 * 10 div 65536"), lit(9L)).as("bin"))
    val bins = scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        sum(col("c16")).as("sc16"))
    val wAll = Window.partitionBy()
    val conf = col("sc16") / (col("n") * lit(65536.0))
    val acc = col("pos") / col("n").cast("double")
    val gapTerm = col("n").cast("double") /
      sum(col("n")).over(wAll) * abs(acc - conf)
    val layered = bins.select(col("bin"), col("n"), col("pos"),
      round(conf, 6).as("conf"), round(acc, 6).as("acc"),
      gapTerm.as("gt"))
    layered.select(col("bin"), col("n"), col("pos"), col("conf"),
      col("acc"), round(sum(col("gt")).over(wAll), 6).as("ece"))
  }

  /** NDCG@10 of a popularity ranker per user — the ranking-quality
    * metric of a recommender eval: items rank by GLOBAL engagement
    * (the q232 degree), relevance is the user's own interaction count,
    * DCG = Σ rel/log₂(pos+1) over the top 10, normalized by the ideal
    * (relevance-sorted) ordering. Both orderings are row_number windows
    * with full tie-breaks; rel and pos are exact integers, each term a
    * single division, per-user sums run over ≤ 10 doubles (noise
    * ~1e-16 vs the 1e-6 output rounding). Degrees broadcast; the only
    * wide shuffle is the per-(user, item) count. */
  def ndcgAt10(s: SparkSession, d: String): DataFrame = {
    val ui = events(s, d).select(col("user_id").as("u"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .filter(col("item").isNotNull)
      .groupBy(col("u"), col("item")).agg(count(lit(1)).as("rel"))
      .localCheckpoint() // degree pass + both ranking windows
    val deg = ui.groupBy(col("item")).agg(count(lit(1)).as("deg"))
    val wPred = Window.partitionBy(col("u"))
      .orderBy(col("deg").desc, col("item"))
    val wIdeal = Window.partitionBy(col("u"))
      .orderBy(col("rel").desc, col("item"))
    val scored = ui.join(broadcast(deg), Seq("item"))
      .withColumn("pp", row_number().over(wPred))
      .withColumn("ip", row_number().over(wIdeal))
    val dcg = sum(when(col("pp") <= 10,
      col("rel") / log2(col("pp") + 1)).otherwise(lit(0.0)))
    val idcg = sum(when(col("ip") <= 10,
      col("rel") / log2(col("ip") + 1)).otherwise(lit(0.0)))
    scored.groupBy(col("u"))
      .agg(count(lit(1)).as("n_items"), dcg.as("d"), idcg.as("i"))
      .select(col("u"), col("n_items"),
        round(col("d") / col("i"), 6).as("ndcg10"))
  }

  /** Exponentially time-decayed engagement score per user (half-life
    * 30 days against the corpus max timestamp) — the feature-store
    * recency weighting: score = Σ value·2^(−age_days/30). Decay terms
    * are transcendental, so each one rounds to 9 decimals and sums as
    * a scaled long (the q215/q212 exact-sum discipline — a plain
    * double sum would be partition-order-dependent); ages are exact
    * integer day differences from the broadcast 1-row max. One wide
    * shuffle (per-user partial agg) at any scale. */
  def timeDecayScore(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"),
      col("value"), col("ts").cast("date").as("day"))
    val mx = ev.agg(max(col("day")).as("mxd"))
    ev.crossJoin(broadcast(mx))
      .select(col("user_id"),
        // value is dollars-and-cents: exact as cents; the decay factor
        // rounds to 1e-9 and the product re-quantizes to 1e-6 before
        // the exact scaled-long sum
        round(round(col("value") * 100, 0) *
          round(pow(lit(2.0), -datediff(col("mxd"), col("day")) / 30.0),
            9) * 10000, 0).cast("long").as("t"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("t")) / lit(1000000.0)).as("decayed_value"))
  }

  /** Freedman-Diaconis auto-binned histogram of order totals — the
    * data-driven bin-width rule (h = 2·IQR/∛n) every profiling layer
    * needs before it can draw a histogram. IQR comes from EXACT
    * discrete percentiles (order statistics — engine-independent,
    * unlike interpolating quantiles), the width rounds to 6 decimals
    * so both engines bin with the IDENTICAL constant, and assignment
    * is a broadcast of the 1-row stats + a map-side floor division —
    * one partial-aggregated shuffle for the counts. */
  def fdHistogram(s: SparkSession, d: String): DataFrame = {
    val v = orders(s, d).select(col("o_totalprice").as("x"))
    val stats = v.agg(count(lit(1)).as("n"), min(col("x")).as("mn"),
      max(col("x")).as("mx"),
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY x)").as("q1"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY x)").as("q3"))
      .select(col("n"), col("mn"), col("mx"),
        round(lit(2.0) * (col("q3") - col("q1")) /
          cbrt(col("n")), 6).as("h"))
    v.crossJoin(broadcast(stats))
      .select(col("h"), col("mn"),
        least(floor((col("x") - col("mn")) / col("h")),
          ceil((col("mx") - col("mn")) / col("h")) - 1).as("bin"))
      .groupBy(col("bin"))
      .agg(max(col("h")).as("h"), count(lit(1)).as("n"),
        round(max(col("mn")) + col("bin") * max(col("h")), 2).as("lo"))
      .select(col("bin"), col("lo"), col("h"), col("n"))
  }
}
