package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Invariant specs for the round-4 continuation batteries (q126-q130). */
class Batteries4Spec extends SparkTestBase {
  import spark.implicits._

  test("repetition removal: hand-check + dedup accounting per doc") {
    val r = TextQueries.repetitionRemoval(spark, sf0001).cache()
    assert(r.count() > 0)
    assert(r.filter($"n_distinct" > $"n_words").count() === 0)
    // a consecutive duplicate is a duplicate: bounded by total dup mass
    assert(r.filter($"n_consec_dups" > $"n_words" - $"n_distinct")
      .count() === 0)
    // prefix carries min(10, n_distinct) distinct words, order-preserved
    val prefBad = r.filter(size(split($"dedup_prefix", " ")) =!=
      least($"n_distinct", lit(10))).count()
    assert(prefBad === 0)
    // hand-recompute one document sequentially
    val (docId, text) = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").as[(Long, String)].head()
    val words = text.split(" ").filter(_.nonEmpty)
    val distinct = words.distinct
    val consec = words.sliding(2).count(p => p.length == 2 && p(0) == p(1))
    val row = r.filter($"doc_id" === docId).head()
    assert(row.getAs[Int]("n_words") === words.length)
    assert(row.getAs[Int]("n_distinct") === distinct.length)
    assert(row.getAs[Int]("n_consec_dups") === consec)
    assert(row.getAs[String]("dedup_prefix") ===
      distinct.take(10).mkString(" "))
    r.unpersist()
  }

  test("markov transitions: rows normalize to 1, transition mass reconciles") {
    val m = Advanced.markovTransitions(spark, sf0001).cache()
    val rowSums = m.groupBy($"event_type").agg(sum($"p").as("sp"))
      .filter(abs($"sp" - 1.0) > 1e-4).count()
    assert(rowSums === 0)
    // each user contributes (events - 1) transitions
    val ev = Tables.events(spark, sf0001)
    val want = ev.count() - ev.select($"user_id").distinct().count()
    val got = m.agg(sum($"n")).head().getLong(0)
    assert(got === want, s"transitions $got vs $want")
    m.unpersist()
  }

  test("vector battery: norms positive, argmax consistent, unit bounded") {
    val v = Advanced.vectorBattery(spark, sf0001).cache()
    assert(v.count() > 0)
    assert(v.filter($"l2" <= 0).count() === 0)
    assert(v.filter($"unit_first" < -1.0 || $"unit_first" > 1.0)
      .count() === 0)
    assert(v.filter($"argmax_idx" < 1 || $"argmax_idx" > 64).count() === 0)
    v.unpersist()
  }

  test("fold assignment partitions the corpus") {
    val f = Advanced.foldAssignment(spark, sf0001).cache()
    assert(f.filter($"fold" < 0 || $"fold" >= 4).count() === 0)
    val total = f.agg(sum($"n_docs")).head().getLong(0)
    assert(total === Tables.documents(spark, sf0001).count())
    f.unpersist()
  }

  test("compression signal separates repetitive from high-entropy text") {
    import graft.functions.CompressionExpressions.deflateSize
    val fx = Seq(
      ("rep", "spam ham " * 200),
      ("mix", ("the quick brown fox jumps over the lazy dog " * 40)),
      ("rnd", (0 until 1600).map(i =>
        Integer.toHexString((i * 2654435761L % 4099).toInt)).mkString(" ")))
      .toDF("kind", "text")
      .select($"kind",
        (deflateSize($"text").cast("double") / length($"text")).as("ratio"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fx("rep") < 0.05, s"repetitive ratio ${fx("rep")}")
    assert(fx("rep") < fx("mix") && fx("mix") < fx("rnd"),
      s"ordering violated: $fx")
    // determinism: same text, same size, twice
    val again = Seq(("x", "spam ham " * 200)).toDF("k", "text")
      .select(deflateSize($"text")).head().getInt(0)
    val first = Seq(("x", "spam ham " * 200)).toDF("k", "text")
      .select(deflateSize($"text")).head().getInt(0)
    assert(again === first)
    // the corpus query itself: per-doc ratio stays in (0, 1 + hdr/len]
    // (DEFLATE stored-block overhead can exceed 10% on sub-100-char docs),
    // while the per-source AVERAGE stays in ordinary-text territory
    val q = TextQueries.compressionSignal(spark, sf0001).cache()
    assert(q.count() > 0)
    assert(q.filter($"min_ratio" <= 0 || $"max_ratio" > 1.5).count() === 0)
    assert(q.filter($"avg_ratio" > 1.1).count() === 0)
    q.unpersist()
  }

  test("sparse cosine matches a driver-side brute force on the same weights") {
    val got = TextQueries.sparseCosine(spark, sf0001).cache()
    // invariants: ordered pair ids, cos within [0.8, 1 + eps]
    assert(got.filter($"doc_a" >= $"doc_b").count() === 0)
    assert(got.filter($"cos" < 0.8 || $"cos" > 1.00001).count() === 0)
    // brute force: same tokenizer, same quantized tf-idf, dense dot
    val docs = Tables.documents(spark, sf0001)
      .filter($"doc_id" % 5 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty)
        .groupBy(identity).map { case (w, a) => w -> a.length.toDouble }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (w, a) => w -> a.size }
    val nd = docs.length
    def q4(x: Double) = math.rint(x * 1e4) / 1e4
    val w = tf.map { case (id, m) =>
      id -> m.map { case (word, f) =>
        word -> q4(f * (math.log((nd + 1.0) / (df(word) + 1.0)) + 1.0)) }
    }
    val ids = docs.map(_._1).sorted
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = w(ids(i)); b = w(ids(j))
      dot = a.keysIterator.filter(b.contains)
        .map(k => a(k) * b(k)).sum
      na = math.sqrt(a.values.map(x => x * x).sum)
      nb = math.sqrt(b.values.map(x => x * x).sum)
      c = math.rint(dot / (na * nb) * 1e5) / 1e5 if c >= 0.8
    } yield (ids(i), ids(j), c)).toSet
    val gotSet = got.as[(Long, Long, Double)].collect().toSet
    assert(gotSet === want, s"spark=${gotSet.size} brute=${want.size}")
    got.unpersist()
  }

  test("reservoir sample equals the ranking-window formulation") {
    val got = Advanced.reservoirSample(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source")
      .orderBy(expr("substring(md5(CAST(doc_id AS STRING)), 1, 8)"),
        $"doc_id")
    val want = Tables.documents(spark, sf0001)
      .select($"source", $"doc_id",
        row_number().over(w).cast("int").as("rk"))
      .filter($"rk" <= 5)
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("global row number equals the single-partition window form") {
    val got = Advanced.globalRowNumber(spark, sf0001)
    val want = Tables.orders(spark, sf0001)
      .select($"o_orderkey",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"o_orderkey")).cast("long").as("rn"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("bloom decontamination is transparent vs the exact anti join") {
    val got = Advanced.bloomDecontaminate(spark, sf0001)
    // plain exact formulation, no bloom: same gram definitions
    val t = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source",
        graft.functions.TextAnalysis.tokens($"text").as("toks"))
    val isBench = $"doc_id" % 7 === 0 && $"doc_id" < Advanced.BenchIdCap
    val grams = t.filter(size($"toks") >= 8)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(toks) - 7), " +
          "i -> concat_ws(' ', slice(toks, i, 8)))")).as("g"))
      .distinct()
    val bench = grams.filter(isBench).select($"g").distinct()
    val bad = grams.filter(!isBench)
      .join(bench, Seq("g"), "left_semi").select($"doc_id").distinct()
    val want = t.filter(!isBench)
      .join(bad, Seq("doc_id"), "left_anti")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size($"toks").cast("long")).as("n_tokens"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("mode battery: reported mode attains the max count in its group") {
    val m = Advanced.modeBattery(spark, sf0001).cache()
    assert(m.count() > 0)
    val maxc = Tables.orders(spark, sf0001)
      .groupBy($"o_orderpriority".as("grp"), $"o_orderstatus")
      .agg(count(lit(1)).as("c"))
      .groupBy($"grp").agg(max($"c").as("maxc"))
    assert(m.join(maxc, "grp").filter($"mode_n" =!= $"maxc").count() === 0)
    assert(m.filter($"n_big" > $"n").count() === 0)
    m.unpersist()
  }

  test("allen intervals: relations partition the pair set") {
    val rels = Advanced.allenIntervals(spark, sf0001).cache()
    val names = Set("equals", "before", "after", "meets", "met_by",
      "starts", "started_by", "finishes", "finished_by", "during",
      "contains", "overlaps", "overlapped_by")
    val got = rels.select($"rel").as[String].collect().toSet
    assert(got.subsetOf(names), s"unknown relations: ${got -- names}")
    // every pair lands in exactly one relation: totals reconcile
    val ev = Tables.events(spark, sf0001).filter($"user_id" % 5 === 0)
    val n = ev.filter($"event_id" % 2 === 0).select($"user_id")
      .join(ev.filter($"event_id" % 2 === 1).select($"user_id"), "user_id")
      .count()
    val total = rels.agg(sum($"n")).head().getLong(0)
    assert(total === n, s"classified $total of $n pairs")
    rels.unpersist()
  }

  test("mixture sampling: rates in (0,1], kept mass bounded, full-rate sources keep all") {
    val mix = TextQueries.mixtureSample(spark, sf0001).cache()
    assert(mix.count() > 0)
    assert(mix.filter($"rate" <= 0 || $"rate" > 1).count() === 0)
    val src = Tables.documents(spark, sf0001)
      .select($"doc_id", $"source",
        size(expr("filter(split(text, ' '), x -> x != '')"))
          .cast("long").as("toks"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"toks").as("src_toks"))
    val j = mix.join(src, "source").cache()
    assert(j.filter($"n_kept" > $"n_docs").count() === 0)
    assert(j.filter($"toks_kept" > $"src_toks").count() === 0)
    // rate 1 means the source's full token mass fits the target: keep all
    assert(j.filter($"rate" === 1.0 && $"n_kept" =!= $"n_docs")
      .count() === 0)
    j.unpersist(); mix.unpersist()
  }

  test("variant battery: round trip is the identity, error paths are null") {
    val v = Advanced.variantBattery(spark, sf0001).cache()
    assert(v.count() > 0)
    assert(v.filter($"vid" =!= $"doc_id").count() === 0)
    assert(v.filter($"vmissing".isNotNull || $"vbad".isNotNull).count() === 0)
    val doc = Tables.documents(spark, sf0001)
      .select($"doc_id", $"lang", $"n_chars", $"source")
    val bad = v.join(doc, "doc_id")
      .filter($"vlang" =!= $"lang" || $"vn" =!= $"n_chars" ||
        $"vtag0" =!= $"source")
    assert(bad.count() === 0)
  }

  test("bigram LM: weighted grouping equals the per-occurrence average") {
    val grouped = TextQueries.bigramLm(spark, sf0001).cache()
    assert(grouped.count() > 0)
    assert(grouped.filter($"bits_per_bigram" <= 0).count() === 0)
    // independent formulation: score every bigram OCCURRENCE, plain avg
    val bigf = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        expr("filter(split(lower(text), ' '), x -> x != '')").as("w"))
      .filter(size($"w") >= 2)
      .select(col("doc_id"), explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1), " +
          "(a, b) -> named_struct('w1', a, 'w2', b))")).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val cnt = bigf.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
    val uni = cnt.groupBy($"w1").agg(sum($"c12").as("c1"))
    val voc = bigf.agg(count_distinct($"w2").as("v"))
    val flat = bigf.join(cnt, Seq("w1", "w2")).join(uni, Seq("w1"))
      .crossJoin(broadcast(voc))
      .select($"doc_id",
        (-log2(($"c12" + 1.0) / ($"c1" + $"v"))).as("nll"))
      .groupBy($"doc_id")
      .agg(avg($"nll").as("flat_bits"), count(lit(1)).as("flat_n"))
    val joined = grouped.join(flat, "doc_id")
    assert(joined.filter($"n_bigrams" =!= $"flat_n").count() === 0)
    assert(joined
      .filter(abs($"bits_per_bigram" - $"flat_bits") > 1e-3).count() === 0)
  }

  test("robust/minmax scaling: bounds and monotonicity within group") {
    val r = Advanced.robustScale(spark, sf0001).cache()
    assert(r.count() > 0)
    assert(r.filter($"minmax" < 0 || $"minmax" > 1).count() === 0)
    // both scalings are affine in price with positive slope: orderings agree
    val disagree = r.as("a").join(r.as("b"),
        $"a.l_returnflag" === $"b.l_returnflag" &&
          $"a.robust" < $"b.robust" && $"a.minmax" > $"b.minmax")
    assert(disagree.count() === 0)
  }

  test("sequence pattern: funnels bounded by purchases, lengths match") {
    val p = Advanced.sequencePattern(spark, sf0001).cache()
    val perUser = Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when($"event_type" === "purchase", 1).otherwise(0)).as("n_p"))
    val j = p.join(perUser, "user_id").cache()
    assert(j.filter($"seq_len" =!= $"n_events").count() === 0)
    assert(j.filter($"n_funnels" > $"n_p").count() === 0)
    assert(p.agg(sum($"n_funnels")).head().getLong(0) > 0)
  }

  test("timezone battery: offsets, DST coverage, half-hour zones") {
    val t = Advanced.timezoneBattery(spark, sf0001).cache()
    assert(t.count() > 0)
    // NY is UTC-5 (EST) or UTC-4 (EDT) — nothing else, and the day-shift
    // spread must exercise BOTH sides of the DST transitions
    val offs = t.select($"ny_off_min").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(offs == Set(-300, -240), s"NY offsets seen: $offs")
    assert(t.filter($"kolkata_hour" < 0 || $"kolkata_hour" > 23)
      .count() === 0)
  }

  test("weighted quantiles: ordered, bracketed, and exact on a fixture") {
    val wq = Advanced.weightedQuantiles(spark, sf0001).cache()
    assert(wq.count() > 0)
    assert(wq.filter($"wp25" > $"wp50" || $"wp50" > $"wp75").count() === 0)
    // hand-checkable fixture: values 1..4 with weights 1,1,1,5 → half the
    // mass sits on 4, so the weighted median is 4 while p25 stays at 2
    val c = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 5.0))
      .toDF("v", "w")
    val cum = c.select($"v", sum($"w").over(
        org.apache.spark.sql.expressions.Window.orderBy($"v")
          .rowsBetween(Long.MinValue, 0)).as("cw"))
      .withColumn("tw", max($"cw").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val r = cum.agg(
      min(when($"cw" >= $"tw" * 0.25, $"v")).as("p25"),
      min(when($"cw" >= $"tw" * 0.5, $"v")).as("p50")).head()
    assert(r.getDouble(0) === 2.0 && r.getDouble(1) === 4.0)
  }

  test("pointer doubling equals the recursive-CTE walk row for row") {
    val pd = Advanced.pointerDoubling(spark, sf0001)
    val rc = Advanced.recursiveChain(spark, sf0001)
      .select($"o_custkey", $"o_orderkey", $"step",
        round($"run_total", 2).as("run_total"))
    // decimal accumulation vs double sequential sum: equal after round(2)
    assert(pd.exceptAll(rc).isEmpty && rc.exceptAll(pd).isEmpty)
    assert(pd.count() > 0)
  }

  test("chi-square battery: marginals reconcile, terms non-negative") {
    val c = Advanced.chiSquare(spark, sf0001).cache()
    val n = Tables.events(spark, sf0001).count()
    assert(c.agg(sum($"obs")).head().getLong(0) === n)
    assert(c.filter($"chi2_term" < 0 || $"expected" <= 0).count() === 0)
    // PMI averages to ~0 under near-independence; just require finite
    assert(c.filter($"pmi".isNull).count() === 0)
  }

  test("MAD outliers: robust stats sane, outliers a strict minority") {
    val m = Advanced.madOutliers(spark, sf0001).cache()
    assert(m.count() > 0)
    assert(m.filter($"mad" < 0 || $"n_outliers" >= $"n").count() === 0)
  }

  test("relational division equals the double-anti-join formulation") {
    val div = Advanced.relationalDivision(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    // textbook form: customers minus those missing at least one priority
    val missing = o.select($"o_custkey").distinct()
      .crossJoin(o.select($"o_orderpriority").distinct())
      .join(o.select($"o_custkey", $"o_orderpriority").distinct(),
        Seq("o_custkey", "o_orderpriority"), "left_anti")
      .select($"o_custkey").distinct()
    val expected = o.select($"o_custkey").distinct()
      .join(missing, Seq("o_custkey"), "left_anti")
    val got = div.select($"o_custkey")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    assert(div.count() > 0)
  }

  test("bitmap distinct equals count_distinct exactly") {
    val bm = Advanced.bitmapDistinct(spark, sf0001)
    val exact = Tables.events(spark, sf0001)
      .groupBy($"event_type")
      .agg(count_distinct($"user_id").as("exact"))
    assert(bm.join(exact, "event_type")
      .filter($"n_users" =!= $"exact").count() === 0)
    assert(bm.count() > 0)
  }

  test("triangle stats: exact counts on crafted graphs") {
    // K4 (4 triangles... no: C(4,3)=4), plus a path (0 triangles), plus
    // a single triangle with a pendant edge
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("x", "y")
    val r1 = Graph.triangleStats(k4).head()
    assert(r1.getAs[Long]("n_triangles") === 4L)
    assert(r1.getAs[Long]("n_edges") === 6L)
    assert(r1.getAs[Double]("clustering") === 1.0)
    val path = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L).toDF("x", "y")
    assert(Graph.triangleStats(path).head().getAs[Long]("n_triangles") === 0L)
    val triPendant = Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 4L)
      .toDF("x", "y")
    val r3 = Graph.triangleStats(triPendant).head()
    assert(r3.getAs[Long]("n_triangles") === 1L)
    assert(r3.getAs[Long]("n_wedges") === 5L)
  }

  test("knn triangle census: sane ranges on real embeddings") {
    val t = Graph.knnTriangles(spark, sf0001).head()
    assert(t.getAs[Long]("n_nodes") > 0)
    // every node has >= 3 directed edges; undirected dedup keeps >= 3n/2
    assert(t.getAs[Long]("n_edges") >= t.getAs[Long]("n_nodes") * 3 / 2)
    val c = t.getAs[Double]("clustering")
    assert(c >= 0.0 && c <= 1.0, s"clustering $c")
  }

  test("incremental agg merge equals full recompute") {
    val inc = Advanced.incrementalAgg(spark, sf0001)
    val full = Tables.orders(spark, sf0001)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("seasonal decomposition: no nulls, residual centers near zero") {
    val sd = Advanced.seasonalDecompose(spark, sf0001).cache()
    assert(sd.count() > 0)
    assert(sd.filter($"expected".isNull || $"residual".isNull).count() === 0)
    val vScale = Tables.events(spark, sf0001)
      .agg(stddev_samp($"value")).head().getDouble(0)
    val meanResid = sd.agg(avg($"residual")).head().getDouble(0)
    assert(math.abs(meanResid) < vScale,
      s"residual mean $meanResid vs scale $vScale")
  }

  test("timed funnel state machine equals the three-pass join form") {
    val tf = Advanced.timedFunnel(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("v1"))
    val c = ev.join(v, "user_id")
      .filter($"event_type" === "click" && $"ts" > $"v1" &&
        $"ts" <= $"v1" + expr("INTERVAL 24 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("c1"))
    val p = ev.join(c, "user_id")
      .filter($"event_type" === "purchase" && $"ts" > $"c1" &&
        $"ts" <= $"c1" + expr("INTERVAL 24 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("p1"))
    val threePass = v.join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select($"user_id", unix_micros($"v1").as("v_us"),
        unix_micros($"c1").as("c_us"), unix_micros($"p1").as("p_us"))
    assert(tf.exceptAll(threePass).isEmpty &&
      threePass.exceptAll(tf).isEmpty)
    // the funnel must narrow monotonically
    val n = tf.agg(count(lit(1)), count($"c_us"), count($"p_us")).head()
    assert(n.getLong(0) >= n.getLong(1) && n.getLong(1) >= n.getLong(2))
    assert(n.getLong(0) > 0)
  }

  test("activity streaks: day accounting reconciles, streaks bounded") {
    val st = Advanced.activityStreaks(spark, sf0001).cache()
    val exact = Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").as("day")).distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("n_days"))
    assert(st.join(exact, "user_id")
      .filter($"active_days" =!= $"n_days").count() === 0)
    assert(st.filter($"max_streak" > $"active_days" ||
      $"n_streaks" < 1).count() === 0)
    // streak arithmetic: a user active every single day has ONE streak
    val span = Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").as("day"))
      .groupBy($"user_id")
      .agg(datediff(max($"day"), min($"day")).as("span"))
    val full = st.join(exact, "user_id").join(span, "user_id")
      .filter($"n_days" === $"span" + 1)
    assert(full.filter($"n_streaks" =!= 1).count() === 0)
  }

  test("rolling WAU equals the naive per-day window recount") {
    val wau = Advanced.rollingWau(spark, sf0001)
    val ud = Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").as("day")).distinct().cache()
    val spine = ud.select($"day").distinct()
      .union(ud.select(date_add($"day", 3).as("day"))).distinct()
      .join(ud.select(max($"day").as("mx")).crossJoin(spark.range(1)),
        $"day" <= $"mx").select($"day")
    // naive form: per spine day, rescan activity for the trailing window
    val naive = spine.as("s").join(ud.as("u"),
        $"u.day" <= $"s.day" && $"u.day" >= date_sub($"s.day", 6))
      .groupBy($"s.day".as("day"))
      .agg(count_distinct($"user_id").as("wau"))
    // compare on the days both report (the explode form reports every
    // window day that any activity touches)
    val joined = wau.withColumnRenamed("wau", "w1")
      .join(naive.withColumnRenamed("wau", "w2"), "day")
    assert(joined.filter($"w1" =!= $"w2").count() === 0)
    assert(joined.count() > 0)
  }

  test("running distinct: non-decreasing, final value is the exact count") {
    val rd = Advanced.runningDistinct(spark, sf0001).cache()
    val fin = rd.groupBy($"user_id")
      .agg(max($"running_distinct").as("final"))
    val exact = Tables.events(spark, sf0001)
      .filter($"user_id" % 7 === 0)
      .groupBy($"user_id")
      .agg(count_distinct($"event_type").as("exact"))
    assert(fin.join(exact, "user_id")
      .filter($"final" =!= $"exact").count() === 0)
    assert(rd.filter($"running_distinct" < 1).count() === 0)
  }

  test("repetition signals: crafted stuffed/looped docs flag, prose " +
      "doesn't; corpus invariants hold") {
    // doc 0: one bigram looped — top2_frac near 1, must flag (Gopher
    // 0.18 rule); doc 10: varied prose — must not flag
    val crafted = Seq(
      (0L, Array.fill(30)("buy now").mkString(" ")),
      (10L, "the quick brown fox jumps over a lazy dog near riverbank " +
        "while evening light fades slowly into calm night air"))
      .toDF("doc_id", "text")
    val got = TextQueries.repetitionSignalsDf(crafted)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(5), r.getDouble(6), r.getBoolean(7))).toMap
    val (top0, dup0, flag0) = got(0L)
    assert(flag0 && top0 > 0.4 && dup0 > 0.9, s"stuffed doc: ${got(0L)}")
    val (top10, _, flag10) = got(10L)
    assert(!flag10 && top10 < 0.18, s"prose doc: ${got(10L)}")
    // corpus invariants at sf0.001: fractions in (0,1], distinct ≤ total
    val q = TextQueries.repetitionSignals(spark, sf0001).cache()
    assert(q.count() > 0)
    assert(q.filter($"top2_frac" <= 0 || $"top2_frac" > 1 ||
      $"dup_tok_frac" < 0 || $"dup_tok_frac" >= 1).count() === 0)
    assert(q.filter($"n_distinct" > $"n_tok" ||
      $"max_bg" > $"total_bg").count() === 0)
    q.unpersist()
  }
}
