package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.similarity.Similarity

/** q264 embedding outliers, q265 per-source unigram KL — pins the
  * semantics the testdata oracle can't isolate: centroid geometry and
  * the rank-free low/mid/high rule (q264), hand-computed KL values, the
  * KL ≥ 0 law, and exact count reconciliation (q265). */
class OutlierSourceKlSpec extends SparkTestBase {
  import spark.implicits._

  // -------------------------------------------------------- q264

  test("embedding outliers: the off-axis vector flags low, the cohesive " +
      "mass doesn't; tercile counts follow the integer rule") {
    // 6 vectors on label 0: five near e1 with tiny distinct nudges
    // (distinct sims), one orthogonal (e2) — the semantic outlier
    val e = (0 until 5).map { i =>
      (i.toLong, 0, Seq(1.0, 0.001 * i, 0.0, 0.0))
    } :+ (9L, 0, Seq(0.0, 1.0, 0.0, 0.0))
    val out = Similarity.embeddingOutliersDf(
        e.toDF("vec_id", "label", "emb"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(out.size === 6)
    // the orthogonal vector has the lowest sim and lands in 'low'
    assert(out(9L)._2 === "low" && out(9L)._3)
    assert(out(9L)._1 < out.filterKeys(_ != 9L).values.map(_._1).min)
    // 6 distinct sims → exactly 2 low / 2 mid / 2 high (cum*3<=n rule)
    val buckets = out.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(buckets === Map("low" -> 2, "mid" -> 2, "high" -> 2))
    // outlier ⟺ bucket == low, everywhere
    out.values.foreach { case (_, b, o) => assert(o === (b == "low")) }
  }

  test("embedding outliers: labels are scored independently — a vector " +
      "atypical for its OWN class flags even if common globally") {
    // label 0 clusters on e1; label 1 clusters on e2 plus one e1-aligned
    // defector: globally e1 is the majority direction, but within label
    // 1 the defector is the outlier
    val l0 = (0 until 6).map(i =>
      (i.toLong, 0, Seq(1.0, 0.001 * i, 0.0, 0.0)))
    val l1 = (10 until 16).map(i =>
      (i.toLong, 1, Seq(0.001 * (i - 10), 1.0, 0.0, 0.0))) :+
      (99L, 1, Seq(1.0, 0.0, 0.0, 0.0))
    val out = Similarity.embeddingOutliersDf(
        (l0 ++ l1).toDF("vec_id", "label", "emb"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(99L), "the cross-class defector must flag in its own class")
    // the cohesive core of label 0 is not poisoned by label 1's mass
    assert(!out(2L) || !out(3L))
  }

  test("embedding outliers on testdata: every vector bucketed, " +
      "per-label terciles near-balanced, outlier ⟺ low") {
    val out = Similarity.embeddingOutliers(spark, sf0001).cache()
    val n = Tables.embeddings(spark, sf0001).count()
    assert(out.count() === n)
    val rows = out.collect().map(r =>
      (r.getInt(1), r.getString(3), r.getBoolean(4)))
    rows.foreach { case (_, b, o) => assert(o === (b == "low")) }
    rows.groupBy(_._1).foreach { case (l, rs) =>
      val c = rs.groupBy(_._2).view.mapValues(_.size).toMap
      val m = rs.size / 3
      Seq("low", "mid", "high").foreach { b =>
        assert(math.abs(c.getOrElse(b, 0) - m) <= 2, s"label $l: $c")
      }
    }
    out.unpersist()
  }

  // -------------------------------------------------------- q265

  test("source KL: uniform sources score 0; a skewed source scores the " +
      "hand-computed divergence") {
    val d = Seq(
      ("a", "x x x y"), // p_a = (3/4, 1/4)
      ("b", "y"))       // p_b = (0, 1) over {x, y}; corpus x:3 y:2
      .toDF("source", "text")
    val out = TextQueries.sourceKlDf(d)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a")._1 === 4L && out("a")._2 === 2L)
    assert(out("b")._1 === 1L && out("b")._2 === 1L)
    def lg2(x: Double) = math.log(x) / math.log(2)
    // KL(a) = 3/4·log2((3/4)/(3/5)) + 1/4·log2((1/4)/(2/5))
    val klA = 0.75 * lg2(0.75 / 0.6) + 0.25 * lg2(0.25 / 0.4)
    // KL(b) = 1·log2(1/(2/5))
    val klB = lg2(1.0 / 0.4)
    assert(math.abs(out("a")._3 - klA) < 1e-3, s"${out("a")._3} vs $klA")
    assert(math.abs(out("b")._3 - klB) < 1e-3, s"${out("b")._3} vs $klB")
    // and a source that IS the corpus distribution scores exactly 0
    val same = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    TextQueries.sourceKlDf(same).collect()
      .foreach(r => assert(r.getDouble(3) === 0.0))
  }

  // -------------------------------------------------------- q266

  test("mixture planner: hand-computed α=0.3 shares and epochs; the " +
      "low-resource slice flags past 4 epochs") {
    // lang a: 16 tokens, lang b: 1 token; budget = 4·17 = 68
    val d = Seq(
      ("a", (1 to 16).map(i => s"t$i").mkString(" ")),
      ("b", "solo")).toDF("lang", "text")
    val out = Advanced.mixturePlannerDf(d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(4), r.getBoolean(5))))
      .toMap
    val sp = math.pow(16, 0.3) + 1.0
    val shA = math.round(math.pow(16, 0.3) / sp * 1e4) / 1e4
    val shB = math.round(1.0 / sp * 1e4) / 1e4
    assert(out("a")._1 === 16L && out("b")._1 === 1L)
    assert(out("a")._2 === shA && out("b")._2 === shB)
    assert(math.abs(out("a")._3 - shA * 68 / 16) < 1e-3)
    assert(math.abs(out("b")._3 - shB * 68) < 1e-3)
    // b is pushed to ~20 epochs by the smoothing — flagged; a is not
    assert(out("b")._4 && !out("a")._4)
  }

  test("mixture planner on testdata: shares sum to 1, targets sum to " +
      "the budget, epochs decrease with slice size (α < 1 up-weights)") {
    val rows = Advanced.mixturePlanner(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.length >= 2)
    val totTok = rows.map(_._2).sum
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._4).sum - 4.0 * totTok) < 4.0 * totTok * 1e-3)
    // epochs_l ∝ n_l^(α−1) is strictly decreasing in n_l
    rows.sortBy(_._2).sliding(2).foreach {
      case Array(small, large) =>
        assert(small._5 >= large._5, s"$small vs $large")
      case _ =>
    }
  }

  // ------------------------------------------- rebalance train/apply

  test("frozen-rate rebalance: apply equals the in-query batch form, " +
      "streams without state, fails closed on unbudgeted languages") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"))
    val rates = Advanced.mixtureRates(docs)
    assert(rates.nonEmpty && rates.values.min > 0.0)
    val batch = Advanced.mixtureRebalance(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val applied = Advanced.rebalanceApplyDf(docs, rates)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(applied === batch, "frozen-rate apply must select the same rows")
    // unbudgeted language keeps nothing
    val stray = Seq((999999L, "xx")).toDF("doc_id", "lang")
    assert(Advanced.rebalanceApplyDf(stray, rates).count() === 0L)

    // the same call rebalances a stream, no state store
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val q = Advanced.rebalanceApplyDf(
        input.toDS().toDF("doc_id", "lang"), rates)
      .writeStream.format("memory").queryName("rebalance_stream")
      .outputMode("append").start()
    try {
      val feed = docs.limit(200)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      input.addData(feed)
      q.processAllAvailable()
      val streamed = spark.table("rebalance_stream")
        .as[(Long, String)].collect().toSet
      val expected = Advanced.rebalanceApplyDf(
          feed.toDF("doc_id", "lang"), rates)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === expected && streamed.subsetOf(batch))
    } finally q.stop()
  }

  // -------------------------------------------------------- q271

  test("minhash calibration: every panel pair inside the binomial " +
      "bound; identical docs estimate exactly 1") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "completely different words in this entire document body"),
      (4L, "the quick brown fox jumps over a sleepy dog again"))
      .toDF("doc_id", "text")
    val out = Dedup.minhashCalibrationDf(d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getBoolean(3)))).toMap
    assert(out.size === 6)
    // identical docs: J = 1 and the signature agrees on all 64 perms
    assert(out((1L, 2L))._1 === 1.0 && out((1L, 2L))._2)
    // disjoint docs: J = 0
    assert(out((1L, 3L))._1 === 0.0)
    out.values.foreach { case (_, ok) => assert(ok) }
  }

  test("minhash calibration on testdata: fixed panel, all pairs " +
      "within bound, exact arm symmetric in the panel size") {
    val rows = Dedup.minhashCalibration(spark, sf0001).collect()
    val nDocs = Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 100)
      .filter(expr("size(filter(split(lower(text), ' '), x -> x != ''))") >= 3)
      .count()
    assert(rows.length === (nDocs * (nDocs - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"pair ${r.getLong(0)}-${r.getLong(1)} " +
        s"outside the 6-sigma bound at J=${r.getDouble(2)}")
    }
  }

  // -------------------------------------------------------- q268

  private def bucket(tok: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(2)

  test("hashed drift: frozen-model apply matches the in-query batch " +
      "form on testdata; KL ≥ 0 under the smoothed reference") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("source"), col("text"))
    val batch = TextQueries.hashedDriftDf(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(batch.nonEmpty)
    batch.values.foreach { case (_, kl) => assert(kl >= -0.0001) }
    val ref = TextQueries.driftReference(docs)
    assert(ref.size <= 256 && ref.keys.forall(_.length == 2))
    val applied = TextQueries.driftApplyDf(docs, ref)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(applied.keySet === batch.keySet)
    applied.foreach { case (s, (n, kl)) =>
      assert(n === batch(s)._1, s"source $s token count")
      assert(math.abs(kl - batch(s)._2) <= 1e-3,
        s"source $s: apply $kl vs batch ${batch(s)._2}")
    }
  }

  test("streaming drift: cumulative keyed state scores like the batch " +
      "of everything seen; a skewed source reads higher than a " +
      "reference-like one") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDrift
    // reference corpus: a/b/c-heavy mix
    val refDocs = Seq.fill(8)(("r", "aa bb cc dd")).toDF("source", "text")
    val ref = TextQueries.driftReference(refDocs)
    val input = MemoryStream[(String, String)](spark)
    val rows = input.toDS()
    val q = StreamingDrift.drift(rows, ref)
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode("update").start()
    try {
      def toks(s: String, t: String) =
        t.split(" ").filter(_.nonEmpty).map(w => (s, bucket(w))).toSeq
      // trigger 1: src1 looks like the reference; src2 is skewed
      input.addData(toks("src1", "aa bb cc dd") ++
        toks("src2", "zz zz zz zz"))
      q.processAllAvailable()
      // trigger 2: more of the same — state must ACCUMULATE
      input.addData(toks("src1", "aa bb cc dd") ++
        toks("src2", "zz zz yy yy"))
      q.processAllAvailable()
      val fin = spark.table("drift_stream")
        .as[(String, Long, Double)].collect()
        .groupBy(_._1).map { case (s, rs) => s -> rs.maxBy(_._2) }
      assert(fin("src1")._2 === 8L && fin("src2")._2 === 8L)
      // stream state after both triggers == driver-side batch recompute
      val c1 = toks("src1", "aa bb cc dd aa bb cc dd")
        .groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val c2 = toks("src2", "zz zz zz zz zz zz yy yy")
        .groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(fin("src1")._3 === StreamingDrift.klBits(c1, ref))
      assert(fin("src2")._3 === StreamingDrift.klBits(c2, ref))
      // and the skewed source is the drifted one
      assert(fin("src2")._3 > fin("src1")._3 + 1.0)
    } finally q.stop()
  }

  test("source KL on testdata: every source present, KL ≥ 0, token " +
      "mass reconciles with the corpus") {
    val out = TextQueries.sourceKl(spark, sf0001).cache()
    val srcs = Tables.documents(spark, sf0001)
      .select(col("source")).distinct().count()
    assert(out.count() === srcs)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(3)))
    // Gibbs' inequality, up to the 4-dp rounding
    rows.foreach { case (s, _, kl) => assert(kl >= -0.0001, s"$s: $kl") }
    val totTok = Tables.documents(spark, sf0001)
      .select(expr("size(filter(split(lower(text), ' '), x -> x != ''))")
        .cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(rows.map(_._2).sum === totTok)
    out.unpersist()
  }
}
