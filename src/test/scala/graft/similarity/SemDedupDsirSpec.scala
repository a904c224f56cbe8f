package graft.similarity

import graft.SparkTestBase
import graft.operators.TextQueries

/** q256 SemDeDup + q257 DSIR — the two round-7 additions to the
  * training-data-curation family. Pins the semantics the oracle can't
  * see from the testdata alone: assignment tie-breaks, the keep-lowest-id
  * dup rule, the anchor cap's documented one-sided estimator effect
  * (SemDeDup), and content-not-label scoring monotonicity (DSIR). */
class SemDedupDsirSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "emb")

  test("semdedup: assignment, keep-lowest-id dup rule, tie-break") {
    // seeds (vec_id % 97 == 0): 0 → e1, 97 → e2
    val v = vecs(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      97L -> Seq(0.0, 1.0, 0.0, 0.0),
      10L -> Seq(0.9, 0.1, 0.0, 0.0), // cluster 0, cos vs 0 ≈ 0.994
      11L -> Seq(0.2, 0.05, 1.0, 0.0), // cluster 0, all sims < 0.3
      50L -> Seq(0.5, 0.5, 0.0, 0.0), // equidistant → lower cid wins
      100L -> Seq(0.0, 0.95, 0.0, 0.3), // cluster 97, cos vs 97 ≈ 0.954
      101L -> Seq(0.1, 0.25, 0.0, -0.95)) // cluster 97, sims < 0.3
    val out = Similarity.semDedupDf(spark, v)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.toString.toDouble),
          r.getBoolean(3)))).toMap

    assert(out.size === 7)
    // assignment
    assert(out(10L)._1 === 0L && out(11L)._1 === 0L)
    assert(out(100L)._1 === 97L && out(101L)._1 === 97L)
    // exact tie on rounded cosine → lowest centroid id
    assert(out(50L)._1 === 0L)
    // cluster heads (lowest id per cluster) have no lower anchor
    assert(out(0L)._2.isEmpty && !out(0L)._3)
    // dups vs keeps
    assert(out(10L)._3, "near-dup of seed 0 must drop")
    assert(out(100L)._3, "near-dup of seed 97 must drop")
    assert(!out(11L)._3 && !out(101L)._3, "dissimilar members keep")
    // max_sim_lower is the max over LOWER ids only
    assert(out(10L)._2.exists(_ >= 0.99))
  }

  test("semdedup: anchor cap is one-sided — a dup detectable only " +
      "via a beyond-cap anchor is kept, never the reverse") {
    // single seed (id 0) → one cluster; ids 1,2 are noise anchors,
    // id 3/4 a planted near-dup pair ranked beyond cap 3
    val v = vecs(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      1L -> Seq(0.1, 0.0, 0.0, 1.0),
      2L -> Seq(0.1, 0.0, -1.0, 0.1),
      3L -> Seq(0.1, 0.0, 1.0, 0.0),
      4L -> Seq(0.1, 0.0, 0.99, 0.05))
    val full = Similarity.semDedupDf(spark, v)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(full(4L), "uncapped: 4 is a near-dup of anchor 3")
    val capped = Similarity.semDedupDf(spark, v, anchorCap = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!capped(4L), "cap 3 excludes anchor 3 → 4 must be kept")
    // the cap never CREATES a dup
    assert(capped.count(_._2) <= full.count(_._2))
  }

  test("semdedup on testdata: total rows preserved, heads never dup") {
    val out = Similarity.semDedup(spark, sf0001).cache()
    val n = graft.operators.Tables.embeddings(spark, sf0001).count()
    assert(out.count() === n)
    // null max_sim_lower ⟺ is_dup false (a head cannot drop)
    assert(out.filter(col("max_sim_lower").isNull &&
      col("is_dup")).count() === 0)
    out.unpersist()
  }

  test("dsir: scoring is content-based (a target-like doc in a " +
      "non-target language scores identically) and separates target " +
      "from raw") {
    // 50-token docs: with add-one smoothing over 256 buckets a
    // hapax-scale corpus can't push any λ positive — the signal must
    // dominate the smoothing mass for the target_like assertions to
    // probe the real regime
    val alpha = Seq.fill(50)("alpha").mkString(" ")
    val beta = Seq.fill(50)("beta").mkString(" ")
    val docs = (
      (0L until 6L).map(i => (i, alpha, "en")) ++
      (10L until 16L).map(i => (i, beta, "fr")) :+
      ((100L, alpha, "fr")))
      .toDF("doc_id", "text", "lang")
    val out = TextQueries.dsirWeightsDf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out.size === 13)
    assert(out.values.forall(_._1 === 50L))
    // same content ⇒ same weight, regardless of the lang label
    assert(out(100L)._2 === out(0L)._2)
    assert(out(100L)._3, "alpha content is target-like even in fr")
    // target tokens score above raw-only tokens
    assert(out(0L)._2 > out(10L)._2)
    assert(out(0L)._3 && !out(10L)._3)
  }

  test("dsir train-then-apply: frozen-λ scoring matches the batch " +
      "trainer within rounding, batch and streaming") {
    val train = graft.operators.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val lam = TextQueries.dsirLambda(train)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(lam.size <= 256 && lam.nonEmpty)
    val batchScores = TextQueries.dsirWeightsDf(train)
      .select(col("doc_id"), col("n_tok"), col("log_weight"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val applied = TextQueries.dsirApplyDf(train, lam)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(applied.keySet === batchScores.keySet)
    applied.foreach { case (id, (n, w)) =>
      assert(n === batchScores(id)._1)
      // token-order vs per-feature-grouped accumulation: IEEE
      // reordering noise only
      assert(math.abs(w - batchScores(id)._2) <= 1e-3,
        s"doc $id: apply $w vs batch ${batchScores(id)._2}")
    }

    // the same call scores a stream, no state store
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDS().toDF("doc_id", "text")
    val q = TextQueries.dsirApplyDf(docs, lam)
      .writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      val batch = Seq((1L, "alpha beta gamma"), (2L, "   "),
        (3L, "alpha alpha"))
      input.addData(batch)
      q.processAllAvailable()
      val streamed = spark.table("dsir_stream")
        .as[(Long, Long, Double, Boolean)].collect().sorted.toVector
      val expected = TextQueries.dsirApplyDf(
        batch.toDF("doc_id", "text"), lam)
        .as[(Long, Long, Double, Boolean)].collect().sorted.toVector
      assert(streamed.nonEmpty && streamed === expected)
      // tokenless doc 2 is excluded on both paths
      assert(!streamed.exists(_._1 == 2L))
    } finally q.stop()
  }

  test("dsir on testdata: en mean log-weight exceeds non-en mean") {
    val out = TextQueries.dsirWeights(spark, sf0001).cache()
    val Array(enAvg, otherAvg) = out
      .withColumn("is_en", col("lang") === "en")
      .groupBy(col("is_en"))
      .agg(avg(col("log_weight")).as("m"))
      .orderBy(col("is_en").desc)
      .collect().map(_.getDouble(1))
    assert(enAvg > otherAvg,
      s"DSIR must separate target from raw: en $enAvg vs $otherAvg")
    out.unpersist()
  }

  test("semdedup: the seed cap keeps the LOWEST-id seeds and every " +
      "vector still assigns — corpus-proportional seed growth is bounded") {
    // 1100 seed-eligible vectors (ids 0, 97, 194, …): uncapped there
    // would be 1100 clusters; the cap keeps exactly the 1024 lowest ids
    val n = 1100
    val v = (0 until n).map { i =>
      val a = i * 2.0 * math.Pi / n
      (97L * i, Seq(math.cos(a), math.sin(a)))
    }.toDF("vec_id", "emb")
    val out = Similarity.semDedupDf(spark, v).cache()
    assert(out.count() === n.toLong, "every vector assigns")
    val maxCid = out.agg(max(col("cluster_id"))).head().getLong(0)
    assert(maxCid <= 97L * 1023,
      s"cluster ids must come from the 1024 lowest seeds, got $maxCid")
    // with the Lloyd refinement, centroids MOVE off their seeds where
    // clusters absorb the beyond-cap tail, so seed self-assignment is
    // no longer an invariant at the boundary clusters; what must hold:
    // the id space of clusters is the capped seed set, and refinement
    // can only MERGE clusters (each survivor keeps ≥ 1 member) — on
    // this evenly-spread circle nearly all 1024 survive
    val nClusters = out.select(col("cluster_id")).distinct().count()
    assert(nClusters >= 1000L && nClusters <= 1024L,
      s"expected nearly all capped seeds to survive refinement, " +
        s"got $nClusters")
    out.unpersist()
  }

  test("semdedup: identical seeds refine to identical centroids and " +
      "the assignment tie-break still picks the LOWEST cluster id") {
    // seeds 0 and 97 are the same direction → every vector ties on the
    // rounded cosine between their clusters at assignment; cluster 97
    // therefore receives no members in the refinement pass and drops,
    // and every final assignment lands on cluster 0
    val v = vecs(
      0L -> Seq(1.0, 0.0, 0.0, 0.0),
      97L -> Seq(1.0, 0.0, 0.0, 0.0),
      5L -> Seq(0.8, 0.6, 0.0, 0.0),
      6L -> Seq(0.0, 0.0, 1.0, 0.0))
    val out = Similarity.semDedupDf(spark, v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet === Set(0L))
  }
}
