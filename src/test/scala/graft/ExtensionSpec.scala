package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextAnalysis
import graft.multimodal.Multimodal
import graft.operators.{Tables, TextQueries}
import graft.similarity.Similarity

/** Specs for the LLM-pipeline extension operators (dedup, similarity,
  * text analysis, multimodal). Oracle hash-matching runs via the driver;
  * these assert structural/semantic invariants the oracle can't. */
class ExtensionSpec extends SparkTestBase {
  import spark.implicits._

  private val d = sf0001

  // ------------------------------------------------------------------ text

  test("token count equals manual whitespace split") {
    val row = Tables.documents(spark, d)
      .select(col("text"), TextAnalysis.tokenCount(col("text")).as("n"))
      .head()
    val expected = row.getString(0).split(" ").count(_.nonEmpty)
    assert(row.getInt(1) === expected)
  }

  test("fingerprint matches a reference Scala implementation") {
    val rows = Tables.documents(spark, d)
      .select(col("text"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .limit(20).collect()
    rows.foreach { r =>
      val expected = r.getString(0).foldLeft(0L)((h, c) =>
        (h * 31 + c.toInt) % TextAnalysis.FingerprintMod)
      assert(r.getLong(1) === expected)
    }
  }

  test("fingerprint is order-sensitive (anagrams differ)") {
    val fps = Seq("a b", "b a").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")))
      .collect().map(_.getLong(0))
    assert(fps(0) !== fps(1))
  }

  test("langid returns a value from the closed set") {
    val preds = TextQueries.langIdConfusion(spark, d)
      .select(col("pred_lang")).distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "es", "de", "fr", "zh", "unknown")))
  }

  test("quality score is within [0, 1]") {
    val bad = TextQueries.textStats(spark, d)
      .filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad === 0)
  }

  // ----------------------------------------------------------------- dedup

  test("exact stats: distinct <= total per source") {
    val bad = Dedup.exactStats(spark, d)
      .filter(col("n_distinct") > col("n_docs")).count()
    assert(bad === 0)
  }

  test("minhash candidates contain every high-jaccard exact pair (recall)") {
    // ground truth on the % 4 sample at threshold .8 (well above the LSH
    // s-curve midpoint, so recall should be ~1) — same shingle space as the
    // signature
    val exact = Dedup.shingleJaccardPairs(spark, d, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashDupPairs(spark, d, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall; missed ${exact -- lsh}")
  }

  test("minhash pairs are all >= threshold and exact-verified") {
    val bad = Dedup.minhashDupPairs(spark, d, threshold = 0.6)
      .filter(col("jaccard") < 0.6).count()
    assert(bad === 0)
  }

  test("mega-bucket boilerplate collapses via star pairing, not dropped") {
    // 80 identical docs (one band bucket of 80 > MaxBucket=64) + 2 distinct
    val boiler = (0L until 80L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val others = Seq(
      (100L, "completely different content about spark joins and shuffles here"),
      (101L, "yet another unrelated document that talks about parquet files"))
    val docs = (boiler ++ others).toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairsDf(docs, threshold = 0.9)
    // star pairing keeps the component connected: all 80 collapse to one
    val groups = Dedup.assignCanonical(pairs)
    assert(groups.filter(col("canonical_id") === 0L).count() === 80)
    // distinct docs don't get pulled in
    assert(groups.filter(col("doc_id") >= 100L).count() === 0)
  }

  test("HLL++ sketch is within 5% of the exact distinct count") {
    val r = graft.operators.Relational.approxDistinctSketch(spark, d).head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("dedup-apply: canonical assignment is transitive and minimal") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.assignCanonical(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("dedup-apply on documents: kept + dropped == total, dropped matches groups") {
    val res = Dedup.dedupApply(spark, d).cache()
    assert(res.filter(col("n_kept") + col("n_dropped") =!= col("n_docs"))
      .count() === 0)
    val dropped = res.agg(sum(col("n_dropped"))).head().getLong(0)
    // every dropped doc corresponds to a non-canonical member of some group
    val pairs = Dedup.minhashDupPairs(spark, d)
    val grouped = Dedup.assignCanonical(pairs)
      .filter(col("doc_id") =!= col("canonical_id")).count()
    assert(dropped === grouped)
  }

  test("simhash: identical token sets get identical signatures") {
    val sigs = Seq("spark fast join", "join spark fast spark")
      .toDF("text").select(Dedup.simhash(col("text")))
      .collect().map(_.getLong(0))
    assert(sigs(0) === sigs(1))
  }

  test("scalable simhashDf agrees with the per-row reference simhash") {
    val docs = Tables.documents(spark, d).limit(50)
    val ref = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    val fast = Dedup.simhashDf(docs.select(col("doc_id"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("toks")))
      .as[(Long, Long)].collect().toMap
    assert(fast === ref)
  }

  test("simhash: near-identical texts are within small hamming distance") {
    val sigs = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "the quick brown fox jumps over the lazy dog again and again now")
      .toDF("text").select(Dedup.simhash(col("text")))
      .collect().map(_.getLong(0))
    val hamming = java.lang.Long.bitCount(sigs(0) ^ sigs(1))
    assert(hamming <= 16, s"hamming=$hamming")
  }

  // ------------------------------------------------------------ similarity

  test("brute-force topk: k neighbors per query, ranks 1..k, sim in [-1,1]") {
    val t = Similarity.bruteForceTopK(spark, d).cache()
    val perQuery = t.groupBy(col("query_id")).count()
      .select(max(col("count"))).head().getLong(0)
    assert(perQuery === 5)
    assert(t.filter(col("sim") < -1 || col("sim") > 1).count() === 0)
    assert(t.filter(col("rk") < 1 || col("rk") > 5).count() === 0)
  }

  test("IVF topk recall vs brute force is useful (> 0.5) and self-consistent") {
    // measured: 1.0 at sf0.01, ~0.65 at sf0.1 with kmeans centroids +
    // nprobe=6 over ~21 buckets (random vectors — a uniform-bucket baseline
    // would sit at nprobe/ncentroids ≈ 0.29)
    val bf = Similarity.bruteForceTopK(spark, d)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(spark, d)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall > 0.5, s"IVF recall $recall")
  }

  test("SQ8 topk: high recall vs brute force, bounded quantization error") {
    val bf = Similarity.bruteForceTopK(spark, d).cache()
    val sq = Similarity.sq8TopK(spark, d).cache()
    assert(sq.groupBy(col("query_id")).count()
      .select(max(col("count"))).head().getLong(0) === 5)
    // 8-bit scalar quantization barely moves a 64-dim dot product:
    // recall@5 should be near-perfect
    val bfSet = bf.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val sqSet = sq.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (bfSet & sqSet).size.toDouble / bfSet.size
    assert(recall >= 0.8, s"SQ8 recall $recall")
    // per-dim reconstruction error is at most half a quantization step,
    // so the dot-product error is bounded by sum(|q_i|) * step/2
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    val dim = vecs.head._2.length
    val mns = (0 until dim).map(i => vecs.values.map(_(i)).min)
    val mxs = (0 until dim).map(i => vecs.values.map(_(i)).max)
    sq.as[(Long, Long, Double, Int)].collect().foreach {
      case (q, nb, sim, _) =>
        val exact = vecs(q).zip(vecs(nb)).map { case (a, b) => a * b }.sum
        val bound = (0 until dim).map(i =>
          math.abs(vecs(q)(i)) * (mxs(i) - mns(i)) / 512).sum + 1e-6
        assert(math.abs(sim - exact) <= bound,
          s"query $q nb $nb: |$sim - $exact| > $bound")
    }
    bf.unpersist(); sq.unpersist()
  }

  test("RP-LSH near-dup: recovers planted duplicates with high recall") {
    val found = Similarity.rpLshNearDup(spark, d)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val nVecs = Tables.embeddings(spark, d).count()
    // every planted pair is (id, id + 1e6) with cosine ≈ 0.999; 4 bands ×
    // 8 bits at that similarity ⇒ per-pair detection ~0.9998
    val planted = (0L until nVecs).map(i => (i, i + 1000000L)).toSet
    val recall = (planted & found).size.toDouble / planted.size
    assert(recall >= 0.95, s"planted recall $recall")
    // verification step: everything reported really is above threshold
    assert(Similarity.rpLshNearDup(spark, d)
      .filter(col("sim") < 0.9).count() === 0)
  }

  test("IVF+PQ residual recall vs brute force beats the probe baseline") {
    val bf = Similarity.bruteForceTopK(spark, d)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(spark, d)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfpq.nonEmpty)
    val recall = (bf & ivfpq).size.toDouble / bf.size
    // probing nprobe of ~ncentroids buckets bounds recall near
    // nprobe/ncentroids for a random index; the learned one must beat it
    assert(recall > 0.5, s"IVF+PQ recall $recall")
    val t = Similarity.ivfPqTopK(spark, d)
    assert(t.filter(col("rk") < 1 || col("rk") > 5).count() === 0)
    assert(t.filter(col("sim") < -1 || col("sim") > 1).count() === 0)
  }

  test("OPQ permutation is a valid variance-balanced permutation; recall useful") {
    val d = sf0001
    val opq = Similarity.opqTopK(spark, d)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(spark, d)
      .select($"query_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & opq).size.toDouble / bf.size
    assert(recall > 0.5, s"OPQ recall $recall")
    // the cached permutation really is a permutation of 0..63
    val perm = spark.read.parquet(
      spark.conf.get("spark.sql.warehouse.dir") +
        s"/graft_opq_perm${graft.operators.WarehouseCache.dirSuffix(d)}")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).sortBy(_._1).map(_._2)
    assert(perm.sorted.toSeq === (0 until 64))
    // variance balance: max subspace variance-load / min load must be
    // tighter than (or equal to) the identity split's ratio
    val v = Tables.embeddings(spark, d)
      .select(expr("transform(embedding, x -> cast(x as double))").as("emb"))
    val row = v.agg(
      graft.functions.AggregateKernels.vectorSum($"emb").as("s1"),
      graft.functions.AggregateKernels.vectorSum(
        expr("transform(emb, x -> x * x)")).as("s2"),
      count(lit(1)).as("n")).head()
    val s1 = row.getSeq[Double](0).toArray
    val s2 = row.getSeq[Double](1).toArray
    val n = row.getLong(2).toDouble
    val vars = s1.indices.map(i => s2(i) / n - math.pow(s1(i) / n, 2))
    def loadRatio(order: Seq[Int]): Double = {
      val loads = order.grouped(8).map(_.map(vars).sum).toSeq
      loads.max / loads.min
    }
    assert(loadRatio(perm.toSeq) <= loadRatio(0 until 64) + 1e-12,
      s"perm ratio ${loadRatio(perm.toSeq)} vs identity ${loadRatio(0 until 64)}")
  }

  test("PQ topk recall vs brute force is useful (> 0.5), ranks consistent") {
    val bf = Similarity.bruteForceTopK(spark, d)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(spark, d)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(pq.nonEmpty)
    val recall = (bf & pq).size.toDouble / bf.size
    assert(recall > 0.5, s"PQ recall $recall")
    val t = Similarity.pqTopK(spark, d)
    assert(t.filter(col("rk") < 1 || col("rk") > 5).count() === 0)
  }

  // ------------------------------------------------------------ multimodal

  test("asset metadata: checksum is a valid md5, n_bytes matches text") {
    val m = Multimodal.metadata(spark, d).cache()
    assert(m.filter(length(col("checksum")) =!= 32).count() === 0)
    val doc = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val joined = m.join(doc, m("asset_id") === doc("doc_id"))
      .filter(octet_length(col("text")) =!= col("n_bytes"))
    assert(joined.count() === 0)
  }

  test("binaryFile ingestion yields opaque media rows with correct sizes") {
    val dir = java.nio.file.Files.createTempDirectory("assets")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.bin"), Array.fill[Byte](100)(7))
    java.nio.file.Files.writeString(dir.resolve("skip.txt"), "not media")
    val a = Multimodal.assetsFromDir(spark, dir.toString, "*.bin").cache()
    assert(a.count() === 2)
    assert(a.filter(octet_length(col("media")) =!= col("n_bytes")).count() === 0)
    assert(a.select(sum(col("n_bytes"))).head().getLong(0) === 103)
  }

  test("feature extraction runs partition-local and is deterministic") {
    val f1 = Multimodal.extractFeatures(spark, d).collect()
      .map(a => a.asset_id -> a.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, d).collect()
      .map(a => a.asset_id -> a.feature.toSeq).toMap
    assert(f1 === f2)
    assert(f1.values.head.length === Multimodal.StubCodec.FeatureDim)
  }

  test("frame sampling strides frames and checksums each slice") {
    val f = Multimodal.sampleFrames(spark, d).cache()
    assert(f.filter(col("byte_offset") =!= col("frame_idx") * 64).count() === 0)
    assert(f.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    // every asset contributes at least frame 0
    val nAssets = Tables.documents(spark, d).count()
    assert(f.filter(col("frame_idx") === 0).count() === nAssets)
  }

  test("prefix-filtered similarity join equals the all-pairs join exactly") {
    val d = sf0001
    val pf = Dedup.prefixFilterJaccardPairs(spark, d)
    val bf = Dedup.ngramJaccardPairs(spark, d, threshold = 0.6)
    assert(pf.exceptAll(bf).isEmpty && bf.exceptAll(pf).isEmpty)
    assert(pf.count() > 0)
  }
}
