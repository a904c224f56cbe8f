package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.similarity.Similarity

/** q273 snapshot dedup, q274 filter ablation, q275 embedding health —
  * pins the semantics testdata can't isolate: the three-way arrival
  * classification (including the dup_in_batch class, vacuous on
  * testdata), exact mask attribution per rule, mask-census/funnel
  * consistency, and hand-computed per-dimension statistics. */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  // -------------------------------------------------------- q273

  test("snapshot dedup: arriving docs classify three ways and reordered/" +
      "repeated-token copies count as dups") {
    // batch = doc_id % 5 == 4; registry = the rest
    val docs = Seq(
      (1L, "en", "c b a a"),          // registry keeper of canon {a b c}
      (2L, "en", "m n o"),            // registry, never matched
      (4L, "en", "a b c"),            // batch: canon dup of registry doc 1
      (9L, "en", "x y z"),            // batch: first occurrence anywhere
      (14L, "en", "z y x x"),         // batch: canon dup of batch doc 9
      (19L, "de", "unique tokens here entirely") // batch: new
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.snapshotDedupDf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(4L, 9L, 14L, 19L),
      "exactly the arriving batch is classified")
    assert(out(4L) === (("dup_of_existing", 1L)))
    assert(out(9L) === (("new", 9L)))
    assert(out(14L) === (("dup_in_batch", 9L)))
    assert(out(19L) === (("new", 19L)))
  }

  test("snapshot dedup: registry match wins over a batch keeper, and the " +
      "registry keeper is the MIN existing id") {
    val docs = Seq(
      (3L, "en", "p q"), (8L, "en", "q p"),   // two registry copies: min 3
      (4L, "en", "p p q"), (9L, "en", "q q p") // both batch docs defer to 3
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.snapshotDedupDf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(out(4L) === (("dup_of_existing", 3L)))
    assert(out(9L) === (("dup_of_existing", 3L)))
  }

  test("snapshot dedup on testdata: statuses partition the batch and " +
      "every keep_id is a real keeper") {
    val out = Dedup.snapshotDedup(spark, sf0001).cache()
    val batchN = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 5 === 4).count()
    assert(out.count() === batchN)
    // a 'new' doc keeps itself; a registry dup's keeper lives in the
    // registry (any id — the min EXISTING copy may postdate the batch
    // doc); a batch dup's keeper is an earlier batch doc
    assert(out.filter(col("status") === "new")
      .filter(col("keep_id") =!= col("doc_id")).count() === 0)
    assert(out.filter(col("status") === "dup_of_existing")
      .filter(col("keep_id") % 5 === 4).count() === 0)
    assert(out.filter(col("status") === "dup_in_batch")
      .filter(col("keep_id") % 5 =!= 4 ||
        col("keep_id") >= col("doc_id")).count() === 0)
  }

  // -------------------------------------------------------- q278

  test("snapshot near-dup: a near-identical arriving doc matches its " +
      "existing neighbour, sub-threshold overlap reports but doesn't " +
      "flag, ties break on the lower existing id") {
    val common = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    // n = 4 docs → modulus 20 → panel = ids ≡ 4 (mod 20)
    val docs = Seq(
      (1L, common),                               // existing neighbour
      (2L, "completely different tokens about spark and shuffles " +
        "and partitions and codegen everywhere"),
      (4L, common.replace("tonight", "today")),   // panel: near-dup of 1
      (24L, "the quick brown fox but then nothing else matches at all " +
        "beyond this point truly")                // panel: weak overlap
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("snapneardup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.snapshotNeardup(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getDouble(3),
          r.getBoolean(4)))).toMap
    assert(out.keySet === Set(4L, 24L))
    val (hit4, id4, jac4, rec4) = out(4L)
    assert(hit4 && id4 === 1L && jac4 >= 0.6, s"got $jac4 vs doc $id4")
    assert(rec4, "the near-identical pair must survive the LSH probe")
    val (hit24, id24, jac24, _) = out(24L)
    assert(!hit24 && id24 === 1L && jac24 > 0.0 && jac24 < 0.6,
      s"weak overlap must report its best match unflagged, got $jac24/$id24")
  }

  test("snapshot near-dup on testdata: panel size matches the modulus, " +
      "flag ⟺ jaccard threshold, recall bound holds") {
    val n = Tables.documents(spark, sf0001).count()
    val m = math.max(20L, (n + 99L) / 100L)
    val eligible = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % m === 4).count()
    val rows = Dedup.snapshotNeardup(spark, sf0001).collect()
    assert(rows.length.toLong === eligible)
    rows.foreach { r =>
      assert(r.getBoolean(1) === (r.getDouble(3) >= 0.6))
      assert(r.getBoolean(4), "recall bound must hold on testdata")
    }
  }

  // -------------------------------------------------------- q274

  test("filter ablation: each rule attributes independently — " +
      "repetition-only, dupfrac-only, short-only, clean, and empty") {
    // de Bruijn-style 17-token sequence over {a,b,c,d}: 16 DISTINCT
    // bigrams (max_bg = 1 → repetition false) but 13/17 duplicate
    // tokens (dupfrac-only)
    val deBruijn = "a a b a c a d b b c b d c c d d a"
    // 22 distinct tokens + "x y" repeated 10× : max_bg 10 of 41 bigrams
    // (1000 > 738 → repetition) while dup frac 18/42 stays under 0.7
    val stuffed = (1 to 22).map(i => s"t$i").mkString(" ") +
      " " + Seq.fill(10)("x y").mkString(" ")
    val docs = Seq(
      (1L, "en", stuffed),
      (2L, "en", deBruijn),
      // 8 distinct tokens: short, but 7 distinct bigrams keep the
      // repetition rule quiet (max_bg·100 = 100 ≤ total_bg·18 = 126)
      (3L, "en", (1 to 8).map(i => s"s$i").mkString(" ")),
      (4L, "en", ""), // zero tokens: short only (no-bigram rule false)
      (5L, "en", (1 to 12).map(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "lang", "text")
    val out = Advanced.filterAblationDf(docs).collect()
      .map(r => ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)),
        (r.getLong(4), r.getLong(5)))).toMap
    assert(out((true, false, false))._1 === 1L)   // stuffed
    assert(out((false, true, false))._1 === 1L)   // deBruijn
    assert(out((false, false, true)) === ((2L, 8L)),
      "short-only mask carries the 8-token doc and the empty doc")
    assert(out((false, false, false)) === ((1L, 12L))) // clean
    assert(out.values.map(_._1).sum === 5L,
      "the mask census partitions the raw corpus")
  }

  test("filter ablation agrees with the q259 funnel: all-false mask " +
      "counts == the funnel's quality survivors, per language") {
    val survivors = Advanced.filterAblation(spark, sf0001)
      .filter(!col("fail_repetition") && !col("fail_dupfrac") &&
        !col("fail_short"))
      .select(col("lang"), col("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val funnel = Advanced.curationPipeline(spark, sf0001)
      .select(col("lang"), col("n_quality")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(survivors === funnel,
      "the census must describe the exact gate it ablates")
  }

  // -------------------------------------------------------- q275

  test("embedding health: hand-computed mean/variance, dead and " +
      "dominant dimensions") {
    val v = Seq(
      Seq(1.0, 0.5, 3.0), Seq(-1.0, 0.5, 3.0),
      Seq(1.0, 0.5, 3.0), Seq(-1.0, 0.5, 3.0)
    ).toDF("emb")
    val out = Similarity.embeddingHealthDf(v).collect()
      .map(r => r.getInt(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(0) === ((0.0, 1.0, 1.0, false, true)),
      "dim 0: mean 0, var 1, all the variance, dominant")
    assert(out(1)._1 === 0.5 && out(1)._2 === 0.0 && out(1)._4,
      "constant dim 1 is dead")
    assert(out(2)._1 === 3.0 && out(2)._2 === 0.0 && out(2)._4,
      "constant dim 2 is dead (nonzero mean doesn't hide it)")
    assert(!out(1)._5 && !out(2)._5)
  }

  // -------------------------------------------------------- q283

  test("pack efficiency: hand-computed example/waste accounting and " +
      "consistency with the q258 packing manifest") {
    val out = Advanced.packEfficiency(spark, sf0001).head()
    val (nDocs, stream, packed, padded) =
      (out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4))
    // reconcile against the packing manifest: the last example index
    // of q258's stream + 1 must equal the packed example count
    val manifest = Advanced.packContexts(spark, sf0001)
    assert(manifest.count() === nDocs)
    val lastExample = manifest
      .agg(max(col("first_example") + col("n_examples") - 1)).head()
      .getLong(0)
    assert(lastExample + 1 === packed,
      "packed_examples must equal the manifest's final example index + 1")
    // padding can never beat packing; waste identities hold exactly
    assert(padded >= packed)
    assert(out.getLong(5) === packed * 512 - stream)
    assert(out.getLong(6) === padded * 512 - stream)
    assert(out.getLong(5) < 512, "concat-and-split wastes < one context")
  }

  // -------------------------------------------------------- q280

  test("sentiment lexicon: hand-computed polarity counts and mean; " +
      "non-lexicon tokens are neutral") {
    val docs = Seq(
      ("s1", "fast fast big table"),   // +3
      ("s1", "slow small query"),      // -2
      ("s1", "join hash merge"),       // 0
      ("s2", "slow slow slow")         // -3
    ).toDF("source", "text")
    val out = TextQueries.sentimentBySourceDf(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    assert(out("s1") === ((3L, 1L, 1L, 1L, 1L, 0.3333)))
    assert(out("s2") === ((1L, 0L, 1L, 0L, -3L, -3.0)))
  }

  // -------------------------------------------------------- q276

  test("vocab coverage: hand-computed curve, budgets past the vocabulary " +
      "saturate at full coverage") {
    val docs = Seq("a a a a b b c d").toDF("text")
    val out = TextQueries.vocabCoverageDf(docs, Seq(1, 2, 3, 4, 10))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((1L, 4L, 0.5)))    // 'a' alone covers 4/8
    assert(out(2L) === ((2L, 6L, 0.75)))
    assert(out(3L) === ((3L, 7L, 0.875)))  // tie c<d: c enters at rank 3
    assert(out(4L) === ((4L, 8L, 1.0)))
    assert(out(10L) === ((4L, 8L, 1.0)), "budget caps at the vocabulary")
  }

  test("vocab coverage on testdata: monotone in the budget, ends exact") {
    val rows = TextQueries.vocabCoverage(spark, sf0001)
      .orderBy(col("v")).collect()
    val cov = rows.map(_.getDouble(3))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
      s"coverage must be monotone: ${cov.mkString(",")}")
    assert(rows.map(_.getLong(1)).max === rows.last.getLong(1))
  }

  // -------------------------------------------------------- q277

  test("dsir ess: identical docs carry uniform weights — ESS == n") {
    val docs = (0L until 6L).map(i => (i, "en", "alpha beta gamma"))
      .toDF("doc_id", "lang", "text")
    val out = TextQueries.dsirEssDf(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 6L && r.getDouble(2) === 6.0 &&
      r.getDouble(3) === 1.0 && !r.getBoolean(4))
  }

  test("dsir ess: one dominant-weight doc degenerates the language — " +
      "ESS collapses toward 1 and the flag fires") {
    // en defines the target; lang xx has ONE en-like doc (huge weight)
    // among junk-token docs (tiny weights after max-stabilization)
    val enText = Seq.fill(30)("alpha beta gamma delta").mkString(" ")
    val en = (0L until 4L).map(i => (i, "en", enText))
    val xx = Seq((10L, "xx", enText)) ++ (11L until 17L).map(i =>
      (i, "xx", (1 to 120).map(j => s"junk${i}x$j").mkString(" ")))
    val out = TextQueries.dsirEssDf((en ++ xx).toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(4)))).toMap
    val (nXx, essXx, degXx) = out("xx")
    assert(nXx === 7L)
    assert(essXx < 2.0, s"dominated language must collapse, got $essXx")
    assert(degXx, "the degeneracy flag must fire")
    assert(!out("en")._3, "the uniform target language must not flag")
  }

  test("dsir ess on testdata: 1 <= ESS <= n for every language") {
    TextQueries.dsirEss(spark, sf0001).collect().foreach { r =>
      val (n, ess, ratio) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(ess >= 1.0 - 1e-9 && ess <= n + 1e-6, s"ESS $ess out of [1,$n]")
      assert(ratio <= 1.0 + 1e-9)
    }
  }

  test("embedding health on testdata: full width, shares sum to ~1, " +
      "dominant ⟺ max variance, no dead dims") {
    val rows = Similarity.embeddingHealth(spark, sf0001).collect()
    assert(rows.length === 64)
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 64 * 1e-6,
      s"variance shares must sum to ~1, got ${shares.sum}")
    val vars = rows.map(_.getDouble(2))
    val mx = vars.max
    rows.foreach { r =>
      assert(r.getBoolean(5) === (r.getDouble(2) == mx))
      assert(!r.getBoolean(4), "testdata embeddings carry no dead dims")
    }
  }
}
