package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.similarity.Similarity

/** q260 substring dedup, q261 winnowing, q262 filtered ANN, q263 CCNet
  * buckets — the round-7 continuation batch. Pins the semantics the
  * testdata oracle can't isolate: interval-union arithmetic and
  * within-doc duplication (q260), the winnowing sharing guarantee plus a
  * from-scratch driver-side recompute (q261), filter purity and the
  * fewer-than-k class edge (q262), and the Laplace OOV path + rank-free
  * tercile tie rule (q263). */
class SubstrWinnowCcnetSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // -------------------------------------------------------- q260

  test("substring dedup: cross-doc run, union of overlapping windows, " +
      "zero-dup doc kept") {
    val shared = (1 to 9).map(i => s"s$i").mkString(" ") // 9-token run
    val d = docs(
      1L -> (shared + " xa xb xc"),          // 12 tokens
      2L -> ("ya yb " + shared + " yc"),     // 12 tokens
      3L -> (1 to 12).map(i => s"u$i").mkString(" ")) // unique, 12 tokens
    val out = Dedup.substringDedupDf(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))))
      .toMap
    // the 9-token shared run yields 2 duplicated 8-windows per doc whose
    // interval UNION is 9 tokens, not 16
    assert(out(1L) === ((12L, 2L, 9L, true)))  // 9*5 > 12
    assert(out(2L) === ((12L, 2L, 9L, true)))
    assert(out(3L) === ((12L, 0L, 0L, false))) // present with zeros
  }

  test("substring dedup: WITHIN-doc repetition counts as duplication " +
      "(corpus count >= 2 includes same-doc positions)") {
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val d = docs(
      1L -> (phrase + " mid1 mid2 " + phrase)) // 18 tokens, run twice
    val out = Dedup.substringDedupDf(d).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === 18L)
    // both occurrences of the phrase window are duplicated positions
    assert(r.getLong(2) === 2L && r.getLong(3) === 16L)
    assert(r.getBoolean(5)) // 16*5 > 18
  }

  test("substring dedup: docs shorter than K are excluded; adjacent " +
      "duplicated windows merge exactly") {
    val shared10 = (1 to 10).map(i => s"t$i").mkString(" ") // 3 windows
    val d = docs(
      1L -> shared10,
      2L -> shared10,
      3L -> "a b c") // < 8 tokens
    val out = Dedup.substringDedupDf(d)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === 10L && out(2L) === 10L) // union of 3 windows = 10
  }

  // -------------------------------------------------------- q267

  test("substring dedup apply: duplicated spans are cut, survivors " +
      "reassemble in order, short docs pass through verbatim") {
    val shared = (1 to 9).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> (shared + " xa xb xc"),
      2L -> ("ya yb " + shared + " yc"),
      3L -> "a b c") // < 8 tokens: untouched
    val out = Dedup.substringDedupApplyDf(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out.size === 3)
    // doc 1: 9 shared tokens cut, "xa xb xc" survives
    assert(out(1L)._1 === 12L && out(1L)._2 === 3L && out(1L)._3 === 9L)
    assert(out(1L)._4 === md5hex("xa xb xc"))
    assert(out(2L)._4 === md5hex("ya yb yc"))
    // the short doc is verbatim — removed 0, fingerprint of itself
    assert(out(3L)._3 === 0L && out(3L)._4 === md5hex("a b c"))
  }

  test("substring dedup apply reconciles with the census: " +
      "removed_tokens equals the census dup_tokens on testdata") {
    val census = Dedup.substringDedup(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val applied = Dedup.substringDedupApply(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(applied.nonEmpty)
    applied.foreach { case (id, nTok, removed) =>
      census.get(id) match {
        case Some(dup) => assert(removed === dup, s"doc $id")
        case None => assert(removed === 0L, s"short doc $id must be intact")
      }
      assert(removed >= 0L && removed <= nTok)
    }
  }

  // -------------------------------------------------------- q270

  test("dup provenance: crafted cross-source cluster yields the exact " +
      "pair matrix; canonical key catches reordered/repeated tokens") {
    val t = "alpha beta gamma delta"
    val d = Seq(
      ("A", t), ("A", "beta alpha delta gamma"),     // reorder → same key
      ("B", "alpha beta beta gamma delta"),          // repeat → same key
      ("A", "totally unrelated content here"),
      ("C", "another unique document text")).toDF("source", "text")
    val out = Dedup.dupProvenanceDf(d)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // cluster {A:2, B:1}: AA = C(2,2)=1, AB = 2·1 = 2; nothing else
    assert(out === Map(("A", "A") -> 1L, ("A", "B") -> 2L))
  }

  test("dup provenance on testdata: matrix pair mass reconciles with " +
      "per-cluster C(n,2) accounting") {
    val matrix = Dedup.dupProvenance(spark, sf0001)
      .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    val clusters = Tables.documents(spark, sf0001)
      .select(md5(concat_ws(" ", array_sort(array_distinct(
        expr("filter(split(lower(text), ' '), x -> x != '')")))))
        .as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("tn"))
      .filter(col("tn") >= 2)
      .select(expr("sum((tn * (tn - 1)) div 2)").as("p"))
      .collect()(0).getLong(0)
    assert(matrix === clusters && matrix > 0L,
      s"matrix $matrix vs clusters $clusters")
  }

  // -------------------------------------------------------- q272

  test("neardup provenance: matrix mass equals the exact pair count; " +
      "source pairs are normalized") {
    val matrix = Dedup.neardupProvenance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val totalPairs = Dedup.ngramJaccardPairs(spark, sf0001).count()
    assert(matrix.map(_._3).sum === totalPairs && totalPairs > 0)
    matrix.foreach { case (a, b, _) => assert(a <= b) }
  }

  // -------------------------------------------------------- q261

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side winnowing reference: k-gram md5-prefix hashes, window
    * minima, distinct — the spec's independent recompute. */
  private def winnowRef(text: String, k: Int = 4, w: Int = 5)
      : Set[String] = {
    val t = text.toLowerCase.split(" ").filter(_.nonEmpty)
    val g = t.sliding(k).map(gr => md5hex(gr.mkString(" ")).take(8)).toVector
    g.sliding(w).map(_.min).toSet
  }

  test("winnowing: matches a from-scratch driver recompute on testdata") {
    val src = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = TextQueries.winnowingDf(
        Tables.documents(spark, sf0001).select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getString(5), r.getString(6)))).toMap
    assert(out.nonEmpty)
    out.foreach { case (id, (nFp, mn, mx)) =>
      val ref = winnowRef(src(id))
      assert(nFp === ref.size.toLong, s"doc $id fingerprint count")
      assert(mn === ref.min && mx === ref.max, s"doc $id min/max fp")
    }
    // every long-enough doc is present
    val expected = src.count { case (_, t) =>
      t.toLowerCase.split(" ").count(_.nonEmpty) >= 8 }
    assert(out.size === expected)
  }

  test("winnowing guarantee: docs sharing a k+w-1 token run share a " +
      "fingerprint; disjoint docs don't") {
    val run = (1 to 8).map(i => s"r$i").mkString(" ")
    val d = docs(
      1L -> (run + " a1 a2 a3"),
      2L -> ("b1 b2 " + run),
      3L -> (1 to 11).map(i => s"z$i").mkString(" "))
    val fps = d.as[(Long, String)].collect()
      .map { case (id, t) => id -> winnowRef(t) }.toMap
    assert((fps(1L) & fps(2L)).nonEmpty)     // the guarantee
    assert((fps(1L) & fps(3L)).isEmpty)      // no shared grams at all
    // and the Spark side selects exactly the same sets (counts + extremes)
    val out = TextQueries.winnowingDf(d)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out === fps.view.mapValues(_.size.toLong).toMap)
  }

  // -------------------------------------------------------- q262

  test("filtered ANN on testdata: neighbors share the query's label, " +
      "self excluded, order matches rounded cosine desc / id asc") {
    val out = Similarity.filteredTopK(spark, sf0001).cache()
    val labels = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getInt(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, _, _, _) =>
      assert(labels(n) === labels(q), s"neighbor $n label vs query $q")
      assert(n !== q)
    }
    // per-query: ranks contiguous from 1, sims non-increasing, id
    // tie-break ascending at equal sim
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1 to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"query $q")
        case _ =>
      }
    }
    out.unpersist()
  }

  test("filtered ANN: a label class with fewer than k members returns " +
      "all-but-self, and the filter still holds") {
    // label 1 has only 3 members (query 100 + 2 candidates); label 0 is
    // the bulk. Orthogonal axes keep cosines trivial.
    val e = (0 until 12).map { i =>
      val lbl = if (i >= 9) 1 else 0
      val id = if (i == 9) 100L else if (i == 10) 7L else if (i == 11) 8L
        else 200L + i
      val base = Array.fill(4)(0.0)
      base(i % 4) = 1.0
      base(0) += 0.1 * i // make them distinct, nonzero
      (id, lbl, base.toSeq)
    }
    val vl = e.toDF("vec_id", "label", "emb")
    val cents = Similarity.kmeansCentroids(spark, vl.select(col("vec_id"),
      col("emb")))
    val asg = Similarity.nearestCentroid(spark, vl.select(col("vec_id"),
      col("emb")), cents)
    val out = Similarity.filteredTopKDf(spark, vl, cents, asg, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // queries = vec_id % 100 == 0 → {100, 200}; label-1 query 100 has
    // exactly 2 same-label candidates → 2 rows, not 5
    val q100 = out.filter(_._1 == 100L)
    assert(q100.map(_._2).toSet === Set(7L, 8L))
    assert(q100.map(_._3).sorted.toSeq === Seq(1, 2))
    // bulk query sees only label-0 neighbors
    val q200 = out.filter(_._1 == 200L)
    assert(q200.nonEmpty && q200.forall(r => r._2 >= 201L))
  }

  // -------------------------------------------------------- q263

  test("ccnet buckets: an en-like doc scores lower bpb than an " +
      "out-of-model doc; Laplace OOV is finite") {
    val en = "the cat sat on the mat and the dog sat on the rug"
    val d = (1L, en, "en") :: (2L, en, "en") ::
      (3L, "the cat sat on the mat", "fr") :: // in-model bigrams, fr
      (4L, "qq ww ee rr tt yy uu ii", "fr") :: Nil // fully OOV
    val out = TextQueries.ccnetBucketsDf(
        d.toDF("doc_id", "text", "lang"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getString(4)))).toMap
    assert(out.size === 4)
    // content drives the score: the in-model fr doc scores like the en
    // docs' range, far below the OOV doc
    assert(out(3L)._1 < out(4L)._1)
    assert(out(4L)._1 > 0 && !out(4L)._1.isInfinite)
    // per-lang terciles: fr has 2 docs with distinct scores → cum*3<=n
    // puts neither in head (cum=1 → 3>2), lower is middle, upper tail
    assert(out(3L)._2 === "middle" && out(4L)._2 === "tail")
  }

  test("ccnet buckets: tied scores share a bucket; balanced terciles " +
      "on distinct scores") {
    // 6 en docs: 3 identical cheap ones (tie), 3 increasingly OOV
    val cheap = "a b a b a b"
    val d = Seq(
      (1L, cheap, "en"), (2L, cheap, "en"), (3L, cheap, "en"),
      (4L, "a b c d", "en"), (5L, "x1 x2 x3 x4", "en"),
      (6L, "y1 y2 y3 y4 y5", "en")).toDF("doc_id", "text", "lang")
    val out = TextQueries.ccnetBucketsDf(d)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getString(4)))).toMap
    // the three tied docs occupy the head (cum=3, 3*3<=6... no: 9>6)
    // cum for the tied value is 3 → 3*3=9 > 6 → NOT head; they share
    // whatever bucket the rule assigns — the pin is they're EQUAL
    assert(out(1L)._2 === out(2L)._2 && out(2L)._2 === out(3L)._2)
    // and the rule: cum=3 of n=6 → 9 <= 12 → middle
    assert(out(1L)._2 === "middle")
    // strictly larger scores land strictly later buckets
    assert(Set(out(5L)._2, out(6L)._2) === Set("tail"))
  }

  test("ccnet buckets on testdata: per-lang tercile counts are " +
      "near-balanced and every doc is bucketed") {
    val out = TextQueries.ccnetBuckets(spark, sf0001).cache()
    val total = out.count()
    val src = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        expr("size(filter(split(lower(text), ' '), x -> x != ''))")
          .as("n"))
      .filter(col("n") >= 2).count()
    assert(total === src)
    val byLang = out.groupBy(col("lang"), col("ppl_bucket")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val langs = byLang.keys.map(_._1).toSet
    langs.foreach { l =>
      val h = byLang.getOrElse((l, "head"), 0L)
      val m = byLang.getOrElse((l, "middle"), 0L)
      val t = byLang.getOrElse((l, "tail"), 0L)
      val n = h + m + t
      // rank-free terciles over mostly-distinct 4-dp scores: each
      // bucket within ±2 of n/3
      assert(math.abs(h - n / 3) <= 2 && math.abs(m - n / 3) <= 2 &&
        math.abs(t - n / 3) <= 2, s"lang $l: $h/$m/$t")
    }
    out.unpersist()
  }
}
