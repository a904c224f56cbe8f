package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Hand-computed fixtures for the training-data quality filters
  * (gopherQuality q75, dupSpans q76). Cross-engine value correctness is
  * the DuckDB oracle's job; these pin the signal definitions on inputs
  * small enough to verify by hand, via a temp documents.parquet. */
class QualityFilterSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("qf").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("gopher signals on a hand-checked doc") {
    // 6 words: lengths 2,2,2,2,2,5; "ab" x3 -> top frac 0.5
    // 2-grams: [ab ab, ab cd, cd ab, ab cd, cd world] -> 4 distinct of 5
    val d = writeDocs(Seq((1L, "ab ab cd ab cd world")))
    val r = TextQueries.gopherQuality(spark, d).head()
    assert(r.getAs[Int]("n_words") === 6)
    assert(r.getAs[Double]("mean_word_len") === 2.5) // 15 chars / 6
    assert(r.getAs[Double]("ttr") === 0.5) // ab, cd, world
    assert(r.getAs[Double]("top_word_frac") === 0.5)
    assert(r.getAs[Double]("dup_2gram_frac") === 0.2) // 1 - 4/5
    assert(!r.getAs[Boolean]("keep")) // n_words < 30 and top frac > 0.2
  }

  test("gopher keep flag accepts a clean doc") {
    val words = (1 to 40).map(i => s"w${i}word").mkString(" ")
    val d = writeDocs(Seq((1L, words)))
    val r = TextQueries.gopherQuality(spark, d).head()
    assert(r.getAs[Int]("n_words") === 40)
    assert(r.getAs[Double]("top_word_frac") === 0.025)
    assert(r.getAs[Double]("dup_2gram_frac") === 0.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("dup spans: shared 5-gram across docs is flagged, unique is not") {
    val shared = "alpha beta gamma delta epsilon"
    val d = writeDocs(Seq(
      (1L, s"$shared one two three four"),
      (2L, s"zero $shared nine eight seven"),
      (3L, "totally different words here entirely now")))
    val r = TextQueries.dupSpans(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // doc1: 5 grams (9 words), only the leading one is shared
    assert(r(1L)._1 === 5L)
    assert(r(1L)._2 === 1L)
    // doc2: 5 grams (9 words), the shared gram sits at position 2
    assert(r(2L)._1 === 5L)
    assert(r(2L)._2 === 1L)
    // doc3: 2 grams (6 words), nothing shared
    assert(r(3L) === ((2L, 0L)))
  }

  test("pii redaction masks every detected pattern and only those") {
    val r = TextQueries.piiRedact(spark, sf0001)
      .withColumn("leak",
        $"redacted".rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
          $"redacted".rlike("555-[0-9]{4}-[0-9]{4}"))
    assert(r.filter($"leak").count() === 0)
    // every counted hit produced a mask token, and vice versa
    val bad = r.filter(
      ($"n_emails" > 0) =!= $"redacted".contains("[EMAIL]") ||
        ($"n_phones" > 0) =!= $"redacted".contains("[PHONE]")).count()
    assert(bad === 0)
    // the synthesized corpus really exercises both branches
    assert(r.filter($"n_emails" > 0).count() > 0)
    assert(r.filter($"n_phones" > 0).count() > 0)
  }

  test("bm25: only docs containing a query term, idf orders rare above common") {
    val docs = (1 to 20).map(i => (i.toLong,
      if (i <= 10) "spark " + ("filler word soup here " * 5).trim
      else "filler word soup here nothing")) :+
      (21L, "join " + ("filler word soup here " * 5).trim)
    val d = writeDocs(docs)
    val r = TextQueries.bm25(spark, d).collect()
    // docs 11..20 contain no query term: absent
    assert(r.map(_.getLong(0)).toSet === ((1L to 10L).toSet + 21L))
    // 'join' appears in 1/21 docs, 'spark' in 10/21: same tf and dl, so
    // the rare term scores strictly higher
    val sparkScore = r.find(_.getLong(0) === 1L).get.getAs[Double]("bm25")
    val joinScore = r.find(_.getLong(0) === 21L).get.getAs[Double]("bm25")
    assert(joinScore > sparkScore)
  }

  test("inverted index: df equals posting length, postings sorted") {
    val d = writeDocs(Seq((3L, "b a"), (1L, "a b"), (2L, "b c b")))
    val r = TextQueries.invertedIndex(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r("a") === ((2L, "1,3")))
    assert(r("b") === ((3L, "1,2,3")))
    assert(r("c") === ((1L, "2")))
  }

  test("docs shorter than the span width produce no gram rows") {
    val d = writeDocs(Seq((1L, "only four words here"),
      (2L, "alpha beta gamma delta epsilon")))
    val ids = TextQueries.dupSpans(spark, d).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }

  test("zipf fit: driver-side OLS recompute, negative slope on real data") {
    val r = TextQueries.zipfFit(spark, sf0001).head()
    val counts = Tables.documents(spark, sf0001)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')"))
        .as("tok"))
      .as[String].collect()
      .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    assert(r.getAs[Long]("total_tokens") === counts.values.sum)
    assert(r.getAs[Long]("vocab") === counts.size.toLong)
    val top = counts.toSeq.sortBy { case (t, f) => (-f, t) }.take(100)
      .zipWithIndex.map { case ((_, f), i) =>
        (math.rint(math.log(i + 1.0) * 1e9) / 1e9,
          math.rint(math.log(f.toDouble) * 1e9) / 1e9)
      }
    val n = top.length.toDouble
    val sx = top.map(_._1).sum; val sy = top.map(_._2).sum
    val sxx = top.map(p => p._1 * p._1).sum
    val syy = top.map(p => p._2 * p._2).sum
    val sxy = top.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-4)
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-4)
    // frequency is decreasing in rank, so the fitted slope is negative
    assert(r.getAs[Double]("slope") < 0.0)
    assert(r.getAs[Double]("r2") >= 0.0 && r.getAs[Double]("r2") <= 1.0)
  }

  test("chunk overlap: stride-64/48 window arithmetic on hand-sized docs") {
    val words150 = (1 to 150).map(i => s"w$i").mkString(" ")
    val words10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val d = writeDocs(Seq((1L, words150), (2L, words10)))
    val rows = TextQueries.chunkOverlap(spark, d)
      .orderBy($"doc_id", $"chunk_id").collect()
    // 150 tokens: ⌈(150−64)/48⌉+1 = 3 chunks at offsets 0/48/96,
    // sizes 64/64/54; 10 tokens: one short chunk
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq === Seq((1L, 0L, 64), (1L, 1L, 64), (1L, 2L, 54),
        (2L, 0L, 10)))
    // fingerprint is the md5 of the re-joined chunk text
    val md5OfFirst = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 64).map(i => s"w$i").mkString(" ")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.head.getString(3) === md5OfFirst)
    // consecutive chunks overlap by size−stride = 16 tokens
    val all = TextQueries.chunkOverlap(spark, d, size = 6, stride = 4)
      .filter($"doc_id" === 2L).orderBy($"chunk_id").collect()
    assert(all.map(_.getInt(2)).toSeq === Seq(6, 6))
  }

  test("chunk overlap: coverage law across doc lengths and configs") {
    // doc i has i tokens (1..130) — exercises short docs, the exact
    // window boundary, stride remainders, and multi-chunk tails
    val d = writeDocs((1L to 130L).map(i =>
      (i, (1L to i).map(t => s"t$t").mkString(" "))))
    for ((size, stride) <- Seq((64, 48), (10, 10), (7, 3))) {
      val got = TextQueries.chunkOverlap(spark, d, size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(_._1)
      (1L to 130L).foreach { n =>
        val chunks = got(n).sortBy(_._2)
        val expectN =
          if (n <= size) 1L else ((n - size + stride - 1) / stride) + 1
        assert(chunks.length.toLong === expectN,
          s"n=$n size=$size stride=$stride")
        // chunk c covers [c·stride, min(c·stride+size, n)) — together
        // they tile the doc with no gap and the final token covered
        chunks.foreach { case (_, c, len) =>
          assert(len === math.min(size.toLong, n - c * stride),
            s"n=$n c=$c size=$size stride=$stride")
        }
        val lastStart = (expectN - 1) * stride
        assert(lastStart < n && lastStart + chunks.last._3 === n)
      }
    }
  }

  test("mixture rebalance: deterministic, rebalances langs toward the smallest") {
    val a = Advanced.mixtureRebalance(spark, sf0001)
    val sampled = a.collect().map(r => (r.getLong(0), r.getString(1)))
    // repeatable: the md5 draw has no RNG
    assert(sampled.toSet === Advanced.mixtureRebalance(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    val orig = Tables.documents(spark, sf0001)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = sampled.groupBy(_._2).map { case (l, v) => l -> v.length }
    // nothing oversamples, and the smallest language keeps every doc
    // (rate 1.0 ⇒ threshold ffffffff admits all realistic md5 draws)
    got.foreach { case (l, n) => assert(n <= orig(l)) }
    val minLang = orig.minBy(_._2)._1
    assert(got(minLang) === orig(minLang).toInt)
    // every stratum lands within a loose Bernoulli band of the target
    val target = orig.values.min.toDouble
    got.foreach { case (l, n) =>
      assert(math.abs(n - target) <= math.max(6.0, target * 0.45),
        s"$l sampled $n vs target $target")
    }
  }

  test("leakage-safe split: group-pure, proportioned, reconciles exactly") {
    val rows = Advanced.leakageSafeSplit(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(rows.keySet.subsetOf(Set("train", "val", "test")))
    assert(rows.values.forall(_._3), "no_leakage must hold")
    // driver recompute: the split is a pure function of user_id, so
    // every user appears in exactly one split and counts reconcile
    // EXACTLY (the tiny sf0.001 user set can leave a 10% band empty —
    // the recompute, not a fixed key set, is the truth)
    val users = Tables.events(spark, sf0001)
      .select($"user_id").distinct().as[Long].collect()
    def splitOf(u: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$u".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      if (h < "cccccccc") "train" else if (h < "e6666666") "val"
      else "test"
    }
    val expect = users.groupBy(splitOf).map { case (k, v) => k -> v.length }
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (k, n) => assert(rows(k)._1 === n.toLong) }
    assert(rows.values.map(_._2).sum ===
      Tables.events(spark, sf0001).count())
    // the 80% band dominates within a loose Bernoulli band
    val nAll = users.length.toDouble
    assert(math.abs(rows("train")._1 - 0.8 * nAll) < math.max(6.0, nAll * 0.2))
  }

  test("heaps law: driver-side decile recompute, growth exponent sane") {
    val rows = TextQueries.heapsLaw(spark, sf0001)
      .orderBy($"decile").collect()
    assert(rows.length === 10)
    // driver recompute of the decile checkpoints: SQL ntile semantics
    // over doc_id order, cumulative token count, first-seen vocabulary
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", expr("filter(split(text, ' '), x -> x != '')"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val n = docs.length
    val base = n / 10; val rem = n % 10
    val cuts = (1 to 10).map(t =>
      (0 until t).map(i => base + (if (i < rem) 1 else 0)).sum)
    val seen = scala.collection.mutable.HashSet[String]()
    var tok = 0L
    var idx = 0
    val expect = cuts.map { c =>
      while (idx < c) {
        tok += docs(idx)._2.length; docs(idx)._2.foreach(seen += _)
        idx += 1
      }
      (tok, seen.size.toLong)
    }
    rows.zip(expect).foreach { case (row, (tc, vc)) =>
      assert(row.getAs[Long]("n_tokens_cum") === tc)
      assert(row.getAs[Long]("vocab_cum") === vc)
    }
    // natural corpora give 0 < beta < 1; the sf0.001 synthetic corpus
    // SATURATES its fixed vocabulary in the first decile, so beta can
    // legitimately round to 0 — the bound only excludes superlinear
    // growth (a template red flag) and negative slopes (broken fit)
    val beta = rows.head.getAs[Double]("beta")
    assert(beta >= 0.0 && beta < 1.0)
    assert(rows.map(_.getAs[Long]("vocab_cum")).sliding(2)
      .forall(p => p.head <= p.last))
  }
}
