package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.functions.MinHashExpressions.{minhashSignature, shingleSet, simhash64}
import graft.functions.VectorFunctions
import graft.operators.Tables

/** Agreement specs: each native per-row kernel must produce bit-identical
  * results to the exploded/higher-order reference formulation it replaced.
  * The references are the spec here — the kernels exist purely to remove
  * shuffles and interpreted expression trees, never to change semantics. */
class NativeKernelSpec extends SparkTestBase {
  import spark.implicits._

  private val d = sf0001

  private def docToks = Tables.documents(spark, d)
    .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))

  test("native minhash signature equals the exploded window+agg reference") {
    val ref = Dedup.hashedShingles(docToks)
      .groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("hs"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, hs) =>
        id -> Dedup.hashFamiliesForSpec.map { case (a, b) =>
          hs.map(h => ((h * a) + b) % Dedup.HashDomain).min
        }
      }.toMap
    val native = docToks
      .select(col("doc_id"), minhashSignature(col("toks")).as("sig"))
      .filter(col("sig").isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.keySet === ref.keySet)
    native.foreach { case (id, sig) => assert(sig === ref(id), s"doc $id") }
  }

  test("native shingle set equals the exploded collect_set reference") {
    val ref = Dedup.hashedShingles(docToks)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("h"))).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = docToks
      .select(col("doc_id"), shingleSet(col("toks")).as("sh"))
      .filter(col("sh").isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    assert(native === ref)
  }

  test("native kernels: short-doc fallbacks match the reference (1 and 2 tokens)") {
    val docs = Seq((1L, "one"), (2L, "two words"), (3L, "three token doc"),
      (4L, "a slightly longer document with several tokens in it"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    val ref = Dedup.hashedShingles(docs)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("h"))).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    val native = docs.select(col("doc_id"), shingleSet(col("toks")).as("sh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native === ref)
  }

  test("native kernels are null for tokenless docs (explode-drop semantics)") {
    val e = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(minhashSignature(col("toks")).as("sig"),
        shingleSet(col("toks")).as("sh"))
      .collect()
    e.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("native simhash64 equals simhashDf (and the per-row HOF simhash)") {
    val docs = Tables.documents(spark, d).limit(100)
      .select(col("doc_id"),
        array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    val ref = Dedup.simhashDf(docs).as[(Long, Long)].collect().toMap
    val native = docs.filter(size(col("toks")) > 0)
      .select(col("doc_id"), simhash64(col("toks")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(native === ref)
  }

  test("native cosine equals the HOF cosine bit-for-bit") {
    val pairs = Tables.embeddings(spark, d)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("e"))
      .limit(50)
    val a = pairs.select(col("vec_id").as("ia"), col("e").as("ea"))
    val b = pairs.select(col("vec_id").as("ib"), col("e").as("eb"))
    val both = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        VectorFunctions.cosine(col("ea"), col("eb")).as("native"),
        VectorFunctions.cosineHof(col("ea"), col("eb")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("native dot equals the HOF dot bit-for-bit, null on length mismatch") {
    val pairs = Tables.embeddings(spark, d)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("e"))
      .limit(50)
    val a = pairs.select(col("vec_id").as("ia"), col("e").as("ea"))
    val b = pairs.select(col("vec_id").as("ib"), col("e").as("eb"))
    val both = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(
        VectorFunctions.dot(col("ea"), col("eb")).as("native"),
        VectorFunctions.dotHof(col("ea"), col("eb")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val mm = Seq((Array(1.0, 5.0), Array(1.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).head()
    assert(mm.isNullAt(0))
    // SQL registration
    val sq = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(sq === 11.0)
  }

  test("native cosine: mismatched lengths yield null (agreeing with HOF), never a truncated similarity") {
    val r = Seq((Array(1.0, 5.0), Array(1.0)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("native"),
        VectorFunctions.cosineHof(col("a"), col("b")).as("hof"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("native cosine: zero vector yields null, not an ANSI error") {
    val r = Seq((Array(0.0, 0.0), Array(1.0, 2.0)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("jaro_winkler matches the reference values and conventions") {
    // pinned against DuckDB's independent implementation (probed values)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("kitten", "sitting", 0.746031746031746),
      ("aaxxxxxx", "aayyyyyy", 0.5), // jaro ≤ 0.7 ⇒ no prefix boost
      ("aaaax", "aaaay", 0.92), // prefix boost capped at 4
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0), // window 0: adjacent transposition ≠ match
      ("abc", "", 0.0), // empty-side convention
      ("", "", 0.0))
    val got = cases.toDF("a", "b", "want")
      .select(graft.functions.StringSimilarityExpressions
        .jaroWinkler(col("a"), col("b")).as("got"), col("want"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"got ${r.getDouble(0)} want ${r.getDouble(1)}")
    }
    // symmetry over real data
    val p = Tables.part(spark, d).limit(50)
      .select(col("p_partkey"), col("p_name"))
    val asym = p.as("x").join(p.as("y"),
        col("x.p_partkey") < col("y.p_partkey"))
      .select(graft.functions.StringSimilarityExpressions
        .jaroWinkler(col("x.p_name"), col("y.p_name")).as("ab"),
        graft.functions.StringSimilarityExpressions
          .jaroWinkler(col("y.p_name"), col("x.p_name")).as("ba"))
      .filter(col("ab") =!= col("ba")).count()
    assert(asym === 0)
  }

  test("SQL registry exposes the native kernels") {
    Tables.documents(spark, d).limit(5).createOrReplaceTempView("nk_docs")
    val out = spark.sql(
      """SELECT simhash64(array_distinct(filter(split(text, ' '), t -> length(t) > 0))) AS s,
        |       minhash_signature(filter(split(text, ' '), t -> length(t) > 0)) AS m,
        |       shingle_set(filter(split(text, ' '), t -> length(t) > 0)) AS sh,
        |       cosine_similarity(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c,
        |       jaro_winkler('martha', 'marhta') AS jw
        |FROM nk_docs""".stripMargin).collect()
    assert(out.length === 5)
    out.foreach { r => assert(math.abs(r.getDouble(3) - 1.0) < 1e-12) }
    out.foreach { r =>
      assert(math.abs(r.getDouble(4) - 0.9611111111111111) < 1e-12)
    }
  }

  test("isotonic pava: hand-derived fixture, merge path, invariants") {
    val rows = Seq(
      (0, 1L), (0, 0L), // rate 0.5
      (1, 0L), (1, 0L), // rate 0.0 -> pools with bin 0 to 0.25
      (2, 1L), (2, 1L), (2, 0L), (2, 0L), // 0.5 stands
      (3, 1L), (3, 1L), (3, 1L), (3, 1L), (3, 0L)) // 0.8 stands
    val df = rows.toDF("bin", "y").repartition(5) // force partial merges
      .agg(AggregateKernels.isotonicPava(col("bin"), col("y"), 4).as("f"))
      .select(explode(col("f")).as("e"))
      .select(col("e.bin"), col("e.n"), col("e.pos"), col("e.rate_iso"))
    val got = df.as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(got === Array(
      (0, 2L, 1L, 0.25), (1, 2L, 0L, 0.25),
      (2, 4L, 2L, 0.5), (3, 5L, 4L, 0.8)))
    // empty bins are skipped, already-monotone input is untouched
    val mono = Seq((0, 0L), (2, 1L), (2, 0L), (3, 1L)).toDF("bin", "y")
      .agg(AggregateKernels.isotonicPava(col("bin"), col("y"), 4).as("f"))
      .select(explode(col("f")).as("e"))
      .select(col("e.bin"), col("e.rate_iso"))
      .as[(Int, Double)].collect().sortBy(_._1)
    assert(mono === Array((0, 0.0), (2, 0.5), (3, 1.0)))
  }

  test("nfc normalization matches java.text.Normalizer on edge cases") {
    val cases = Seq(
      // decomposed base + combining acute composes
      "e\u0301" -> "\u00e9",
      // already-NFC input unchanged
      "\u00e9" -> "\u00e9",
      "" -> "",
      "plain ascii" -> "plain ascii",
      // Hangul jamo sequence composes to the precomposed syllable
      "\u1100\u1161\u11a8" -> "\uac01",
      // singleton: Angstrom sign maps to Latin capital A with ring
      "\u212b" -> "\u00c5",
      // canonical reordering: dot-above (ccc 230) sorts after dot-below (220)
      "q\u0307\u0323" -> "q\u0323\u0307")
    val df = cases.map(_._1).toDF("s")
      .select(UnicodeExpressions.nfc(col("s")).as("n"))
    assert(df.as[String].collect().toSeq === cases.map(_._2))
    // SQL registry path + idempotence over real data with appended marks
    Tables.documents(spark, d).limit(20)
      .createOrReplaceTempView("nfc_docs")
    val r = spark.sql(
      "SELECT nfc(concat(text, ' e\u0301')) AS a, " +
        "nfc(nfc(concat(text, ' e\u0301'))) AS b FROM nfc_docs").collect()
    assert(r.length === 20)
    r.foreach { row =>
      assert(row.getString(0) === row.getString(1))
      assert(row.getString(0).endsWith(" \u00e9"))
    }
  }
}
