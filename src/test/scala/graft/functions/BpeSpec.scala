package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Tables, TextQueries}

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // The classic corpus (Sennrich et al.'s worked example, weights varied):
  // low×5  lower×2  newest×6  widest×3
  private val corpus = Seq[(String, Long)](
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("training follows hand-derived pair counts with lexicographic ties") {
    // round 1: (e,s)=9 ties (s,t)=9 → lexicographically (e,s) wins
    // round 2: (es,t)=9
    // round 3: (l,o)=7 ties (o,w)=7 → (l,o) wins
    // round 4: (lo,w)=7
    val merges = Bpe.train(corpus, 4)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encoding replays merges: lowest → low + est; unseen chars survive") {
    val merges = Bpe.train(corpus, 4)
    assert(Bpe.encode("lowest", merges).toSeq === Seq("low", "est"))
    assert(Bpe.encode("newest", merges).toSeq === Seq("n", "e", "w", "est"))
    // symbols never seen in training stay single characters
    assert(Bpe.encode("xyz", merges).toSeq === Seq("x", "y", "z"))
    assert(Bpe.encode("", merges).toSeq === Seq.empty)
  }

  test("encoding is lossless: concatenating subwords restores the word") {
    val merges = Bpe.train(corpus, 10)
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "wide"))
      assert(Bpe.encode(w, merges).mkString === w)
  }

  test("training exhausts pairs gracefully when asked for too many merges") {
    val merges = Bpe.train(Seq(("ab", 1L)), 100)
    assert(merges === Seq(("a", "b")))
  }

  test("distributed pipeline reconciles with a sequential re-encode") {
    val got = TextQueries.bpeTokens(spark, sf0001)
      .as[(String, Long)].collect().toMap
    // independent sequential accounting at sf0.001
    val words = Tables.documents(spark, sf0001)
      .select(explode(TextAnalysis.tokens($"text")).as("w"))
      .as[String].collect()
    val wc = words.groupBy(identity).map { case (w, ws) =>
      (w, ws.length.toLong) }.toSeq
    val top = wc.sortBy { case (w, c) => (-c, w) }
      .take(TextQueries.BpeVocabCap)
    val merges = Bpe.train(top, TextQueries.BpeMerges)
    val want = words.flatMap(w => Bpe.encode(w, merges))
      .groupBy(identity).map { case (t, ts) => (t, ts.length.toLong) }
    assert(got === want)
    // total subword mass ≥ word mass is false (merges shrink); but
    // character mass is conserved exactly
    val charsGot = got.map { case (t, n) => t.length * n }.sum
    assert(charsGot === words.map(_.length).sum)
  }
}
