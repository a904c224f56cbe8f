package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.SortedKeyWeightSum.{sortedKeyDotSum, sortedKeyMinSum}

/** The merge-walk postings-verify kernels (round-14 optimization: the
  * q231/q185 exact rescore replaces its |cand|×|postings| join with one
  * walk per pair) must agree with the join-and-aggregate formulation they
  * replaced — randomized parity against a reference computed with plain
  * Scala maps, plus codegen/eval paths, edge cases, and the loud-overflow
  * contract. */
class SortedKeyWeightSumSpec extends SparkTestBase {
  import spark.implicits._

  private def refMin(a: Seq[(String, Long)], b: Seq[(String, Long)]): Long = {
    val bm = b.toMap
    a.collect { case (k, v) if bm.contains(k) => math.min(v, bm(k)) }.sum
  }
  private def refDot(a: Seq[(String, Long)], b: Seq[(String, Long)]): Long = {
    val bm = b.toMap
    a.collect { case (k, v) if bm.contains(k) => v * bm(k) }.sum
  }

  test("randomized: min-sum and dot-sum agree with the join-aggregate " +
      "reference on sorted distinct-key postings") {
    val rnd = new scala.util.Random(231)
    val vocab = Vector("alpha", "b", "cc", "delta", "ee", "f", "gg", "hh",
      "iota", "jj", "k", "lime")
    def postings() = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
      .distinct.sorted.map(w => (w, (rnd.nextInt(100) + 1).toLong))
    val cases = Seq.fill(200)((postings(), postings()))
    val df = cases.map { case (a, b) =>
      (a.map(_._1), a.map(_._2), b.map(_._1), b.map(_._2))
    }.toDF("ka", "va", "kb", "vb")
    val rows = df.select(
      sortedKeyMinSum(col("ka"), col("va"), col("kb"), col("vb")).as("m"),
      sortedKeyDotSum(col("ka"), col("va"), col("kb"), col("vb")).as("d"))
      .collect()
    rows.zip(cases).foreach { case (r, (a, b)) =>
      assert(r.getLong(0) === refMin(a, b), s"min $a vs $b")
      assert(r.getLong(1) === refDot(a, b), s"dot $a vs $b")
    }
  }

  test("long keys, empty, disjoint, identical; the expression runs inside " +
      "whole-stage codegen") {
    val df = Seq(
      (Seq.empty[Long], Seq.empty[Long], Seq(1L, 2L), Seq(5L, 6L)),
      (Seq(1L, 3L), Seq(2L, 4L), Seq(2L, 4L), Seq(9L, 9L)),
      (Seq(1L, 2L, 3L), Seq(5L, 1L, 7L), Seq(1L, 2L, 3L), Seq(2L, 6L, 7L)),
    ).toDF("ka", "va", "kb", "vb")
    assert(df.select(
      sortedKeyMinSum(col("ka"), col("va"), col("kb"), col("vb")))
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 2L + 1L + 7L))
    assert(df.select(
      sortedKeyDotSum(col("ka"), col("va"), col("kb"), col("vb")))
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 0L, 10L + 6L + 49L))
    // codegen: assert on a file-backed frame (a local Seq constant-folds
    // into LocalTableScan before codegen) — the `*(n)` prefix marks a
    // WholeStageCodegen stage
    val docs = graft.operators.Tables.documents(spark, sf0001)
      .select(array_sort(split(col("text"), " ")).as("ks"))
      .select(col("ks"),
        expr("transform(ks, x -> bigint(length(x)))").as("vs"))
    val plan = docs.select(
      sortedKeyMinSum(col("ks"), col("vs"), col("ks"), col("vs")))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("sorted_key_min_sum") && l.trim.startsWith("*(")), plan)
  }

  test("identical postings: min-sum is the total mass, dot-sum the " +
      "squared norm — the q231/q185 denominators' sanity anchors") {
    val a = Seq(("x", 3L), ("y", 5L), ("z", 2L))
    val df = Seq((a.map(_._1), a.map(_._2))).toDF("k", "v")
    val r = df.select(
      sortedKeyMinSum(col("k"), col("v"), col("k"), col("v")),
      sortedKeyDotSum(col("k"), col("v"), col("k"), col("v"))).head()
    assert(r.getLong(0) === 10L)
    assert(r.getLong(1) === 9L + 25L + 4L)
  }

  test("int64 overflow fails loudly (ANSI-equivalent contract), never " +
      "wraps silently") {
    val big = Long.MaxValue / 2
    val df = Seq((Seq("w"), Seq(big), Seq("w"), Seq(big)))
      .toDF("ka", "va", "kb", "vb")
    val e = intercept[Exception] {
      df.select(sortedKeyDotSum(col("ka"), col("va"), col("kb"), col("vb")))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]), e)
  }

  test("null array inputs propagate null") {
    val df = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) ka, " +
      "array(1L) va, array('x') kb, array(1L) vb")
    assert(df.select(
      sortedKeyMinSum(col("ka"), col("va"), col("kb"), col("vb")))
      .head().isNullAt(0))
  }
}
