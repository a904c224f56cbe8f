package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.SortedIntersectSize.sortedIntersectSize

/** The native merge-walk intersection expression must agree with the
  * built-in `size(array_intersect(...))` on sorted distinct inputs — checked
  * on randomized token sets and edge cases, through both the codegen and
  * interpreted paths (a DataFrame plan exercises doGenCode; a literal-fold
  * exercises eval). */
class SortedIntersectSizeSpec extends SparkTestBase {
  import spark.implicits._

  test("randomized: agrees with size(array_intersect) on sorted distinct sets") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "cc", "d", "ee", "f", "gg", "h", "iii", "j")
    val cases = Seq.fill(200) {
      def set() = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
        .distinct.sorted
      (set(), set())
    }
    val df = cases.toDF("a", "b")
    val rows = df.select(
      sortedIntersectSize(col("a"), col("b")).as("got"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    rows.zip(cases).foreach { case (r, (a, b)) =>
      assert(r.getInt(0) === r.getInt(1), s"$a vs $b")
      assert(r.getInt(0) === (a.toSet & b.toSet).size)
    }
  }

  test("edge cases: empty, disjoint, identical, codegen plan") {
    val df = Seq(
      (Seq.empty[String], Seq("a", "b")),
      (Seq("a", "b"), Seq.empty[String]),
      (Seq("a", "c"), Seq("b", "d")),
      (Seq("a", "b", "c"), Seq("a", "b", "c")),
    ).toDF("a", "b")
    val got = df.select(sortedIntersectSize(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(0, 0, 0, 3))
    // plan goes through whole-stage codegen — asserted on a file-backed
    // frame (a local Seq constant-folds into LocalTableScan before codegen)
    val docs = graft.operators.Tables.documents(spark, sf0001)
      .select(array_sort(split(col("text"), " ")).as("a"))
    val plan = docs.select(sortedIntersectSize(col("a"), col("a")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage in the plan string —
    // the expression must sit inside one, not fall back to interpreted eval
    assert(plan.linesIterator.exists(l =>
      l.contains("sorted_intersect_size") && l.trim.startsWith("*(")), plan)
  }

  test("null inputs propagate null") {
    val df = spark.sql(
      "SELECT CAST(NULL AS ARRAY<STRING>) AS a, array('x') AS b")
    assert(df.select(sortedIntersectSize(col("a"), col("b")))
      .head().isNullAt(0))
  }
}
