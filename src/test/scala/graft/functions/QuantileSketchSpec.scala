package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Advanced

/** KLL quantile sketch invariants the oracle can't check, plus agreement
  * of the band-refined exact quantiles (q111) with the built-in exact
  * percentile aggregate. */
class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def summaryOf(values: Seq[Double], k: Int, parts: Int = 4)
      : (Array[Double], Array[Long], Long) = {
    val row = values.toDF("v").repartition(parts)
      .agg(KllSketch.kllSketch(col("v"), k).as("s"), count(col("v")).as("n"))
      .head()
    val items = row.getSeq[Row](0)
    (items.map(_.getDouble(0)).toArray, items.map(_.getLong(1)).toArray,
      row.getLong(1))
  }

  test("weights sum to n exactly, items sorted, state is bounded") {
    val n = 50000
    // deterministic pseudo-random input (LCG), heavy-tail-ish
    val vals = Iterator.iterate(12345L)(x => x * 6364136223846793005L + 1442695040888963407L)
      .take(n).map(x => ((x >>> 11).toDouble / (1L << 53).toDouble) * 1000.0)
      .toSeq
    val (vs, ws, cnt) = summaryOf(vals, k = 200)
    assert(cnt === n)
    assert(ws.sum === n.toLong)
    assert(vs.sameElements(vs.sorted))
    // O(k log(n/k)) items: generous bound 4k
    assert(vs.length <= 800, s"summary has ${vs.length} items")
  }

  test("rank error within epsilon across quantiles and partitionings") {
    val n = 40000
    val vals = Iterator.iterate(98765L)(x => x * 2862933555777941757L + 3037000493L)
      .take(n).map(x => (x >>> 20).toDouble).toSeq
    val sorted = vals.sorted.toArray
    for (parts <- Seq(1, 8)) {
      val (vs, ws, _) = summaryOf(vals, k = 200, parts = parts)
      for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val est = KllSummary.valueAtRank(vs, ws, q * (n - 1))
        // true rank of the estimate (first index >= est)
        val trueRank = {
          val i = java.util.Arrays.binarySearch(sorted, est)
          if (i >= 0) i else -i - 1
        }
        val err = math.abs(trueRank - q * (n - 1)) / n
        assert(err <= 0.03, s"q=$q parts=$parts rank error $err")
      }
    }
  }

  test("small inputs are exact (everything fits level 0)") {
    val vals = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    val (vs, ws, _) = summaryOf(vals, k = 200, parts = 2)
    assert(vs.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(ws.toSeq === Seq(1L, 1L, 1L, 1L, 1L))
  }

  test("all-equal values collapse to one value at any rank") {
    val (vs, ws, _) = summaryOf(Seq.fill(10000)(7.5), k = 64)
    assert(vs.forall(_ === 7.5))
    assert(ws.sum === 10000L)
    assert(KllSummary.valueAtRank(vs, ws, 0.0) === 7.5)
    assert(KllSummary.valueAtRank(vs, ws, 9999.0) === 7.5)
  }

  test("nulls are ignored, not counted") {
    val row = Seq(Some(1.0), None, Some(3.0), None)
      .toDF("v")
      .agg(KllSketch.kllSketch(col("v"), 64).as("s"))
      .head()
    assert(row.getSeq[Row](0).map(_.getLong(1)).sum === 2L)
  }

  test("SQL surface: kll_sketch registered") {
    Seq(1.0, 2.0, 3.0).toDF("v").createOrReplaceTempView("kll_spec_v")
    val items = spark.sql(
      "SELECT kll_sketch(v, 64) AS s FROM kll_spec_v")
      .head().getSeq[Row](0)
    assert(items.map(_.getDouble(0)) === Seq(1.0, 2.0, 3.0))
  }

  test("q111 band-refined quantiles equal the exact percentile aggregate") {
    val d = sf0001
    val viaSketch = Advanced.sketchQuantiles(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val exact = graft.operators.Tables.lineitem(spark, d)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(v, 0.1)"), 2).as("p10"),
        round(expr("percentile(v, 0.5)"), 2).as("p50"),
        round(expr("percentile(v, 0.9)"), 2).as("p90"),
        count(col("v")).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(viaSketch === exact)
  }

  test("q111 probe loop stays exact on duplicate-heavy and " +
      "outlier-heavy values (count jumps across a probe point; value-" +
      "midpoint bisection through 6-decades-skewed brackets)") {
    val tmp = java.nio.file.Files.createTempDirectory("kll_dup").toString
    graft.operators.Tables.lineitem(spark, sf0001)
      .withColumn("l_extendedprice",
        // a third collapses onto ONE value (massive multiplicity), a
        // third quantizes to 1000-steps (plateaus), a third blows up
        // ×10⁶ (outliers that skew any value-midpoint)
        when(col("l_orderkey") % 3 === 0, lit(100.0))
          .when(col("l_orderkey") % 3 === 1,
            floor(col("l_extendedprice") / 1000) * 1000.0)
          .otherwise(col("l_extendedprice") * 1000000.0))
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val viaSketch = Advanced.sketchQuantiles(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val exact = graft.operators.Tables.lineitem(spark, tmp)
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("v"))
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(v, 0.1)"), 2).as("p10"),
        round(expr("percentile(v, 0.5)"), 2).as("p50"),
        round(expr("percentile(v, 0.9)"), 2).as("p90"),
        count(col("v")).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(viaSketch === exact)
  }

  test("q111 empty input yields empty result with the right schema") {
    val tmp = java.nio.file.Files.createTempDirectory("kll_empty").toString
    graft.operators.Tables.lineitem(spark, sf0001).limit(0)
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Advanced.sketchQuantiles(spark, tmp)
    assert(out.columns.toSeq === Seq("l_returnflag", "p10", "p50", "p90", "n"))
    assert(out.count() === 0)
  }
}
