package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.AggregateKernels.{misraGries, topKByScore, vectorSum}
import graft.operators.Tables

/** Agreement specs for the custom typed-imperative aggregates: results must
  * match the window/explode formulations they replace, including tie-break
  * determinism, and must be invariant to partitioning (the partial-merge
  * path is exercised by repartitioning the input). */
class AggregateKernelSpec extends SparkTestBase {
  import spark.implicits._

  private val d = sf0001

  private def scored = {
    val v = Tables.embeddings(spark, d)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("emb"))
    val q = v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VectorFunctions.cosine(col("q_emb"), col("emb")), 6).as("sim"))
  }

  test("topk_by_score equals the ranking-window top-k, ties included") {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    val viaWindow = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rk"))
      .as[(Long, Long, Double, Int)].collect().toSet
    val viaAgg = scored
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), 5).as("nn"))
      .select(col("query_id"), posexplode(col("nn")))
      .select(col("query_id"), col("col.id"), col("col.score"),
        (col("pos") + 1).cast("int"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("topk_by_score is partitioning-invariant (partial merges exercised)") {
    val base = scored.groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), 5).as("nn"))
      .select(col("query_id"), col("nn"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    val repart = scored.repartition(13)
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("vec_id"), 5).as("nn"))
      .select(col("query_id"), col("nn"))
      .as[(Long, Seq[(Double, Long)])].collect().toMap
    assert(base === repart)
  }

  test("topk_by_score with fewer rows than k returns all, sorted") {
    val out = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (1L, 0.9, 9L))
      .toDF("g", "sim", "id")
      .groupBy(col("g")).agg(topKByScore(col("sim"), col("id"), 5).as("nn"))
      .select(col("nn")).as[Seq[(Double, Long)]].head()
    assert(out === Seq((0.9, 9L), (0.9, 11L), (0.5, 10L)))
  }

  test("topk_by_score: NaN scores rank last and never block better entries") {
    // NaN arrives first (while the heap is filling) — a naive < comparator
    // would leave it at the root rejecting everything after it
    val out = Seq((1L, Double.NaN, 1L), (1L, 0.2, 2L), (1L, 0.9, 3L),
      (1L, 0.5, 4L), (1L, Double.NaN, 5L))
      .toDF("g", "sim", "id")
      .groupBy(col("g")).agg(topKByScore(col("sim"), col("id"), 3).as("nn"))
      .select(col("nn")).as[Seq[(Double, Long)]].head()
    assert(out.map(_._2) === Seq(3L, 4L, 2L))
  }

  test("vector_sum equals the posexplode per-dimension sum") {
    val v = Tables.embeddings(spark, d)
      .select((col("vec_id") % 7).as("g"),
        VectorFunctions.asDouble(col("embedding")).as("emb"))
    val viaAgg = v.groupBy(col("g")).agg(vectorSum(col("emb")).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    val viaExplode = v.select(col("g"), posexplode(col("emb")))
      .groupBy(col("g"), col("pos")).agg(sum(col("col")).as("m"))
      .groupBy(col("g"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("s"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(viaAgg.keySet === viaExplode.keySet)
    viaAgg.foreach { case (g, s) =>
      val e = viaExplode(g)
      assert(s.length === e.length)
      s.zip(e).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
          s"group $g")
      }
    }
  }

  test("vector_sum of an empty group side is null, not an error") {
    val out = Seq((1L, Array(1.0, 2.0)), (1L, Array(3.0, 4.0)))
      .toDF("g", "v")
      .filter(col("g") === 2L)
      .groupBy(col("g")).agg(vectorSum(col("v")))
      .collect()
    assert(out.isEmpty) // no groups at all — and no runtime failure
  }

  test("misra_gries: every true heavy hitter survives, estimates bounded") {
    // zipf-ish: item i appears (50-i)^2 times, i in 0..49 — plus noise of
    // 2000 singletons; sketch capacity 20 « 2050 distinct items
    val rows = (0 until 50).flatMap(i =>
      Seq.fill((50 - i) * (50 - i))(s"hot$i")) ++
      (0 until 2000).map(i => s"noise$i")
    val df = rows.toDF("w").repartition(8)
    val got = df.agg(misraGries(col("w"), 20).as("mg"))
      .selectExpr("explode(mg) AS e").select("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    val n = rows.length
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // MG guarantee: f(x) >= est >= f(x) - n/(k+1)
    got.foreach { case (item, est) =>
      assert(est <= exact(item), item)
      assert(est >= exact(item) - n / 21, item)
    }
    // anything with f > n/(k+1) MUST be present
    exact.filter(_._2 > n / 21).keys.foreach(x => assert(got.contains(x), x))
  }

  test("misra_gries candidates are partitioning-invariant supersets") {
    val rows = (0 until 30).flatMap(i => Seq.fill(40 - i)(s"w$i"))
    val heavies = rows.groupBy(identity).filter(_._2.size > rows.length / 6)
      .keySet
    Seq(1, 3, 16).foreach { p =>
      val got = rows.toDF("w").repartition(p)
        .agg(misraGries(col("w"), 5).as("mg"))
        .selectExpr("explode(mg) AS e").select("e.item")
        .as[String].collect().toSet
      assert(heavies.subsetOf(got), s"partitions=$p")
    }
  }

  test("heavy-hitters pipeline equals plain exact group-by-and-filter") {
    val d = sf0001
    val exact = graft.operators.Tables.documents(spark, d)
      .select(explode(expr("filter(split(text, ' '), x -> x != '')"))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum(col("cnt")).over())
      .filter(col("cnt") > col("n") * 0.01)
      .select(col("word"), col("cnt"))
    val got = graft.operators.TextQueries.heavyHitters(spark, d)
      .select(col("word"), col("cnt"))
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
  }

  test("aggregates are callable from SQL") {
    Seq((1L, 0.3, 7L), (1L, 0.8, 8L)).toDF("g", "sim", "id")
      .createOrReplaceTempView("agg_t")
    val r = spark.sql(
      "SELECT topk_by_score(sim, id, 1) AS nn FROM agg_t GROUP BY g")
      .as[Seq[(Double, Long)]].head()
    assert(r === Seq((0.8, 8L)))
    Seq((Array(1.0, 2.0)), (Array(3.0, 4.0))).toDF("v")
      .createOrReplaceTempView("agg_v")
    val v = spark.sql("SELECT vector_sum(v) AS s FROM agg_v")
      .as[Seq[Double]].head()
    assert(v === Seq(4.0, 6.0))
  }

  test("moment_matrix equals the outer-product explode formulation " +
      "cell-for-cell and is partitioning-invariant") {
    val rows = Tables.embeddings(spark, d)
      .select(VectorFunctions.asDouble(col("embedding")).as("e"))
    // reference: the q212 pre-kernel SQL path (posexplode + scaled sums)
    val ref = rows
      .select(size(col("e")).as("dm"),
        posexplode(flatten(transform(col("e"), x =>
          transform(col("e"), y => x * y)))).as(Seq("p", "xy")))
      .select(col("dm"), col("p"), floor(col("xy") * 1e9).as("t"))
      .groupBy(floor(col("p") / col("dm")).cast("int").as("i"),
        pmod(col("p"), col("dm")).cast("int").as("j"))
      .agg(sum(expr("t div 1000000000")).as("shi"),
        sum(expr("t % 1000000000")).as("slo"),
        count(lit(1)).as("n"))
      .select(col("i"), col("j"),
        // compare the exact TOTAL, not the (hi, lo) split — the kernel
        // carries lo into hi eagerly, the SQL path doesn't
        (col("shi").cast("decimal(38,0)") * 1000000000L + col("slo"))
          .as("tot"), col("n"))
    def kernel(df: org.apache.spark.sql.DataFrame) = df
      .agg(AggregateKernels.momentMatrix(col("e")).as("m"))
      .select(explode(col("m")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"),
        (col("c.shi").cast("decimal(38,0)") * 1000000000L + col("c.slo"))
          .as("tot"), col("c.n").as("n"))
    val k1 = kernel(rows).collect().map(r => (r.getInt(0), r.getInt(1),
      r.getDecimal(2), r.getLong(3))).sortBy(t => (t._1, t._2))
    val k2 = kernel(rows.repartition(7)).collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getDecimal(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val rf = ref.collect().map(r => (r.getInt(0), r.getInt(1),
      r.getDecimal(2), r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(k1.length === rf.length && k1.length === 64 * 64)
    assert(k1.toSeq === rf.toSeq)   // kernel ≡ SQL formulation, exactly
    assert(k1.toSeq === k2.toSeq)   // partial-merge path changes nothing
  }

  test("moment_matrix lo-to-hi carrying survives adversarial inputs " +
      "(values that push |lo| past 1e9 every few rows)") {
    // each row's self-product scales to ~0.9e9, so lo crosses the carry
    // threshold constantly; the exact total must still match a direct
    // BigInt sum of the per-row quantized products
    val xs = Seq.fill(200)(Array(0.95, -0.97))
    val df = xs.toDF("e").select(col("e").cast("array<double>").as("e"))
    val out = df.agg(AggregateKernels.momentMatrix(col("e")).as("m"))
      .select(explode(col("m")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.shi"), col("c.slo"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        BigInt(r.getLong(2)) * 1000000000L + r.getLong(3))).toMap
    for (i <- 0 until 2; j <- 0 until 2) {
      val expected = xs.map { a =>
        BigInt(math.floor(a(i) * a(j) * 1e9).toLong)
      }.sum
      assert(out((i, j)) === expected, s"cell ($i, $j)")
    }
  }

  test("moment_matrix ignores empty arrays in any arrival order and " +
      "across partial merges") {
    // empty-first, empty-last, and an all-empty partition (absorb with
    // d == 0 on one side) must all yield the same 2x2 matrix with n = 3
    def run(xs: Seq[Array[Double]], parts: Int) = {
      val df = xs.toDF("e")
        .select(col("e").cast("array<double>").as("e"))
        .repartition(parts)
      df.agg(AggregateKernels.momentMatrix(col("e")).as("m"))
        .select(explode(col("m")).as("c"))
        .select(col("c.i"), col("c.j"), col("c.shi"), col("c.slo"),
          col("c.n"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)),
          (BigInt(r.getLong(2)) * 1000000000L + r.getLong(3),
            r.getLong(4)))).toMap
    }
    val nonEmpty = Seq(Array(0.5, 1.0), Array(-0.25, 2.0), Array(1.5, 0.5))
    val base = run(nonEmpty, 1)
    assert(base((0, 0))._2 === 3L)
    for (mixed <- Seq(
        Array[Double]() +: nonEmpty,            // empty first
        nonEmpty :+ Array[Double](),            // empty last
        Array[Double]() +: nonEmpty :+ Array[Double]());
      parts <- Seq(1, 4)) {                     // 4 → some all-empty parts
      assert(run(mixed, parts) === base,
        s"mixed=${mixed.map(_.length).mkString(",")} parts=$parts")
    }
  }

  test("argmax_tie_min_id equals max_by(id, struct(score, -id)) and is " +
      "partitioning-invariant") {
    for (parts <- Seq(1, 7)) {
      val rows = scored.repartition(parts)
      val viaMaxBy = rows.groupBy(col("query_id"))
        .agg(expr("max_by(vec_id, struct(sim, -vec_id))").as("best"))
        .as[(Long, Long)].collect().toMap
      val viaKernel = rows.groupBy(col("query_id"))
        .agg(AggregateKernels.argMaxTieMinId(col("sim"), col("vec_id"))
          .as("best"))
        .as[(Long, Long)].collect().toMap
      assert(viaKernel === viaMaxBy, s"parts=$parts")
    }
  }

  test("argmax_tie_min_id skips null score/id rows and evaluates an " +
      "empty group to null, never the internal sentinel") {
    // (group, score, id): g=1 mixes null ids/scores with real rows;
    // g=2 has ONLY null-id rows (empty group after the skip); g=3's
    // single qualifying row carries score -Inf (still a real row)
    val df = Seq[(Int, Option[Double], Option[Long])](
      (1, Some(5.0), None),                     // best score but null id
      (1, Some(3.0), Some(30L)), (1, Some(3.0), Some(10L)),
      (1, None, Some(1L)),                      // null score
      (2, Some(9.0), None), (2, None, Some(7L)),
      (3, Some(Double.NegativeInfinity), Some(42L))
    ).toDF("g", "score", "id")
    for (parts <- Seq(1, 5)) {
      val got = df.repartition(parts).groupBy(col("g"))
        .agg(AggregateKernels.argMaxTieMinId(col("score"), col("id"))
          .as("best"))
        .collect()
        .map(r => r.getInt(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(got === Map(1 -> Some(10L), 2 -> None, 3 -> Some(42L)),
        s"parts=$parts")
      assert(!got.values.flatten.exists(_ == Long.MaxValue))
    }
  }

  test("argmax_tie_min_id selects a (-Inf, Long.MaxValue) row exactly " +
      "like max_by — the old sentinel encoding's blind spot") {
    // round-11 advice: inferring emptiness from the buffer value made
    // a group of only (score = -Inf, id = Long.MaxValue) rows evaluate
    // to null; the explicit `seen` slot selects them like max_by does
    val df = Seq[(Int, Double, Long)](
      (1, Double.NegativeInfinity, Long.MaxValue), // the only row wins
      (2, Double.NegativeInfinity, Long.MaxValue),
      (2, Double.NegativeInfinity, 5L),            // tie → lowest id
      (3, 1.0, Long.MaxValue)
    ).toDF("g", "score", "id")
    for (parts <- Seq(1, 4)) {
      val rows = df.repartition(parts)
      val viaKernel = rows.groupBy(col("g"))
        .agg(AggregateKernels.argMaxTieMinId(col("score"), col("id"))
          .as("best"))
        .as[(Int, Long)].collect().toMap
      val viaMaxBy = rows.groupBy(col("g"))
        .agg(expr("max_by(id, struct(score, -id))").as("best"))
        .as[(Int, Long)].collect().toMap
      assert(viaKernel === viaMaxBy, s"parts=$parts")
      assert(viaKernel === Map(1 -> Long.MaxValue, 2 -> 5L,
        3 -> Long.MaxValue), s"parts=$parts")
    }
  }
}
