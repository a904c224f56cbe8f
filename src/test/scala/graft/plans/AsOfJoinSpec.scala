package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The native as-of join (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec)
  * pinned to a composed built-in formulation (union + running window), plus
  * the plan-shape and partitioning-invariance properties the custom
  * operator must hold. Value-level cross-engine correctness is q74's
  * DuckDB ASOF LEFT JOIN oracle. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def trades = Seq(
    // (key, time, qty)
    ("aa", 10L, 1), ("aa", 25L, 2), ("aa", 31L, 3),
    ("bb", 5L, 4), ("bb", 40L, 5),
    ("cc", 7L, 6) // no quotes for cc at all
  ).toDF("sym", "t", "qty")

  private def quotes = Seq(
    ("aa", 8L, 1.0), ("aa", 25L, 2.0), ("aa", 30L, 3.0),
    ("bb", 50L, 4.0), // only after bb's trades end
    ("dd", 1L, 9.9) // key absent on the left
  ).toDF("sym", "qt", "px")

  test("hand-checked semantics: latest quote at-or-before, else null") {
    val got = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q")
      .select($"sym", $"t", $"qty", $"qt_q", $"px_q")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(got === Set(
      ("aa", 10L, Some(8L), Some(1.0)),
      ("aa", 25L, Some(25L), Some(2.0)), // tie: <= includes equal time
      ("aa", 31L, Some(30L), Some(3.0)),
      ("bb", 5L, None, None), // quote exists but only later
      ("bb", 40L, None, None),
      ("cc", 7L, None, None))) // key missing entirely
  }

  test("tolerance: too-distant nearest rows null-extend in both directions") {
    // backward with tolerance 5: aa@10 matches quote@8 (gap 2); aa@31's
    // nearest is @30 (gap 1, in); aa@25 matches @25 (gap 0); widen the
    // gap by using tolerance 1 → @10 loses its match, @31 keeps it
    val got = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q",
        toleranceUnits = Some(1L))
      .select($"sym", $"t", $"qt_q")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got === Set(
      ("aa", 10L, None), // nearest @8, gap 2 > 1
      ("aa", 25L, Some(25L)),
      ("aa", 31L, Some(30L)),
      ("bb", 5L, None), ("bb", 40L, None), ("cc", 7L, None)))
    // forward with tolerance 2: bb@5's nearest future quote decides
    val fwd = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q",
        forward = true, toleranceUnits = Some(2L))
      .select($"sym", $"t", $"qt_q")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    // every match must be within 2 units ahead
    fwd.foreach { case (_, t, q) =>
      q.foreach(qt => assert(qt >= t && qt - t <= 2, s"($t, $qt)"))
    }
    // and tolerance=unbounded reproduces the plain forward join
    val plain = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q",
        forward = true)
      .select($"sym", $"t", $"qt_q")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    val loose = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q",
        forward = true, toleranceUnits = Some(Long.MaxValue))
      .select($"sym", $"t", $"qt_q")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(loose === plain)
  }

  test("agrees with the composed union+window formulation on real data") {
    val ev = graft.operators.Tables.events(spark, sf0001).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"), col("value"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts_ms")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts_ms")
      .agg(round(max($"value"), 2).as("view_value"))

    val native = AsOf.join(clicks, views, Seq("user_id"), "ts_ms", "ts_ms", "_v")
      .select($"event_id", $"user_id", $"ts_ms",
        $"ts_ms_v".as("view_ms"), $"view_value_v".as("view_value"))

    // reference: union both sides, carry the latest view forward with a
    // running last() — view rows sort before click rows on time ties so
    // `<=` semantics fall out of the ordering
    val tagged = views.select($"user_id", $"ts_ms", lit(null).cast("long").as("event_id"),
        lit(1).as("is_view"), $"view_value")
      .unionByName(clicks.select($"user_id", $"ts_ms", $"event_id",
        lit(0).as("is_view"), lit(null).cast("double").as("view_value")))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts_ms", $"is_view".desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = tagged
      .withColumn("vm", last(when($"is_view" === 1, $"ts_ms"), true).over(w))
      .withColumn("vv", last(when($"is_view" === 1, $"view_value"), true).over(w))
      .filter($"is_view" === 0)
      .select($"event_id", $"user_id", $"ts_ms",
        $"vm".as("view_ms"), $"vv".as("view_value"))

    assert(native.exceptAll(expected).isEmpty &&
      expected.exceptAll(native).isEmpty)
    assert(native.count() === clicks.count()) // left outer: every click kept
  }

  test("plans as AsOfJoinExec fed by exchanges+sorts on the keys") {
    val df = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q")
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(2000))
    assert(p.contains("Sort ["), p.take(2000))
  }

  test("result is invariant to input partitioning") {
    val base = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q").collect().toSet
    val shuffled = AsOf.join(
      trades.repartition(7, $"qty"), quotes.repartition(3, $"px"),
      Seq("sym"), "t", "qt", "_q").collect().toSet
    assert(shuffled === base)
  }

  test("null keys and null times never match but left rows survive") {
    val l = Seq((Some("a"), Some(10L), 1), (None, Some(10L), 2),
      (Some("a"), None, 3)).toDF("k", "t", "id")
    val r = Seq((Some("a"), Some(5L), 7.0), (None, Some(1L), 8.0),
      (Some("a"), None, 9.0)).toDF("k", "t", "v")
    val got = AsOf.join(l, r, Seq("k"), "t", "t", "_r")
      .select($"id", $"v_r").collect()
      .map(x => (x.getInt(0), Option(x.get(1)))).toSet
    assert(got === Set((1, Some(7.0)), (2, None), (3, None)))
  }

  test("self-join (same plan on both sides) resolves and is correct") {
    val df = Seq(("a", 1L, 10), ("a", 2L, 20), ("a", 3L, 30))
      .toDF("k", "t", "v")
    // each row joined to itself: max t' <= t within same key is t
    val got = AsOf.join(df, df, Seq("k"), "t", "t")
      .select($"t", $"t_r", $"v_r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 1L, 10), (2L, 2L, 20), (3L, 3L, 30)))
  }

  test("forward direction: earliest quote at-or-after, head not consumed") {
    val got = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q",
      forward = true)
      .select($"sym", $"t", $"qt_q").collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    assert(got === Set(
      ("aa", 10L, Some(25L)),
      ("aa", 25L, Some(25L)), // tie: >= includes equal time
      ("aa", 31L, None), // no quote after 31
      ("bb", 5L, Some(50L)), // one late quote serves BOTH bb trades
      ("bb", 40L, Some(50L)),
      ("cc", 7L, None)))
  }

  test("strict variants exclude equal times in both directions") {
    val back = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q",
      strict = true)
      .filter($"t" === 25L).select($"qt_q").head()
    assert(back.getLong(0) === 8L) // not the equal-time 25 quote
    val fwd = AsOf.join(trades, quotes, Seq("sym"), "t", "qt", "_q",
      forward = true, strict = true)
      .filter($"t" === 25L).select($"qt_q").head()
    assert(fwd.getLong(0) === 30L) // skips the equal-time 25 quote
  }

  test("forward agrees with a composed min-over-future formulation") {
    val ev = graft.operators.Tables.events(spark, sf0001).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_millis(col("ts")).as("ts_ms"))
    val native = graft.operators.Relational.asofJoinForward(spark, sf0001)
      .select($"event_id", $"next_purchase_ms")
    val expected = ev.filter($"event_type" === "error")
      .as("e")
      .join(ev.filter($"event_type" === "purchase").select(
        $"user_id".as("pu"), $"ts_ms".as("pts")),
        $"user_id" === $"pu" && $"pts" >= $"ts_ms", "left_outer")
      .groupBy($"event_id")
      .agg(min($"pts").as("next_purchase_ms"))
    assert(native.exceptAll(expected).isEmpty &&
      expected.exceptAll(native).isEmpty)
  }

  test("mismatched key/time types are refused, not silently mis-joined") {
    val l = Seq((1, 10L)).toDF("k", "t") // k: int
    val r = Seq((1L, 5L, "x")).toDF("k", "t", "v") // k: bigint
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k"), "t", "t")
    }
    assert(e.getMessage.contains("common type"))
    val l2 = Seq((1L, 10L)).toDF("k", "t")
    val r2 = Seq((1L, 5.0, "x")).toDF("k", "t", "v") // t: double
    assert(intercept[IllegalArgumentException] {
      AsOf.join(l2, r2, Seq("k"), "t", "t")
    }.getMessage.contains("common type"))
  }

  test("multi-column keys cluster correctly") {
    val l = Seq(("a", 1, 10L), ("a", 2, 10L), ("b", 1, 10L))
      .toDF("k1", "k2", "t")
    val r = Seq(("a", 1, 5L, "m1"), ("a", 2, 6L, "m2"), ("b", 2, 1L, "m3"))
      .toDF("k1", "k2", "t", "tag")
    val got = AsOf.join(l, r, Seq("k1", "k2"), "t", "t")
      .select($"k1", $"k2", $"tag_r").collect()
      .map(x => (x.getString(0), x.getInt(1), Option(x.getString(2)))).toSet
    assert(got === Set(("a", 1, Some("m1")), ("a", 2, Some("m2")),
      ("b", 1, None)))
  }

  // ------------------------------------------------------- SQL TVF surface

  test("SQL asof_join TVF matches the DataFrame API (backward)") {
    trades.createOrReplaceTempView("asof_spec_trades")
    quotes.createOrReplaceTempView("asof_spec_quotes")
    val viaSql = spark.sql(
      "SELECT sym, t, qty, qt_r, px_r FROM asof_join(" +
        "'asof_spec_trades', 'asof_spec_quotes', 'sym', 't', 'qt')")
    val viaApi = AsOf.join(trades, quotes, Seq("sym"), "t", "qt")
      .select($"sym", $"t", $"qty", $"qt_r", $"px_r")
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    assert(viaSql.count() === trades.count())
  }

  test("SQL asof_join TVF honors direction and strict arguments") {
    trades.createOrReplaceTempView("asof_spec_trades")
    quotes.createOrReplaceTempView("asof_spec_quotes")
    def run(dir: String, strict: Boolean) = spark.sql(
      s"SELECT sym, t, qt_r FROM asof_join('asof_spec_trades', " +
        s"'asof_spec_quotes', 'sym', 't', 'qt', '$dir', $strict)")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toSet
    // forward: earliest quote at-or-after each trade
    assert(run("forward", strict = false) === Set(
      ("aa", 10L, Some(25L)), ("aa", 25L, Some(25L)), ("aa", 31L, None),
      ("bb", 5L, Some(50L)), ("bb", 40L, Some(50L)), ("cc", 7L, None)))
    // strict backward: the t=25 tie no longer matches itself
    assert(run("backward", strict = true).contains(("aa", 25L, Some(8L))))
  }

  test("SQL asof_join TVF refuses bad arguments at analysis time") {
    trades.createOrReplaceTempView("asof_spec_trades")
    quotes.createOrReplaceTempView("asof_spec_quotes")
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM asof_join('asof_spec_trades', 'asof_spec_quotes', " +
        "'sym', 't', 'qt', 'sideways')").collect())
      .getMessage.contains("direction"))
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM asof_join('asof_spec_trades', 'asof_spec_quotes', " +
        "'nope', 't', 'qt')").collect())
      .getMessage.contains("no column"))
  }
}
