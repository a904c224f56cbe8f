package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.operators.Tables

/** Streaming-mode specs: the file-source pipeline (sense/claim/process
  * parity), watermarked windowed aggregation, and stateful sessionization —
  * all driven synchronously with processAllAvailable. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): Path =
    Files.createTempDirectory(prefix)

  test("file-source stream: one micro-batch per file, both branches written, source archived") {
    val in = tmp("stream-in"); val out = tmp("stream-out")
    val ckpt = tmp("stream-ckpt"); val arch = tmp("stream-arch")
    Files.copy(
      java.nio.file.Paths.get(resource("food_daily.csv")),
      in.resolve("food_daily_1.csv"))

    val q = FoodOrdersStream.start(spark, in.toString, out.toString,
      ckpt.toString, arch.toString, Trigger.AvailableNow())
    q.awaitTermination(120000)

    val del = spark.read.parquet(s"$out/branch=delivered")
    val oth = spark.read.parquet(s"$out/branch=other")
    assert(del.count() === 869)
    assert(oth.count() === 22)

    // restart with a second file: only the new file is processed (offsets
    // checkpointed — the exactly-once claim the reference approximates by
    // move-to-processed)
    Files.copy(
      java.nio.file.Paths.get(resource("food_daily.csv")),
      in.resolve("food_daily_2.csv"))
    val q2 = FoodOrdersStream.start(spark, in.toString, out.toString,
      ckpt.toString, arch.toString, Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$out/branch=delivered").count() === 2 * 869)
  }

  test("kill-restart exactly-once: a crash AFTER the sink write but " +
      "BEFORE the checkpoint commit neither duplicates nor loses a row " +
      "across the two output tables") {
    val in = tmp("eo-in"); val out = tmp("eo-out")
    val ckpt = tmp("eo-ckpt"); val arch = tmp("eo-arch")
    // three files → three micro-batches (maxFilesPerTrigger=1)
    (1 to 3).foreach { i =>
      Files.copy(java.nio.file.Paths.get(resource("food_daily.csv")),
        in.resolve(s"food_daily_$i.csv"))
    }
    // kill mid-protocol on batch 1: the injected failure fires after
    // writeTaggedIdempotent returned (batch-1 rows ARE on disk) and
    // before Spark records the batch commit — the exact at-least-once
    // window a process kill can land in
    val q1 = FoodOrdersStream.start(spark, in.toString, out.toString,
      ckpt.toString, arch.toString, Trigger.AvailableNow(),
      failAfterSinkWrite = _ == 1L)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination(120000); q1.processAllAvailable()
    }
    // the crashed batch's output is on disk right now — restart must
    // CONVERGE on it, not stack a second copy
    val midDelivered = spark.read.parquet(s"$out/branch=delivered").count()
    assert(midDelivered === 2 * 869L,
      s"batches 0 and 1 both written pre-crash, got $midDelivered")

    // restart with the SAME checkpoint: batch 1 re-runs (it never
    // committed) and its dynamic-overwrite rewrites its own batch_id
    // partitions; batch 2 runs fresh
    val q2 = FoodOrdersStream.start(spark, in.toString, out.toString,
      ckpt.toString, arch.toString, Trigger.AvailableNow())
    q2.awaitTermination(120000)

    val del = spark.read.parquet(s"$out/branch=delivered")
    val oth = spark.read.parquet(s"$out/branch=other")
    // exactly once: 3 files × (869 delivered + 22 other), no dup, no loss
    assert(del.count() === 3 * 869L)
    assert(oth.count() === 3 * 22L)
    // the re-run converged INTO the crashed batch's partitions: exactly
    // one batch_id per input file across both branches
    val batchIds = spark.read.parquet(out.toString)
      .select("batch_id").distinct().as[Long].collect().sorted
    assert(batchIds.toSeq === Seq(0L, 1L, 2L))
    // and per-batch uniqueness — the re-run batch holds exactly one
    // file's worth of rows, not two attempts' worth
    val perBatch = del.groupBy(col("batch_id")).count()
      .as[(Long, Long)].collect().toMap
    assert(perBatch === Map(0L -> 869L, 1L -> 869L, 2L -> 869L))
  }

  test("watermarked windowed aggregation over a streamed events table") {
    val src = tmp("ev-src")
    // stage sf0.001 events (ts already micros) as the streaming source
    Tables.events(spark, sf0001).write.mode("overwrite")
      .parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)

    val q = FoodOrdersStream.windowedEventCounts(stream)
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    // append mode only emits watermark-closed windows; batch equivalent
    // bounds it above
    val streamed = spark.table("wincounts")
    val batch = Tables.events(spark, sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() <= batch.count())
    assert(streamed.count() > 0)
    // every emitted (window, type, n) matches the batch computation
    val joined = streamed.select(col("window_start"), col("event_type"), col("n"))
      .join(batch.select(col("window.start").as("window_start"),
        col("event_type"), col("n").as("n_batch")),
        Seq("window_start", "event_type"))
    assert(joined.filter(col("n") =!= col("n_batch")).count() === 0)
  }

  test("streaming dedup within watermark drops duplicate event ids") {
    val src = tmp("dedup-src")
    val ev = Tables.events(spark, sf0001)
    // duplicate the whole table: every event_id appears twice in the stream
    ev.unionAll(ev).write.mode("overwrite").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)

    val q = FoodOrdersStream.dedupEvents(stream)
      .writeStream.format("memory").queryName("dedup_ev")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val n = spark.table("dedup_ev").count()
    val distinct = ev.select("event_id").distinct().count()
    assert(n === distinct, s"streamed $n vs distinct $distinct")
  }

  test("hopping windows: the q73 plan runs as a watermarked streaming aggregation") {
    val src = tmp("hop-src")
    Tables.events(spark, sf0001).write.mode("overwrite").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)

    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("ws_ms"),
        col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("hopwin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val streamed = spark.table("hopwin")
    assert(streamed.count() > 0)
    val batch = graft.operators.Advanced.hoppingWindows(spark, sf0001)
      .select(col("ws_ms"), col("event_type"), col("n").as("n_batch"))
    // append mode emits only watermark-closed windows; each must equal batch
    val mismatched = streamed.join(batch, Seq("ws_ms", "event_type"))
      .filter(col("n") =!= col("n_batch")).count()
    assert(mismatched === 0)
    assert(streamed.join(batch, Seq("ws_ms", "event_type"), "left_anti")
      .count() === 0)
  }

  test("streaming near-dup probe: arriving docs flag against the frozen " +
      "registry, stream equals batch on the distinct pair set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val common = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val registry = graft.dedup.Dedup.neardupRegistryDf(Seq(
      (1L, common),
      (2L, "registry corpus spark shuffle partition codegen exchange " +
        "broadcast whole stage wholestage pipeline")
    ).toDF("doc_id", "text")).localCheckpoint()
    val arriving = Seq(
      (100L, common.replace("tonight", "today")),   // near-dup of 1
      (101L, "wholly unrelated arriving document body with fresh tokens"),
      (102L, common)                                // exact dup of 1
    )
    // batch parity arm
    val batchPairs = StreamingNeardup.matches(
        arriving.toDF("doc_id", "text"), registry)
      .select($"doc_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((100L, 1L), (102L, 1L)), s"got $batchPairs")
    // streaming arm: two triggers, same distinct pair set
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingNeardup.matches(
        input.toDS().toDF("doc_id", "text"), registry)
      .writeStream.format("memory").queryName("snearly")
      .outputMode("append").start()
    input.addData(arriving.take(1))
    q.processAllAvailable()
    input.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("snearly")
      .select($"doc_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(streamed === batchPairs,
      "stream must equal batch on the distinct matched-pair set")
    val jacs = spark.table("snearly").select($"doc_id", $"jac")
      .as[(Long, Double)].collect().toMap
    assert(jacs(102L) === 1.0, "the exact dup scores jaccard 1")
    assert(jacs(100L) >= 0.6 && jacs(100L) < 1.0)
  }

  test("streaming near-dedup drops simhash-equal docs within the watermark") {
    val src = tmp("neardup-src")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    Seq(
      (1L, "spark shuffles data between stages", ts(0)),
      (2L, "between stages spark shuffles data data", ts(1)), // same token SET
      (3L, "a completely different document body", ts(2)),
      (4L, "spark shuffles data between stages", ts(3))       // exact dup
    ).toDF("doc_id", "text", "ts").write.mode("overwrite").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)

    val q = FoodOrdersStream.dedupNearSimhash(stream)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val kept = spark.table("neardup").select("doc_id")
      .as[Long].collect().toSet
    // docs 1, 2, 4 share one near-dup class (same token SET) → exactly one
    // survivor (which one is arrival-order within the micro-batch, not
    // guaranteed); doc 3 is its own class and must survive
    assert(kept.contains(3L), s"kept=$kept")
    assert(kept.size === 2, s"kept=$kept")
    assert((kept - 3L).subsetOf(Set(1L, 2L, 4L)), s"kept=$kept")
  }

  test("stream-stream interval join equals the batch join") {
    val src = tmp("ssj-src")
    Tables.events(spark, sf0001).write.mode("overwrite")
      .parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)

    val q = FoodOrdersStream.purchaseErrorJoin(stream)
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val streamed = spark.table("ssj")
      .select("purchase_id", "error_id").as[(Long, Long)].collect().toSet
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("e_ts"))
    val batch = p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr("INTERVAL 30 MINUTES"))
      .select("purchase_id", "error_id").as[(Long, Long)].collect().toSet
    assert(batch.nonEmpty, "fixture should produce purchase→error matches")
    assert(streamed === batch)
  }

  test("event-time sessionization closes sessions via the watermark") {
    val src = tmp("sess-et-src")
    Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"))
      .write.mode("overwrite").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)
      .withWatermark("ts", "1 minute")
      .as[Sessionize.EventT]

    val q = Sessionize.streamingEventTime(stream)
      .writeStream.format("memory").queryName("sessions_et")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val batchSessions = Sessionize.batch(spark, sf0001)
      .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val streamed = spark.table("sessions_et")
      .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batchSessions),
      s"event-time sessions not in batch: ${(streamed -- batchSessions).take(3)}")
  }

  test("streaming sessionization agrees with the batch window-function form") {
    val batchSessions = Sessionize.batch(spark, sf0001)
      .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val src = tmp("sess-src")
    Tables.events(spark, sf0001)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
      .write.mode("overwrite").parquet(src.toString)
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema).parquet(src.toString)
      .as[Sessionize.Event]

    val q = Sessionize.streaming(stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    q.stop()

    val streamed = spark.table("sessions")
      .select(col("user_id"), col("session_start_ms"), col("session_end_ms"),
        col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet

    // open sessions at end-of-stream aren't emitted in append mode; every
    // emitted (closed) session must be a batch session
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batchSessions),
      s"streaming emitted sessions not in batch: ${streamed -- batchSessions}")
  }

  test("streaming CDC apply: latest version per key wins across triggers, replay converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmp("cdc-tbl").toString + "/t"
    val ckpt = tmp("cdc-ckpt").toString
    val input = MemoryStream[(Long, Long, String)](spark)
    val changes = input.toDS().toDF("k", "v", "payload")

    input.addData(Seq((1L, 1L, "a1"), (2L, 1L, "b1"), (3L, 1L, "c1")))
    val q1 = CdcStream.start(changes, path, "k", "v", ckpt)
    q1.awaitTermination(120000)
    // second trigger: update k=1, delete-style tombstone NOT modeled —
    // a new key and a LATE (lower-version) change for k=2 that must lose
    input.addData(Seq((1L, 2L, "a2"), (2L, 0L, "b0"), (4L, 1L, "d1")))
    val q2 = CdcStream.start(changes, path, "k", "v", ckpt)
    q2.awaitTermination(120000)

    def state() = spark.read.parquet(path)
      .select($"k", $"v", $"payload").as[(Long, Long, String)]
      .collect().toSet
    val expected = Set((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1"),
      (4L, 1L, "d1"))
    assert(state() === expected)

    // replayed micro-batch (sink ran, checkpoint commit lost): the
    // idempotent merge must converge, not duplicate or regress
    graft.pipeline.Sink.upsertByKey(spark,
      Seq((1L, 2L, "a2"), (2L, 0L, "b0"), (4L, 1L, "d1"))
        .toDF("k", "v", "payload"),
      path, "k", "v")
    assert(state() === expected)
  }

  test("streaming dedup registry: first doc wins across triggers, replay converges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmp("dedup-reg").toString + "/t"
    val ckpt = tmp("dedup-ckpt").toString
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDS().toDF("doc_id", "text")

    // trigger 1: two uniques, one in-batch duplicate (doc 3 repeats doc 1)
    input.addData(Seq((1L, "alpha text"), (2L, "beta text"),
      (3L, "alpha text")))
    StreamingDedup.start(docs, path, ckpt).awaitTermination(120000)
    // trigger 2: a cross-trigger duplicate (doc 4 = doc 2's content,
    // must LOSE to the earlier keeper) and one new unique
    input.addData(Seq((4L, "beta text"), (5L, "gamma text")))
    StreamingDedup.start(docs, path, ckpt).awaitTermination(120000)

    def registry() = spark.read.parquet(path)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    val expected = Set((1L, "alpha text"), (2L, "beta text"),
      (5L, "gamma text"))
    assert(registry() === expected)

    // replayed micro-batch (sink ran, checkpoint commit lost): converge
    graft.pipeline.Sink.upsertByKey(spark,
      StreamingDedup.address(
        Seq((4L, "beta text"), (5L, "gamma text")).toDF("doc_id", "text")),
      path, "h", "neg_id")
    assert(registry() === expected)
  }

  test("streaming heavy hitters: state accumulates across triggers, MG guarantees hold") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[String](spark)
    val q = StreamingSketch
      .streamingHeavyHitters(input.toDS(), shards = 4, k = 32)
      .writeStream.format("memory").queryName("shh")
      .outputMode("update").start()
    try {
      // two triggers: hot items split across both, noise around them —
      // state must carry counts across the trigger boundary
      val batch1 = (0 until 150).map(_ => "alpha") ++
        (0 until 90).map(_ => "beta") ++ (0 until 200).map(i => s"n1_$i")
      val batch2 = (0 until 150).map(_ => "alpha") ++
        (0 until 110).map(_ => "beta") ++ (0 until 200).map(i => s"n2_$i")
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()

      // latest summary per shard = the row with that shard's max n
      val rows = spark.table("shh")
        .as[StreamingSketch.ShardSummary].collect()
      val latest = rows.groupBy(_.shard).values.map(_.maxBy(_.n)).toSeq
      val got = latest.flatMap(_.items).toMap
      val all = batch1 ++ batch2
      assert(latest.map(_.n).sum === all.size)
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // estimates never exceed truth; per-shard error bound n_shard/(k+1)
      got.foreach { case (w, est) => assert(est <= exact(w), w) }
      val nByShard = latest.map(s => s.shard -> s.n).toMap
      def shardOf(w: String) = math.floorMod(w.hashCode, 4)
      Seq("alpha" -> 300L, "beta" -> 200L).foreach { case (w, f) =>
        val bound = nByShard(shardOf(w)) / 33
        assert(got.contains(w), s"$w missing (f=$f, bound=$bound)")
        assert(got(w) >= f - bound, s"$w est=${got(w)}")
      }
    } finally q.stop()
  }

  test("stream-static enrichment: dimension broadcasts into each trigger, " +
    "unmatched events survive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, Double)](spark)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = Enrich.withDimension(
      input.toDS().toDF("user_id", "value"), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      input.addData((2L, 20.0))
      q.processAllAvailable()
      val got = spark.table("enrich")
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          Option(r.getString(2)))).toSet
      assert(got === Set((1L, 10.0, Some("gold")), (3L, 30.0, None),
        (2L, 20.0, Some("silver"))))
      // the join must broadcast the dimension, not shuffle (each
      // micro-batch plans exactly like this batch equivalent)
      val p = Enrich.withDimension(
        Seq((1L, 1.0)).toDF("user_id", "value"), dim, Seq("user_id"))
        .queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p.take(2000))
    } finally q.stop()
  }

  test("streaming quantiles: KLL state accumulates across triggers, " +
    "rank error bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Double)](spark)
    val q = StreamingSketch.streamingQuantiles(input.toDS(), k = 200)
      .writeStream.format("memory").queryName("skq")
      .outputMode("update").start()
    try {
      // deterministic LCG values on two keys, split across two triggers —
      // state must carry the first trigger's distribution into the second
      def vals(seed: Long, n: Int): Seq[Double] =
        Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
          .take(n).map(x => (x >>> 40).toDouble).toSeq
      val a = vals(1L, 4000)
      val b = vals(2L, 3000)
      input.addData(a.take(2000).map("a" -> _) ++ b.take(1500).map("b" -> _))
      q.processAllAvailable()
      input.addData(a.drop(2000).map("a" -> _) ++ b.drop(1500).map("b" -> _))
      q.processAllAvailable()

      val latest = spark.table("skq")
        .as[StreamingSketch.KeyQuantiles].collect()
        .groupBy(_.key).values.map(_.maxBy(_.n)).map(s => s.key -> s).toMap
      assert(latest("a").n === 4000L && latest("b").n === 3000L)
      for ((key, data) <- Seq("a" -> a, "b" -> b)) {
        val sorted = data.sorted.toArray
        for ((p, est) <- Seq(0.5 -> latest(key).p50,
          0.95 -> latest(key).p95, 0.99 -> latest(key).p99)) {
          val i = java.util.Arrays.binarySearch(sorted, est)
          val rank = if (i >= 0) i else -i - 1
          val err = math.abs(rank - p * (data.size - 1)) / data.size
          assert(err <= 0.03, s"$key p$p rank error $err")
        }
      }
    } finally q.stop()
  }

  test("event-time heavy hitters: late data folds into its window, " +
    "watermark finalizes exactly once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingSketch.{WordAt, WindowShardSummary}
    def at(w: String, sec: Long) =
      WordAt(w, new java.sql.Timestamp(sec * 1000))
    val input = MemoryStream[WordAt](spark)
    val words = input.toDS().withWatermark("ts", "30 seconds")
      .as[WordAt]
    val q = StreamingSketch
      .windowedHeavyHitters(words, windowMs = 60000L, shards = 2, k = 8)
      .writeStream.format("memory").queryName("ewhh")
      .outputMode("append").start()
    try {
      // window [0, 60s): hot items + light noise; plus one row in the
      // next window to move event time forward a little
      input.addData((0 until 30).map(_ => at("alpha", 10)) ++
        (0 until 20).map(_ => at("beta", 20)) ++
        (0 until 6).map(i => at(s"noise$i", 25)) :+ at("tail", 70))
      q.processAllAvailable()
      // watermark is now 70s-30s = 40s < 60s: window 0 still open —
      // these arrive LATE (event time 50s < max seen 70s) but within
      // the watermark, so they must fold into window 0, not be dropped
      input.addData((0 until 10).map(_ => at("alpha", 50)))
      q.processAllAvailable()
      assert(spark.table("ewhh").count() === 0) // nothing finalized yet
      // push the watermark past 60s (event 200s ⇒ wm 170s) ...
      input.addData(Seq(at("tail", 200)))
      q.processAllAvailable()
      // ... and one more trigger for the timeout to fire on
      input.addData(Seq(at("tail", 210)))
      q.processAllAvailable()

      val fin = spark.table("ewhh").as[WindowShardSummary].collect()
        .filter(_.windowStartMs === 0L)
      assert(fin.map(_.shard).toSet.size === fin.length, "dup finalize")
      assert(fin.map(_.n).sum === 66L, "window-0 total must count late rows")
      val got = fin.flatMap(_.items).toMap
      assert(got.contains("alpha") && got("alpha") >= 40L - 66L / 9,
        s"late alphas lost: ${got.get("alpha")}")
      assert(got.contains("beta"))
      // beyond-watermark straggler for the closed window: silently dropped,
      // no state resurrection, no second emission
      input.addData(Seq(at("alpha", 30)))
      q.processAllAvailable()
      assert(spark.table("ewhh").as[WindowShardSummary].collect()
        .count(_.windowStartMs === 0L) === fin.length)
    } finally q.stop()
  }

  test("streaming as-of join honors the tolerance bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingAsOf.{In, Out}
    def in(k: Long, t: Long, left: Boolean, v: Double) =
      In(k, t, left, v, new java.sql.Timestamp(t))
    val input = MemoryStream[In](spark)
    val ds = input.toDS().withWatermark("ts", "10 seconds").as[In]
    // 4-second bound: right@50s matches left@53s but NOT left@60s
    val q = StreamingAsOf.backward(ds, toleranceMs = Some(4000L))
      .writeStream.format("memory").queryName("sasoftol")
      .outputMode("append").start()
    try {
      input.addData(in(1, 50000, left = false, 5.0),
        in(1, 53000, left = true, 1.0), in(1, 60000, left = true, 2.0))
      q.processAllAvailable()
      input.addData(in(1, 100000, left = true, 0.0))
      q.processAllAvailable()
      input.addData(in(1, 120000, left = true, 0.0))
      q.processAllAvailable()
      val got = spark.table("sasoftol").as[Out].collect()
        .filter(o => o.ts_ms == 53000L || o.ts_ms == 60000L)
      assert(got.length === 2, got.mkString(","))
      assert(got.find(_.ts_ms == 53000L).get.right_ms.contains(50000L))
      assert(got.find(_.ts_ms == 60000L).get.right_ms.isEmpty)
    } finally q.stop()
  }

  test("streaming as-of join: watermark finalizes lefts exactly once, " +
    "late rights within the watermark still match") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingAsOf.{In, Out}
    def in(k: Long, t: Long, left: Boolean, v: Double) =
      In(k, t, left, v, new java.sql.Timestamp(t))
    val input = MemoryStream[In](spark)
    val ds = input.toDS().withWatermark("ts", "30 seconds").as[In]
    val q = StreamingAsOf.backward(ds)
      .writeStream.format("memory").queryName("sasof")
      .outputMode("append").start()
    try {
      // left@60s with right@50s; stream max event time 70s ⇒ wm 40s:
      // nothing may finalize yet
      input.addData(in(1, 60000, left = true, 1.0),
        in(1, 50000, left = false, 5.0), in(9, 70000, left = true, 0.0))
      q.processAllAvailable()
      assert(spark.table("sasof").count() === 0)
      // LATE right@55s (event time below the already-seen 70s but above
      // the 40s watermark): must still beat the 50s right for the 60s
      // left. The 200s row pushes the watermark to 170s...
      input.addData(in(1, 55000, left = false, 7.0),
        in(9, 200000, left = true, 0.0))
      q.processAllAvailable()
      // ...and the next trigger fires the event-time timeouts
      input.addData(in(9, 210000, left = true, 0.0))
      q.processAllAvailable()
      val got = spark.table("sasof").as[Out].collect()
      val k1 = got.filter(_.key == 1L)
      assert(k1.length === 1)
      assert(k1.head.ts_ms === 60000L &&
        k1.head.right_ms.contains(55000L) &&
        k1.head.right_value.contains(7.0), k1.head.toString)
      // the key-9 left@70s closed too (wm 170s), with no right to match
      assert(got.exists(o => o.key == 9L && o.ts_ms == 70000L &&
        o.right_ms.isEmpty))
      // no duplicate emission on further triggers
      input.addData(in(9, 220000, left = true, 0.0))
      q.processAllAvailable()
      assert(spark.table("sasof").as[Out].collect()
        .count(_.key == 1L) === 1)
    } finally q.stop()
  }

  test("streaming as-of join agrees with the batch native operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingAsOf.{In, Out}
    // deterministic interleaved fixture: 5 keys, lefts and rights with
    // colliding and missing times
    // chronological feeding (within-batch disorder only): replaying old
    // timestamps across batches would be LATE data under the watermark
    // and correctly dropped — which is the other tests' business. Times
    // sit an hour past epoch 0: the operator treats ts ≤ watermark as
    // late, and the initial watermark is 0, so epoch-0 events would be
    // dropped on arrival (verified empirically).
    val rows = (for (i <- 0 until 240) yield {
      val k = i % 5
      val t = 3600000L + ((i * 37) % 120) * 1000L
      StreamingAsOf.In(k, t, i % 3 == 0, i.toDouble,
        new java.sql.Timestamp(t))
    }).toVector.sortBy(r => (r.tsMs, r.key, r.value))
    val input = MemoryStream[In](spark)
    val ds = input.toDS().withWatermark("ts", "10 seconds").as[In]
    val q = StreamingAsOf.backward(ds)
      .writeStream.format("memory").queryName("sasof2")
      .outputMode("append").start()
    try {
      rows.grouped(80).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // sentinel right on an unused key closes every real left
      input.addData(In(999L, 10000000L, left = false, 0.0,
        new java.sql.Timestamp(10000000L)))
      q.processAllAvailable()
      input.addData(In(999L, 10010000L, left = false, 0.0,
        new java.sql.Timestamp(10010000L)))
      q.processAllAvailable()

      val streamed = spark.table("sasof2").as[Out].collect()
        .map(o => (o.key, o.ts_ms, o.left_value,
          o.right_ms.getOrElse(-1L), o.right_value.getOrElse(-1.0)))
        .sorted.toVector
      val l = rows.filter(_.left)
        .map(r => (r.key, r.tsMs, r.value)).distinct
        .toDF("key", "ts_ms", "left_value")
      val r = rows.filterNot(_.left)
        .map(r => (r.key, r.tsMs, r.value)).toDF("key", "ts_ms", "value")
        // mirror the stream state's (time, value) max tie-break: for equal
        // right times the sort keeps the greatest value last
        .groupBy($"key", $"ts_ms").agg(max($"value").as("right_value"))
      val expected = graft.plans.AsOf.join(l, r, Seq("key"), "ts_ms",
          "ts_ms", "_r")
        .select($"key", $"ts_ms", $"left_value",
          coalesce($"ts_ms_r", lit(-1L)).as("rm"),
          coalesce($"right_value_r", lit(-1.0)).as("rv"))
        .as[(Long, Long, Double, Long, Double)].collect().sorted.toVector
      // the streamed lefts must be exactly the distinct batch lefts
      assert(streamed.map(t => (t._1, t._2, t._3)) ===
        expected.map(t => (t._1, t._2, t._3)))
      assert(streamed === expected)
    } finally q.stop()
  }

  test("streaming chunker: stateless transform, stream equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDS().toDF("doc_id", "text")
    // 23 tokens at size 10 / stride 6 → chunks at 0/6/12/18, the usual
    // ragged tail; a short doc (3 tokens) → one chunk
    val batch = Seq(
      (1L, (1 to 23).map(i => s"w$i").mkString(" ")),
      (2L, "a b c"))
    val chunked = graft.operators.TextQueries
      .chunkOverlapDf(docs, size = 10, stride = 6)
    val q = chunked.writeStream.format("memory")
      .queryName("chunk_stream").outputMode("append").start()
    try {
      input.addData(batch)
      q.processAllAvailable()
      val streamed = spark.table("chunk_stream")
        .as[(Long, Long, Int, String)].collect().sorted.toVector
      val expected = graft.operators.TextQueries
        .chunkOverlapDf(batch.toDF("doc_id", "text"), 10, 6)
        .as[(Long, Long, Int, String)].collect().sorted.toVector
      assert(streamed.nonEmpty && streamed === expected)
      assert(streamed.count(_._1 == 1L) === 4)
      assert(streamed.count(_._1 == 2L) === 1)
    } finally q.stop()
  }
}
