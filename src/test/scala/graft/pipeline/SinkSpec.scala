package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Sink hardening specs: idempotent partition-overwrite re-runs and
  * small-file compaction. */
class SinkSpec extends SparkTestBase {
  import spark.implicits._

  test("idempotent write: re-running a day converges, history intact") {
    val out = Files.createTempDirectory("idem").toString + "/t"

    // a historical partition this job must not touch
    Seq((1L, "old")).toDF("id", "v")
      .withColumn(Sink.IngestDateCol, lit("2000-01-01").cast("date"))
      .write.partitionBy(Sink.IngestDateCol).mode("append").parquet(out)

    val todays = Seq((10L, "a"), (11L, "b")).toDF("id", "v")
    Sink.writePartitionedIdempotent(todays, out)
    Sink.writePartitionedIdempotent(todays, out) // the re-run

    val all = spark.read.parquet(out)
    // re-run replaced, not appended: today's rows appear exactly once
    assert(all.filter(col(Sink.IngestDateCol) =!= "2000-01-01").count() === 2)
    // the historical partition survived the overwrite-mode write
    assert(all.filter(col(Sink.IngestDateCol) === "2000-01-01").count() === 1)

    // contrast: plain append duplicates on re-run (why idempotent exists)
    Sink.writePartitioned(todays, out)
    assert(spark.read.parquet(out)
      .filter(col(Sink.IngestDateCol) =!= "2000-01-01").count() === 4)
  }

  test("compaction merges micro-batch debris, preserves rows and layout") {
    val out = Files.createTempDirectory("compact").toString + "/t"
    // simulate 20 tiny appends (streaming debris): 20+ files in one partition
    (0 until 20).foreach { i =>
      Sink.writePartitioned(Seq((i.toLong, s"v$i")).toDF("id", "v"), out)
    }
    val beforeRows = spark.read.parquet(out).as[(Long, String, java.sql.Date)]
      .collect().map(r => (r._1, r._2)).toSet

    val (nBefore, nAfter) = Sink.compactPartitioned(spark, out)
    assert(nBefore >= 20)
    assert(nAfter < nBefore)

    val afterDf = spark.read.parquet(out)
    val afterRows = afterDf.as[(Long, String, java.sql.Date)]
      .collect().map(r => (r._1, r._2)).toSet
    assert(afterRows === beforeRows)
    // partition layout preserved (ingest_date still a partition column dir)
    assert(afterDf.columns.contains(Sink.IngestDateCol))
  }

  test("upsert by key: latest version wins, re-runs converge, inserts append") {
    val out = Files.createTempDirectory("upsert").toString + "/t"
    val v1 = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ver")
    Sink.upsertByKey(spark, v1, out, "id", "ver")
    // update key 1, insert key 3
    val v2 = Seq((1L, "a2", 2L), (3L, "c", 2L)).toDF("id", "v", "ver")
    Sink.upsertByKey(spark, v2, out, "id", "ver")
    Sink.upsertByKey(spark, v2, out, "id", "ver") // re-run converges

    val rows = spark.read.parquet(out)
      .select("id", "v", "ver").as[(Long, String, Long)]
      .collect().toSet
    assert(rows === Set((1L, "a2", 2L), (2L, "b", 1L), (3L, "c", 2L)))

    // key-bucketed layout: each key appears exactly once however many
    // batches touched it (the correctness a date-partitioned partial merge
    // cannot give)
    val dups = spark.read.parquet(out).groupBy(col("id")).count()
      .filter(col("count") > 1).count()
    assert(dups === 0)
  }

  test("upsert tie on (key, version) resolves deterministically") {
    val out = Files.createTempDirectory("upsert-tie").toString + "/t"
    val batch = Seq((1L, "x", 5L), (1L, "y", 5L)).toDF("id", "v", "ver")
    Sink.upsertByKey(spark, batch, out, "id", "ver")
    val first = spark.read.parquet(out).select("v").as[String].collect().toSeq
    // re-running the identical ambiguous batch yields the identical choice
    Sink.upsertByKey(spark, batch, out, "id", "ver")
    val second = spark.read.parquet(out).select("v").as[String].collect().toSeq
    assert(first.length === 1 && first === second)
    assert(first.head === "y") // max over the full-row tie-break
  }

  test("schema evolution: mergeSchema reads old + new files as a superset") {
    val out = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v")
      .write.mode("append").parquet(out)
    Seq((2L, "b", 0.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(out)
    val df = spark.read.option("mergeSchema", "true").parquet(out)
    assert(df.columns.toSet === Set("id", "v", "score"))
    val byId = df.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(byId(1L).isEmpty && byId(2L).contains(0.5))
  }

  test("compaction splits one oversized partition into multiple files") {
    val out = Files.createTempDirectory("compact-split").toString + "/t"
    Sink.writePartitioned(
      (0 until 500).map(i => (i.toLong, s"value$i")).toDF("id", "v"), out)
    // size the target to a third of the partition: the spread key must
    // fan one ingest_date's rows across several files
    val total = spark.read.parquet(out).inputFiles.map(f =>
      new java.io.File(new java.net.URI(f)).length()).sum
    val (_, nAfter) = Sink.compactPartitioned(spark, out,
      targetFileBytes = math.max(1L, total / 3))
    assert(nAfter >= 2 && nAfter <= 6, s"nAfter=$nAfter")
    assert(spark.read.parquet(out).count() === 500)
  }

  test("BigQuery sink arm mirrors the reference WriteToBigQuery options") {
    // reference code/beam.py:170-193 — WRITE_APPEND + CREATE_IF_NEEDED +
    // DAY time partitioning; CREATE_IF_NEEDED is the connector default,
    // so it must NOT appear as an option
    val (fmt, mode, opts) = Sink.bigQueryWriteConfig(
      "proj.dataset.delivered_orders", "staging-bucket")
    assert(fmt === "bigquery" && mode === "append")
    assert(opts("table") === "proj.dataset.delivered_orders")
    assert(opts("partitionType") === "DAY")
    assert(opts("temporaryGcsBucket") === "staging-bucket")
    assert(!opts.contains("createDisposition"))
    // column-partitioned variant adds partitionField, changes nothing else
    val (_, _, withField) = Sink.bigQueryWriteConfig(
      "t", "b", partitionField = Some("order_date"))
    assert(withField("partitionField") === "order_date")
    // the writer is configurable without the connector jar: building it
    // must not throw (only .save() needs the classpath)
    Sink.bigQueryWriter(Seq((1L, "x")).toDF("id", "v"),
      "proj.dataset.t", "staging-bucket")
  }

  test("BigQuery writer EXECUTES end-to-end against the test-classpath " +
      "DSv2 stub: exact option map, append-only builder, real 2-phase " +
      "commit, no pre-existing table (CREATE_IF_NEEDED parity)") {
    BigQueryTestSource.reset()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    // the EXACT production call — format "bigquery" resolves to the
    // test-only stub because the stub's service registration lives on
    // the TEST classpath (a deployment resolves the public connector)
    Sink.bigQueryWriter(df, "proj.dataset.delivered_orders",
      "staging-bucket", partitionField = Some("order_date")).save()
    val cap = BigQueryTestSource.lastCommitted
      .getOrElse(fail("write never committed"))
    assert(cap.rows === 3L)
    assert(cap.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(cap.options.get("table")
      === Some("proj.dataset.delivered_orders"))
    assert(cap.options.get("temporarygcsbucket") === Some("staging-bucket"))
    assert(cap.options.get("partitiontype") === Some("DAY"))
    assert(cap.options.get("partitionfield") === Some("order_date"))
    // WRITE_APPEND is structural, not asserted-by-string: the stub's
    // WriteBuilder supports ONLY append, so an overwrite-mode save must
    // fail before reaching BatchWrite while the append above succeeded
    BigQueryTestSource.reset()
    val ex = intercept[Exception] {
      df.write.format("bigquery").mode("overwrite")
        .option("table", "t").save()
    }
    assert(BigQueryTestSource.lastCommitted.isEmpty, s"overwrite committed: $ex")
  }
}
