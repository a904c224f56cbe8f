package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Advanced, Tables}

/** Streaming curation funnel: gate parity with the batch funnel,
  * cross-trigger dedup convergence, replay idempotence, and the frozen-
  * rate kept() view equaling the batch pipeline on the union. */
class CurationStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): Path = Files.createTempDirectory(prefix)

  test("quality gate (pure projection) passes exactly the batch " +
      "funnel's quality survivors on testdata") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val gate = CurationStream.qualityGate(docs)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val funnel = Advanced.curationPipelineDf(docs)
      .select(col("lang"), col("n_quality"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gate === funnel, "per-lang quality survivor counts must match")
  }

  test("streaming funnel: crafted docs drop at their stages, dedup " +
      "converges across triggers, replay is idempotent, kept() equals " +
      "the batch pipeline under the same frozen rates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reg = tmp("cur-reg").toString + "/r"
    val ckpt = tmp("cur-ckpt").toString
    val clean = (1 to 12).map(i => s"tok$i").mkString(" ")
    val stuffed = Seq.fill(12)("spam").mkString(" ")  // quality drop
    val t1 = Seq(
      (1L, "en", clean),
      (2L, "en", stuffed),
      (3L, "fr", clean + " extra"))
    // trigger 2: doc 4 is a reordered-token dup of doc 1 (same canon,
    // higher id -> must LOSE); doc 0 is the same canon with a LOWER id
    // -> must take over the keeper slot
    val t2 = Seq(
      (4L, "en", (2 to 12).map(i => s"tok$i").mkString(" ") + " tok1"),
      (0L, "en", clean.split(" ").reverse.mkString(" ")),
      (5L, "de", clean + " andere"))
    val rates = Map("en" -> 1.0, "fr" -> 1.0, "de" -> 1.0)

    val input = MemoryStream[(Long, String, String)](spark)
    val docs = input.toDS().toDF("doc_id", "lang", "text")
    input.addData(t1)
    CurationStream.start(docs, reg, ckpt).awaitTermination(120000)
    input.addData(t2)
    CurationStream.start(docs, reg, ckpt).awaitTermination(120000)

    def keptIds = CurationStream.kept(spark, reg, rates)
      .collect().map(_.getLong(0)).toSet
    // quality dropped 2; canon of `clean` converged to the LOWEST id
    // seen (0), so 1 and 4 are gone; 3 and 5 unique
    assert(keptIds === Set(0L, 3L, 5L))

    // replayed micro-batch (sink ran, commit lost) converges
    graft.pipeline.Sink.upsertByKey(spark,
      CurationStream.qualityGate(t2.toDF("doc_id", "lang", "text"))
        .withColumn("neg_id", -col("doc_id")), reg, "canon", "neg_id")
    assert(keptIds === Set(0L, 3L, 5L))

    // and the whole streaming funnel equals the batch form on the union
    val union = (t1 ++ t2).toDF("doc_id", "lang", "text")
    val batchKept = Advanced.rebalanceApplyDf(
      CurationStream.qualityGate(union)
        .groupBy(col("canon"))
        .agg(min(col("doc_id")).as("doc_id"))
        .join(CurationStream.qualityGate(union), Seq("doc_id", "canon"))
        .select(col("doc_id"), col("lang")),
      rates).collect().map(_.getLong(0)).toSet
    assert(keptIds === batchKept)
  }

  test("streaming funnel on testdata: registry equals the batch " +
      "quality+dedup stages; a selective frozen rate thins kept()") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reg = tmp("cur-reg2").toString + "/r"
    val ckpt = tmp("cur-ckpt2").toString
    val all = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    val (h1, h2) = all.splitAt(all.size / 2)
    val input = MemoryStream[(Long, String, String)](spark)
    val docs = input.toDS().toDF("doc_id", "lang", "text")
    input.addData(h1)
    CurationStream.start(docs, reg, ckpt).awaitTermination(180000)
    input.addData(h2)
    CurationStream.start(docs, reg, ckpt).awaitTermination(180000)

    val union = all.toDF("doc_id", "lang", "text")
    val expected = CurationStream.qualityGate(union)
      .groupBy(col("canon")).agg(min(col("doc_id")).as("doc_id"))
      .collect().map(_.getLong(1)).toSet
    val registry = spark.read.parquet(reg)
      .collect().map(r => r.getAs[Long]("doc_id")).toSet
    assert(registry === expected && registry.nonEmpty)

    // frozen rates from the registry itself: smallest-language parity
    val rates = Advanced.mixtureRates(
      spark.read.parquet(reg).select(col("doc_id"), col("lang")))
    val kept = CurationStream.kept(spark, reg, rates)
    assert(kept.count() > 0 && kept.count() < registry.size)
  }
}
