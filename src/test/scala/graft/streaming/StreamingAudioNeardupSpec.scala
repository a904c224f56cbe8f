package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.multimodal.{AudioNeardup, WavCodec}

/** The streaming audio near-dup probe mirrors the image arm's contract:
  * stream equals batch on the distinct matched set, stateless plan, and
  * exact dups score hamming 0. */
class StreamingAudioNeardupSpec extends SparkTestBase {
  import spark.implicits._

  private val nCompact =
    AudioNeardup.Frames * AudioNeardup.Bands * AudioNeardup.BlockLen
  private def wav(seed: Long, pb: Int = -1): Array[Byte] =
    WavCodec.encode(WavCodec.Wav(AudioNeardup.SampleRate, 1,
      AudioNeardup.pcm(seed, pb, nCompact)))
  // a last-band perturbed variant of seed 0 (block (0 % 17)·5 + 4);
  // seed choice is load-bearing: sign-bit fingerprints give no ≥1-flip
  // guarantee (seed 7's perturbation flips 0 bits — still a valid
  // near-dup, just not the distinct-hamming geometry this test pins),
  // and seed 0's flips exactly 1
  private val nearPb = AudioNeardup.Bands - 1

  test("streaming audio near-dup probe: arriving clips flag against the " +
      "frozen registry, stream equals batch on the distinct match set") {
    val ha = AudioNeardup.fingerprintOf(wav(0L)).get
    val hn = AudioNeardup.fingerprintOf(wav(0L, nearPb)).get
    val hc = AudioNeardup.fingerprintOf(wav(12345L)).get
    assert(java.lang.Long.bitCount(ha ^ hn) <= 3 &&
      java.lang.Long.bitCount(ha ^ hn) >= 1, "planted near-dup geometry")
    assert(java.lang.Long.bitCount(ha ^ hc) > 3, "unrelated stays unrelated")

    val registry = AudioNeardup.fingerprints(Seq(
      (1L, wav(0L)), (2L, wav(31337L))
    ).toDF("asset_id", "media"), spark).localCheckpoint()
    val arriving = Seq(
      (100L, wav(0L, nearPb)), // near-dup of 1
      (101L, wav(12345L)),     // unrelated
      (102L, wav(0L))          // exact dup of 1
    )
    val batchPairs = StreamingAudioNeardup.matches(
        arriving.toDF("asset_id", "media"), registry, spark)
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((100L, 1L), (102L, 1L)), s"got $batchPairs")
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamingAudioNeardup.matches(
        input.toDS().toDF("asset_id", "media"), registry, spark)
      .writeStream.format("memory").queryName("saudnear")
      .outputMode("append").start()
    input.addData(arriving.take(1))
    q.processAllAvailable()
    input.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("saudnear")
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(streamed === batchPairs,
      "stream must equal batch on the distinct matched set")
    val hams = spark.table("saudnear")
      .select($"asset_id", $"hamming")
      .as[(Long, Int)].collect().toMap
    assert(hams(102L) === 0, "the exact dup scores hamming 0")
    assert(hams(100L) >= 1 && hams(100L) <= 3)
  }

  test("checkpointed restart is exactly-once: each arriving clip's " +
      "matches land once, an idle restart adds nothing, and the final " +
      "output equals the batch probe row-for-row") {
    def tmpDir(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val src = tmpDir("audnear-src"); val out = tmpDir("audnear-out")
    val ckpt = tmpDir("audnear-ckpt")
    val registry = AudioNeardup.fingerprints(Seq(
      (1L, wav(0L)), (2L, wav(31337L))
    ).toDF("asset_id", "media"), spark).localCheckpoint()
    val arriving = Seq(
      (100L, wav(0L, nearPb)),
      (101L, wav(12345L)),
      (102L, wav(0L)))
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = StreamingAudioNeardup.matches(stream, registry, spark)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    // the parquet file source wants FLAT data files: stage each batch,
    // then drop its part file into the watched dir
    def addFile(rows: Seq[(Long, Array[Byte])], name: String): Unit = {
      val stage = tmpDir("audnear-stage")
      rows.toDF("asset_id", "media")
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(src, name))
    }
    addFile(arriving.take(2), "f1.parquet")
    run() // processes file 1
    addFile(arriving.drop(2), "f2.parquet")
    run() // restart from the checkpoint: only file 2 is new
    val afterTwo = spark.read.parquet(out)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    run() // restart with nothing new: must be a no-op
    val afterThree = spark.read.parquet(out)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(afterThree === afterTwo, "an idle restart must add no rows")
    val batch = StreamingAudioNeardup.matches(
        arriving.toDF("asset_id", "media"), registry, spark)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(afterTwo === batch,
      "restarted stream equals batch row-for-row (per-band multiset)")
  }

  test("the streaming probe plan is stateless (no state store nodes)") {
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val registry = AudioNeardup.fingerprints(Seq(
      (1L, wav(0L))).toDF("asset_id", "media"), spark)
      .localCheckpoint()
    val out = StreamingAudioNeardup.matches(
      input.toDS().toDF("asset_id", "media"), registry, spark)
    assert(out.isStreaming)
    val plan = out.queryExecution.analyzed.toString
    assert(!plan.toLowerCase.contains("aggregate"),
      "probe must not introduce a streaming aggregation")
  }
}
