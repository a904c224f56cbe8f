package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.multimodal.{BmpCodec, GifCodec, ImageNeardup, PngCodec}

/** The streaming image near-dup probe mirrors the text arm's contract:
  * stream equals batch on the distinct matched set, stateless plan, and
  * exact dups score hamming 0. */
class StreamingImageNeardupSpec extends SparkTestBase {
  import spark.implicits._

  private def gray(lumas: Array[Int]): BmpCodec.Decoded = {
    val bgr = new Array[Byte](lumas.length * 3)
    lumas.indices.foreach { i =>
      val v = lumas(i).toByte
      bgr(i * 3) = v; bgr(i * 3 + 1) = v; bgr(i * 3 + 2) = v
    }
    BmpCodec.Decoded(ImageNeardup.GridW, ImageNeardup.GridH, bgr)
  }
  private val aPix = Array.tabulate(72)(i => (i * 37) % 256)
  private val aNear = { val p = aPix.clone(); p(10) = (p(10) + 128) % 256; p }
  private val bPix = Array.tabulate(72)(i => (i * 91 + 17) % 256)
  private val cPix = Array.tabulate(72)(i => (i * 53 + 101) % 256)

  test("streaming image near-dup probe: arriving assets flag against the " +
      "frozen registry, stream equals batch on the distinct match set") {
    // sanity: the constructed geometry is what the test assumes
    val ha = ImageNeardup.dhashOf(BmpCodec.encode(gray(aPix))).get
    val hn = ImageNeardup.dhashOf(PngCodec.encode(gray(aNear))).get
    val hc = ImageNeardup.dhashOf(GifCodec.encode(gray(cPix))).get
    assert(java.lang.Long.bitCount(ha ^ hn) <= 3 &&
      java.lang.Long.bitCount(ha ^ hn) >= 1, "planted near-dup geometry")
    assert(java.lang.Long.bitCount(ha ^ hc) > 3, "unrelated stays unrelated")

    val registry = ImageNeardup.dHashes(Seq(
      (1L, BmpCodec.encode(gray(aPix))),
      (2L, PngCodec.encode(gray(bPix)))
    ).toDF("asset_id", "media"), spark).localCheckpoint()
    val arriving = Seq(
      (100L, PngCodec.encode(gray(aNear))), // near-dup of 1, other codec arm
      (101L, GifCodec.encode(gray(cPix))),  // unrelated
      (102L, BmpCodec.encode(gray(aPix)))   // exact dup of 1
    )
    // batch parity arm
    val batchPairs = StreamingImageNeardup.matches(
        arriving.toDF("asset_id", "media"), registry, spark)
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((100L, 1L), (102L, 1L)), s"got $batchPairs")
    // streaming arm: two triggers, same distinct match set
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val q = StreamingImageNeardup.matches(
        input.toDS().toDF("asset_id", "media"), registry, spark)
      .writeStream.format("memory").queryName("simgnear")
      .outputMode("append").start()
    input.addData(arriving.take(1))
    q.processAllAvailable()
    input.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("simgnear")
      .select($"asset_id", $"match_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(streamed === batchPairs,
      "stream must equal batch on the distinct matched set")
    val hams = spark.table("simgnear")
      .select($"asset_id", $"hamming")
      .as[(Long, Int)].collect().toMap
    assert(hams(102L) === 0, "the exact dup scores hamming 0")
    assert(hams(100L) >= 1 && hams(100L) <= 3)
  }

  test("checkpointed restart is exactly-once: each arriving asset's " +
      "matches land once, a re-run with no new data adds nothing, and " +
      "the final output equals the batch probe row-for-row") {
    def tmpDir(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val src = tmpDir("imgnear-src"); val out = tmpDir("imgnear-out")
    val ckpt = tmpDir("imgnear-ckpt")
    val registry = ImageNeardup.dHashes(Seq(
      (1L, BmpCodec.encode(gray(aPix))),
      (2L, PngCodec.encode(gray(bPix)))
    ).toDF("asset_id", "media"), spark).localCheckpoint()
    val arriving = Seq(
      (100L, PngCodec.encode(gray(aNear))),
      (101L, GifCodec.encode(gray(cPix))),
      (102L, BmpCodec.encode(gray(aPix))))
    def run(): Unit = {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = StreamingImageNeardup.matches(stream, registry, spark)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); q.stop()
    }
    // the parquet file source wants FLAT data files: stage each batch,
    // then drop its part file into the watched dir
    def addFile(rows: Seq[(Long, Array[Byte])], name: String): Unit = {
      val stage = tmpDir("imgnear-stage")
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
    val batch = StreamingImageNeardup.matches(
        arriving.toDF("asset_id", "media"), registry, spark)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(afterTwo === batch,
      "restarted stream equals batch row-for-row (per-band multiset)")
  }

  test("the streaming probe plan is stateless (no state store nodes)") {
    val input = MemoryStream[(Long, Array[Byte])](spark)
    val registry = ImageNeardup.dHashes(Seq(
      (1L, BmpCodec.encode(gray(aPix)))).toDF("asset_id", "media"), spark)
      .localCheckpoint()
    val out = StreamingImageNeardup.matches(
      input.toDS().toDF("asset_id", "media"), registry, spark)
    assert(out.isStreaming)
    val plan = out.queryExecution.analyzed.toString
    assert(!plan.toLowerCase.contains("aggregate"),
      "probe must not introduce a streaming aggregation")
  }
}
